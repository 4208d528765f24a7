package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE per-domain quantile summary — the streaming twin of
  * [[graft.functions.Sampling.quantilesByDomain]]: as documents arrive,
  * each domain's state holds its (value → count) census, and every
  * micro-batch that touches a domain re-emits that domain's current
  * quantile row (update-mode semantics, the d92/d99 convention — with a
  * finite source arriving as one batch, each domain's final row is
  * emitted exactly once, which is what the d115 oracle gates against the
  * batch operator).
  *
  * State per domain = the census map, bounded by the VALUE GRID, not the
  * stream: producer scores are grid-rounded (1e-4/1e-6), so a domain's
  * state is |grid| entries forever — the same bounded-by-construction
  * argument as the sketch streams (d88/d99/d112), no watermark needed.
  * Feeding an ungridded continuous value would grow state with distinct
  * values — round first, exactly as the batch census would want.
  *
  * Quantile rule: identical to batch — smallest value v (Spark total
  * order: NaN greatest, −0.0 = 0.0) with `100·cum(v) >= p·N`, integer
  * arithmetic only.
  */
object QuantileStream {

  /** Internal comparisons run on doubles (exact for the long/score types
    * the census carries, |v| < 2^53); output value columns are cast back
    * to the INPUT's own type. Census keys canonicalize −0.0 to 0.0 and
    * order NaN greatest, mirroring Spark SQL's grouping and sort.
    */
  def quantilesByDomain(stream: DataFrame, domCol: String, valueCol: String,
                        pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in [1,100], got $pcts")
    val spark = stream.sparkSession
    import spark.implicits._
    val domType = stream.schema(domCol).dataType
    val vType = stream.schema(valueCol).dataType
    val typed: Dataset[(String, Double)] = stream
      .where(col(domCol).isNotNull && col(valueCol).isNotNull)
      .select(col(domCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
    val to = Ordering.Double.TotalOrdering
    val emitted = typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (dom: String, rows: Iterator[(String, Double)],
         state: GroupState[Map[Double, Long]]) =>
          val census = rows.foldLeft(state.getOption.getOrElse(Map.empty[Double, Long])) {
            (acc, r) =>
              val v = if (r._2 == 0.0) 0.0 else r._2 // one −0.0/0.0 class
              acc + (v -> (acc.getOrElse(v, 0L) + 1L))
          }
          state.update(census)
          val sorted = census.toSeq.sortBy(_._1)(to) // ascending, NaN last
          val n = sorted.iterator.map(_._2).sum
          val cums = sorted.scanLeft(0L)(_ + _._2).tail
          val picks = pcts.map { p =>
            val i = cums.indexWhere(c => c * 100 >= n * p)
            sorted(i)._1 // i >= 0: the last cum is n and 100n >= pn
          }
          Iterator.single((dom, n, picks))
      }
    val out = emitted.select(
      (col("_1").as(domCol) +: col("_2").as("n_rows") +:
        pcts.zipWithIndex.map { case (p, i) =>
          col("_3").getItem(i).as(s"p$p")
        }): _*)
    pcts.foldLeft(out.withColumn(domCol, col(domCol).cast(domType))) {
      (df, p) => df.withColumn(s"p$p", col(s"p$p").cast(vType))
    }
  }
}
