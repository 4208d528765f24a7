package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** LIVE per-domain quantile summary — the streaming twin of
  * [[graft.functions.Sampling.quantilesByDomain]]: as documents arrive,
  * each domain's state holds its (value → count) census, and every
  * micro-batch that touches a domain re-emits that domain's current
  * quantile row (update-mode semantics, the d92/d99 convention — with a
  * finite source arriving as one batch, each domain's final row is
  * emitted exactly once, which is what the d115 oracle gates against the
  * batch operator).
  *
  * State per domain = the census map, bounded STRUCTURALLY by the value
  * grid: every value is rounded to `gridDecimals` decimals before it
  * becomes a census key, so a domain's state is at most
  * `range · 10^gridDecimals` entries no matter how many distinct raw
  * doubles arrive — the same bounded-by-construction argument as the
  * sketch streams (d88/d99/d112), no watermark needed, and no longer a
  * caller promise: an ungridded continuous stream is bounded by the
  * rounding itself. The default grid (1e-6) is the finest grid the
  * repo's score producers emit on (quality 1e-4, calibration 1e-6), so
  * already-gridded input passes through bit-identically.
  *
  * Supported value types: byte/short/int/float/double — every value
  * exactly representable as the census's double key. Long and decimal
  * are REJECTED loudly: above 2^53 distinct longs collapse under the
  * double cast and the twin would silently diverge from the batch
  * operator (which keeps the input type end to end) — cast to double
  * explicitly if the approximation is acceptable, or use the batch
  * operator.
  *
  * Quantile rule: identical to batch — smallest value v (Spark total
  * order: NaN greatest, −0.0 = 0.0) with `100·cum(v) >= p·N`, integer
  * arithmetic only.
  */
object QuantileStream {

  /** Spark's `round(col, d)` on a double, replicated exactly
    * (`BigDecimal.valueOf` = shortest-decimal repr, HALF_UP): the
    * streaming JVM fold and a batch `round` column cannot diverge.
    * NaN/±Inf pass through (as Spark's Round does); −0.0 rounds to 0.0,
    * which the census canonicalizes anyway.
    */
  private[graft] def gridRound(v: Double, d: Int): Double =
    if (v.isNaN || v.isInfinite) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(d, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One micro-batch's census update for one domain — factored out so a
    * spec can prove the state bound structurally: after ANY number of
    * distinct raw values, `census.size <= range · 10^gridDecimals (+ NaN
    * and ±Inf classes)`.
    */
  private[graft] def updateCensus(census: Map[Double, Long],
                                  values: Iterator[Double],
                                  gridDecimals: Int): Map[Double, Long] =
    values.foldLeft(census) { (acc, raw) =>
      val g = gridRound(raw, gridDecimals)
      val v = if (g == 0.0) 0.0 else g // one −0.0/0.0 class
      acc + (v -> (acc.getOrElse(v, 0L) + 1L))
    }

  def quantilesByDomain(stream: DataFrame, domCol: String, valueCol: String,
                        pcts: Seq[Int] = Seq(50, 90, 99),
                        gridDecimals: Int = 6): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in [1,100], got $pcts")
    require(gridDecimals >= 0 && gridDecimals <= 9,
      s"gridDecimals must be in [0,9], got $gridDecimals")
    val spark = stream.sparkSession
    import spark.implicits._
    val domType = stream.schema(domCol).dataType
    val vType = stream.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, FloatType, DoubleType)
      .contains(vType),
      s"quantilesByDomain (streaming) supports byte/short/int/float/double " +
        s"value columns; got $vType for '$valueCol'. Long/decimal values " +
        "above 2^53 would collapse under the census's double key — cast " +
        "to double explicitly if that loss is acceptable, or use the " +
        "batch operator, which keeps the input type")
    val typed: Dataset[(String, Double)] = stream
      .where(col(domCol).isNotNull && col(valueCol).isNotNull)
      .select(col(domCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
    val to = Ordering.Double.TotalOrdering
    val emitted = typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (dom: String, rows: Iterator[(String, Double)],
         state: GroupState[Map[Double, Long]]) =>
          val census = updateCensus(
            state.getOption.getOrElse(Map.empty[Double, Long]),
            rows.map(_._2), gridDecimals)
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
