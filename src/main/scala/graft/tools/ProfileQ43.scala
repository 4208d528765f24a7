package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 adjudication of the q43_locf_grid persist trade
  * (`ops/Resample.scala`): the same-instant dedup frame feeds BOTH the
  * per-key bounds branch (grid generation) and the union branch, so it is
  * persisted under the S4 rule. The q29 experience says a persist that
  * wins at scale can LOSE at sf0.1 (cache-fill barrier > recompute).
  * Measures persisted vs recomputed, six back-to-back runs each, at
  * driver-bench conditions (local[4], AQE) on sf0.1 AND on a 10x
  * replication, mirroring the q29 methodology.
  */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = graft.io.Tables.loadEventsRaw(spark, "/root/testdata/sf0.1")
    val ev1 = raw.select(col("user_id"),
      graft.io.Tables.epochNs(raw.schema("ts").dataType, col("ts")).as("tns"),
      col("value"), col("event_id"))
    val ev10 = (0 until 10).map { r =>
      ev1.select(col("user_id") + lit(r * 1000000), col("tns"),
        col("value"), col("event_id") + lit(r * 100000000L))
        .toDF("user_id", "tns", "value", "event_id")
    }.reduce(_ unionByName _)

    val stepNs = 24L * 3600 * 1000000000L // 24h grid, the q43 setting

    def currentPersisted(ev: DataFrame): Long = {
      val n = graft.ops.Resample.locfGrid(ev, Seq("user_id"), "tns",
        "value", "event_id", stepNs).count()
      graft.CacheRegistry.releaseAll()
      n
    }

    // identical plan minus the persist
    def recomputed(ev: DataFrame): Long = {
      val keys = Seq(col("user_id"))
      val dedup = ev.groupBy(col("user_id"), col("tns").as("t"))
        .agg(max_by(col("value"), struct(col("event_id"), col("value"))).as("__v"))
      val grid = dedup.groupBy(keys: _*)
        .agg(min("t").as("__lo"), max("t").as("__hi"))
        .select(keys :+ explode(sequence(col("__lo"), col("__hi"),
          lit(stepNs))).as("t"): _*)
        .withColumn("__v", lit(null).cast(dedup.schema("__v").dataType))
        .withColumn("__grid", lit(1))
      val w = Window.partitionBy(keys: _*)
        .orderBy(col("t"), col("__grid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dedup.withColumn("__grid", lit(0))
        .unionByName(grid)
        .withColumn("__locf", last("__v", ignoreNulls = true).over(w))
        .where(col("__grid") === 1)
        .select(keys :+ col("t") :+ col("__locf").as("value"): _*)
        .count()
    }

    def runs(name: String, n: Int = 6)(f: => Long): Double = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); val r = f
        val s = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        println(f"  $name%-24s ${s}%6.2f s rows=$r"); s
      }
      println(f"  $name%-24s min=${ts.min}%6.2f median=${ts.sorted.apply(n / 2)}%6.2f")
      ts.min
    }

    currentPersisted(ev1); recomputed(ev1) // warm JIT
    spark.sharedState.cacheManager.clearCache()
    val p1 = runs("persist x1")(currentPersisted(ev1))
    val r1 = runs("recompute x1")(recomputed(ev1))
    val p10 = runs("persist x10", 3)(currentPersisted(ev10))
    val r10 = runs("recompute x10", 3)(recomputed(ev10))
    println(f"x1: persist $p1%.2f vs recompute $r1%.2f; x10: persist $p10%.2f vs recompute $r10%.2f")
    spark.stop()
  }
}
