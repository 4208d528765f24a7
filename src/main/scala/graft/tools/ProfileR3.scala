package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the round-3 bench hot spots (dev only). */
object ProfileR3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("d20_simhash_dup", "q08_window_topk", "q31_snapshot_diff",
        "d12_dedup_clusters", "q15_json_flatten", "d05_minhash_pairs",
        "q04_semi_join", "d21_simhash64_dup", "d14_clean_corpus")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$c")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
