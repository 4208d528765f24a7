package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 forensic: where do d146's seconds go? Times the containment
  * edge build, plain pageRank over it, and dangling pageRank, separately.
  */
object ProfileD146 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit = {
      graft.CacheRegistry.releaseAll()
      spark.sharedState.cacheManager.clearCache()
    }
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$r")
    }
    val docs = graft.io.Tables.load(spark, sfDir, "documents")
    for (i <- 1 to 2) {
      t(s"containment edges #$i") {
        val n = graft.functions.JaccardJoin.containmentPairs(docs, "doc_id",
          "text", threshold = 0.6, n = 3)
          .where(col("doc_a") < col("doc_b")).count()
        drop(); n
      }
      t(s"edges->parquet + plain pr #$i") {
        val e = graft.functions.JaccardJoin.containmentPairs(docs, "doc_id",
          "text", threshold = 0.6, n = 3)
          .where(col("doc_a") < col("doc_b")).select("doc_a", "doc_b")
        e.write.mode("overwrite").parquet("/tmp/d146_edges")
        drop()
        val ep = spark.read.parquet("/tmp/d146_edges")
        val n = graft.functions.GraphOps.pageRank(ep, "doc_a", "doc_b", 3).count()
        drop(); n
      }
      t(s"parquet dangling pr #$i") {
        val ep = spark.read.parquet("/tmp/d146_edges")
        val n = graft.functions.GraphOps.pageRank(ep, "doc_a", "doc_b", 3,
          danglingMass = true).count()
        drop(); n
      }
      t(s"full d146 #$i") {
        val n = graft.testqueries.PipelineQueries
          .queries("d146_pagerank_dangling")(spark, sfDir).count()
        drop(); n
      }
    }
    spark.stop()
  }
}
