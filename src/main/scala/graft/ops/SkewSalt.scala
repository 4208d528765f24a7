package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skew-heavy keys.
  *
  * AQE's skew-join splitting handles skewed JOINS, but a groupBy whose
  * hottest key dwarfs the rest still lands that key on one reducer. Salting
  * spreads it: phase 1 aggregates on (key, salt) — the hot key's rows fan
  * out over `buckets` reducers — phase 2 merges the ≤`buckets` partial rows
  * per key. Works for any algebraic aggregate (sum/count/min/max) whose
  * partials merge with the same function; this helper ships the
  * count/sum/min/max core.
  *
  * At 100 TB: use when a key histogram shows top-key share ≳ 1/shuffle
  * partitions; the extra exchange of ≤ |keys|·buckets tiny partial rows is
  * noise next to a straggling reducer.
  */
object SkewSalt {

  /** Salted groupBy: count, sum, min, max of `valueCol` per `keys`.
    * Result equals the unsalted aggregation exactly for count/min/max; sum
    * may differ in float ulps (summation grouping changes, as with any
    * partition-count change).
    */
  def aggregate(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 16): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol)).as("__s"),
        min(col(valueCol)).as("__mn"),
        max(col(valueCol)).as("__mx"))
    partial
      .groupBy(keyCols: _*)
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).as("sum"),
        min(col("__mn")).as("min"),
        max(col("__mx")).as("max"))
  }

  /** Salt column for a salted broadcast-replicated join against a skewed
    * fact side: fact rows get a random salt in [0, buckets), the small side
    * is exploded once per salt value, and the join key becomes
    * (key, salt) — every reducer sees ≤ 1/buckets of the hot key.
    */
  def saltColumn(buckets: Int): Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets))

  /** Explode the SMALL side of a join across all salt values so it meets
    * every salted fact partition: one row per (original row, salt).
    */
  def replicateForSalt(small: DataFrame, buckets: Int): DataFrame =
    small.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
}
