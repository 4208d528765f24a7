package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changed/unchanged split between two bracketing snapshots
  * (SURVEY.md §2.4 A1/A2, §2.6 U1).
  *
  * The reference unions both snapshots and groups by the full row including
  * `json_value`: a key appearing twice has the same value in both snapshots
  * (unchanged between them); once means changed — or present in only one
  * (`SQL/GetMessage.sql:127-176`). One union + one partial-agg shuffle; the
  * big delta log is then scanned only for the changed keys. Production
  * consumer: [[graft.queries.MessageReconstruct.getMessageSnapshotDiff]].
  */
object ChangeSplit {

  private val Key = Seq("uevol_field_id", "src_id", "dst_id")

  /** (same, diffKeys): `same` keeps the snapshot row (key + json_value +
    * min snapshot's instance_message_id); `diffKeys` is just the changed key
    * set. Sides are counted DISTINCT, so duplicate rows within one snapshot
    * (a retried dump write, overlapping partitions) cannot fake a
    * both-sides match — "same" strictly means the (key, json) pair appears
    * in both snapshots.
    */
  def split(snapMin: DataFrame, snapMax: DataFrame): (DataFrame, DataFrame) = {
    val conc = snapMin.withColumn("__side", lit(0))
      .unionByName(snapMax.withColumn("__side", lit(1)))
    val counted = conc
      .groupBy((Key :+ "json_value").map(col): _*)
      .agg(countDistinct("__side").as("n"),
        min("instance_message_id").as("instance_message_id"))
    val same = counted.where(col("n") > 1)
      .select((Key :+ "json_value" :+ "instance_message_id").map(col): _*)
    val diffKeys = counted.where(col("n") === 1)
      .select(Key.map(col): _*)
      .distinct()
    (same, diffKeys)
  }
}
