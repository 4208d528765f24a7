package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.DynamicFilter._

/** Update-log slicing with dynamic arguments — the `fieldFilter` /
  * `get_field_updates` query family (`Java/.../RetrieveField.java:50-93`,
  * `Scala/.../Retrieve_field.scala:35-78`).
  *
  * Time bounds are given on `instance_message.log_time` but the fact table
  * is keyed by `instance_message_id`, so bounds resolve through two O(1)
  * scalar aggregates (the reference's `orderBy(id).first()` ≡ `min/max(id)`)
  * — the only driver round-trips in the query, same as the reference, but
  * typed instead of string-spliced. The resulting ID range then prunes the
  * fact scan (row-group skipping on `instance_message_id` min/max stats at
  * scale).
  */
object FieldFilter {

  case class Args(
      uevolMessageId: Int = -1,
      uevolFieldId: Int = -1,
      srcId: Int = -1,
      dstId: Int = -1,
      srcTy: Int = -1,
      dstTy: Int = -1,
      seqNb: Int = -1,
      startLogTime: Long = -1L,
      endLogTime: Long = -1L,
      duration: Long = -1L,
      chosenValue: Long = -1L)

  /** Slice the update log per the reference's argument semantics. Sentinel
    * −1 / "" means "absent". Where the reference would NPE on an empty
    * bound-resolution (`first()` of an empty Dataset), this returns an empty
    * slice.
    */
  def fieldFilter(instanceField: DataFrame, instanceMessage: DataFrame, a: Args): DataFrame = {
    val f = instanceField.where(conjunct(
      eqArg(col("uevol_field_id"), a.uevolFieldId),
      eqArg(col("new_value"), a.chosenValue),
      eqArg(col("src_id"), a.srcId),
      eqArg(col("dst_id"), a.dstId)))
    val m = instanceMessage.where(conjunct(
      eqArg(col("uevol_message_id"), a.uevolMessageId),
      eqArg(col("src_ty"), a.srcTy),
      eqArg(col("dst_ty"), a.dstTy)))

    if (a.seqNb != -1) {
      // seq_nb pins one exact message instance (RetrieveField.java:66-69).
      scalarLong(m.where(col("seq_nb") === a.seqNb).agg(min("id"))) match {
        case Some(id) => f.where(col("instance_message_id") === id)
        case None => f.where(lit(false))
      }
    } else {
      val endLogTime =
        if (a.endLogTime == -1L && a.duration != -1L && a.startLogTime != -1L)
          a.startLogTime + a.duration // RetrieveField.java:85-90
        else a.endLogTime
      // bounds stay epoch-ns scalars in the Args contract; the literal is
      // matched to the frame's log_time storage type so the predicate
      // pushes into the scan whatever the parquet shipped (Tables.tsLit)
      val ltDt = m.schema("log_time").dataType
      val lo = if (a.startLogTime == -1L) Some(Long.MinValue)
        else scalarLong(m.where(col("log_time") >=
          graft.io.Tables.tsLit(ltDt, a.startLogTime)).agg(min("id")))
      val hi = if (endLogTime == -1L) Some(Long.MaxValue)
        else scalarLong(m.where(col("log_time") <=
          graft.io.Tables.tsLit(ltDt, endLogTime)).agg(max("id")))
      (lo, hi) match {
        case (Some(l), Some(h)) => f.where(col("instance_message_id").between(l, h))
        case _ => f.where(lit(false))
      }
    }
  }

  /** Gen-1 variant with boundary padding (`Retrieve_field.scala:66-75`):
    * the window's own first/last updates are echoed as synthetic rows at the
    * window edges — the first row's `previous_value` is the value in effect
    * at `startLogTime`, the last row's `new_value` the value at `endLogTime`.
    * `updates` needs (log_time, previous_value, new_value) columns.
    *
    * Both boundary rows come from ONE `min_by`/`max_by(struct)` aggregate
    * over the window slice (map-side combinable, no global sort), and the
    * slice itself is persisted because two subplans (core + the boundary
    * agg) read it — the repo's S4 rule. The persist is registered with
    * [[graft.CacheRegistry]]; callers release it once the result is
    * consumed. Ordering ties on `log_time` break by the remaining columns
    * (a total order over the row), which is deterministic where the
    * reference's `orderBy(log_time).first()` was not.
    */
  def updatesWithBoundaries(updates: DataFrame, cond: Column,
                            startLogTime: Long, endLogTime: Long): DataFrame = {
    val ltDt = updates.schema("log_time").dataType
    val (loLit, hiLit) = (graft.io.Tables.tsLit(ltDt, startLogTime),
      graft.io.Tables.tsLit(ltDt, endLogTime))
    val inWindow = graft.CacheRegistry.track(
      updates.where(cond && col("log_time").between(loLit, hiLit))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cols = inWindow.columns.toSeq
    val rowS = struct(cols.map(col): _*)
    val ord = struct((col("log_time") +: cols.filterNot(_ == "log_time").map(col)): _*)
    // one row: (first_row, last_row) — null structs when the slice is empty
    val edges = inWindow
      .agg(min_by(rowS, ord).as("__first"), max_by(rowS, ord).as("__last"))
      .select(explode(array(
        struct(lit(true).as("is_first"), col("__first").as("row")),
        struct(lit(false).as("is_first"), col("__last").as("row")))).as("e"))
      .where(col("e.row").isNotNull)
      .select(col("e.is_first").as("__is_first") +: cols.map(c => col(s"e.row.`$c`").as(c)): _*)
      .withColumn("field_value",
        when(col("__is_first"), col("previous_value")).otherwise(col("new_value")))
      .withColumn("log_time",
        when(col("__is_first"), loLit).otherwise(hiLit))
      .drop("__is_first")
    val core = inWindow.withColumn("field_value", col("new_value"))
    edges.unionByName(core)
      .drop("previous_value", "new_value")
  }

  private def scalarLong(agged: DataFrame): Option[Long] =
    Option(agged.head().get(0)).map(_.asInstanceOf[Number].longValue)
}
