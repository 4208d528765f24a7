package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rendering of per-path state rows back into the reference's nested
  * `json_value` — the exact inverse of [[JsonExplode.flatten]], for
  * producing snapshots (`SQL/GetMessage.sql:96-101` consumes this shape;
  * the reference's own dumper writes it out-of-band).
  *
  * Path depth decides nesting, mirroring the flatten lattice: 1–2 segment
  * paths ("000", "000.001") are top-level scalar entries; ≥3 segment paths
  * nest under their 2-segment parent as an inner object whose keys are the
  * FULL leaf paths. Fragments are sorted by path so the rendered text is
  * deterministic. All string building is lambda-free except `transform`
  * over already-aggregated fragment arrays (element-only references —
  * pushdown-safe).
  *
  * Precondition (the reference's own schema invariant): a path is either a
  * leaf or a parent, never both — a key carrying BOTH a depth-2 scalar row
  * ("000.001") and deeper rows under it ("000.001.001") has no JSON
  * representation. [[render]] then emits a duplicate top-level key, which
  * `JsonExplode.flatten` rejects loudly (Spark's default map-key dedup
  * policy is EXCEPTION), so the round-trip fails rather than silently
  * dropping state. Probe with [[conflicts]] when the input is untrusted.
  */
object SnapshotJson {

  /** The (keep, path) combinations [[render]] cannot represent as JSON —
    * a 2-segment path that is both a scalar entry and a deep parent, or
    * duplicate rows at the same (keep, relative_path) (either produces a
    * duplicate JSON key). Empty ⟺ render is safe.
    */
  def conflicts(rows: DataFrame, keep: Seq[String]): DataFrame = {
    val keepCols = keep.map(col)
    val depth = size(split(col("relative_path"), "\\."))
    val scalars = rows.where(depth === 2)
      .select(keepCols :+ col("relative_path").as("p"): _*)
    val parents = rows.where(depth >= 3)
      .select(keepCols :+ expr("substring_index(relative_path, '.', 2)").as("p"): _*)
      .distinct()
    val mixed = scalars.join(parents, keep :+ "p")
    val dups = rows
      .groupBy(keepCols :+ col("relative_path").as("p"): _*)
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1)
      .select(keepCols :+ col("p"): _*)
    mixed.unionByName(dups).distinct()
  }

  /** (keep..., relative_path, value) rows → (keep..., json_value), one row
    * per distinct `keep` tuple. Two partial-agg shuffles (parent grouping,
    * key grouping), both keyed well below the input cardinality.
    */
  def render(rows: DataFrame, keep: Seq[String]): DataFrame = {
    val keepCols = keep.map(col)
    val depth = size(split(col("relative_path"), "\\."))
    val frag = concat(lit("\""), col("relative_path"), lit("\":"),
      col("value").cast("string"))

    val top = rows.where(depth <= 2)
      .select(keepCols :+ col("relative_path").as("k") :+ frag.as("frag"): _*)

    val deep = rows.where(depth >= 3)
      .withColumn("__parent", expr("substring_index(relative_path, '.', 2)"))
      .groupBy(keepCols :+ col("__parent"): _*)
      .agg(sort_array(collect_list(struct(
        col("relative_path").as("p"), frag.as("f")))).as("fs"))
      .select(keepCols :+ col("__parent").as("k") :+
        concat(lit("\""), col("__parent"), lit("\":{"),
          concat_ws(",", transform(col("fs"), x => x.getField("f"))),
          lit("}")).as("frag"): _*)

    top.unionByName(deep)
      .groupBy(keepCols: _*)
      .agg(sort_array(collect_list(struct(col("k"), col("frag")))).as("fs"))
      .select(keepCols :+ concat(lit("{"),
        concat_ws(",", transform(col("fs"), x => x.getField("frag"))),
        lit("}")).as("json_value"): _*)
  }
}
