package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Snapshot-JSON flattening (SURVEY.md §2.7 F1–F5, §2.8 UD5).
  *
  * The reference probes the JSON nesting degree (0/1/2) per row and loops
  * over `JSON_KEYS` with per-key INSERTs (`SQL/GetJsonDegree.sql:10-25`,
  * `SQL/GetMessage.sql:282-355`). Here every degree flattens in one pass:
  * parse as `map<string,string>`, explode, and re-explode values that are
  * themselves objects. Keys contain dots (`"000.001"`), so we never use
  * JSON-path extraction — map keys are opaque (SURVEY.md §7.5 risk 2).
  */
object JsonExplode {

  private val Mapped = MapType(StringType, StringType)

  /** Flatten `jsonCol` into (relative_path, value) rows, carrying `keep`
    * columns through. Degree 0/1 keys emit directly; degree-2 inner objects
    * emit one row per inner key (inner keys are full relative paths).
    * Null/empty-object rows emit nothing — callers apply sentinel defaults.
    *
    * Single pass: ONE scan, one outer `from_json`, two chained explodes,
    * and no higher-order lambdas (HOFs evaluate interpreted — measured
    * slower than a second generator here). A leaves ∪ nested union would
    * scan and parse the source twice instead.
    *
    * Both generators are `explode_outer` + a null filter on the GENERATED
    * attribute, not plain `explode`: InferFiltersFromGenerate would copy
    * `size(...) > 0` predicates into a pre-Generate Filter where the
    * `from_json` parse gets inlined and re-evaluated per row (2-3 parses
    * per row per level; see MinHashLSH.shingles for the measured cost of
    * this optimizer shape). The post-Generate filters test concrete
    * attributes — no re-parse — and restore exactly the plain-explode
    * semantics (null/empty inputs emit nothing).
    */
  def flatten(df: DataFrame, jsonCol: String, keep: Seq[String]): DataFrame = {
    val keepCols = keep.map(col)
    val lvl1 = df
      .select(keepCols :+ explode_outer(from_json(col(jsonCol), Mapped)).as(Seq("rp", "rv")): _*)
      .where(col("rp").isNotNull)
    val kv = when(col("rv").startsWith("{"),
        map_entries(from_json(col("rv"), Mapped)))
      .otherwise(array(struct(col("rp").as("key"), col("rv").as("value"))))
    lvl1
      .select(keepCols :+ explode_outer(kv).as("e"): _*)
      .where(col("e").isNotNull)
      .select(keepCols :+ col("e.key").as("relative_path")
        :+ col("e.value").cast("double").as("value"): _*)
  }

  /** Nesting degree of a JSON value column (0: scalar leaf under one key,
    * 1: flat object, 2: object of objects) — the reference's GetJsonDegree
    * probe as a plan-time expression. Degree here = 1 + (values are objects).
    */
  def degree(jsonCol: Column): Column =
    when(jsonCol.isNull || jsonCol === "{}", lit(-1))
      .when(size(map_keys(from_json(jsonCol, Mapped))) === 1 &&
        !element_at(map_values(from_json(jsonCol, Mapped)), 1).startsWith("{"), lit(0))
      .when(exists(map_values(from_json(jsonCol, Mapped)), v => v.startsWith("{")), lit(2))
      .otherwise(lit(1))

  /** Scalar (`$."000"`) extraction with numeric cast — the degree-0 fallback
    * (`SQL/GetMessage.sql:571-590`). Map-typed access, dot-safe.
    */
  def scalarValue(jsonCol: Column): Column =
    element_at(from_json(jsonCol, Mapped), "000").cast("double")
}
