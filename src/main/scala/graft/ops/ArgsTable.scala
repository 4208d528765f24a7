package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Argument-list parsing & expansion (SURVEY.md §2.1 S5, §2.3 J7/J9).
  *
  * The reference turns `'(1),(2),(3)'` text lists into an arguments table
  * with SQL string surgery + a positional 4-way join
  * (`SQL/CreateArgumentsTable.sql:8-123`, `SQL/SPLIT_STR.sql:6-14`). Argument
  * lists are tiny (user input), so the idiomatic-Spark shape is: parse on the
  * driver, `toDF`, and let the caller broadcast-join the result — never a
  * distributed string-parsing job.
  */
object ArgsTable {

  /** Parse a `'(a),(b),(c)'` list literal into its element strings. */
  def parseList(s: String): Seq[String] =
    parseListKeepEmpty(s).filter(_.nonEmpty)

  /** Like [[parseList]] but keeps empty `()` elements — required when lists
    * are zipped positionally (e.g. the per-argument filter list, where `()`
    * means "no filter for this triple"). Only the single WRAPPING paren pair
    * is stripped per element: parentheses inside an element body (e.g. a
    * filter `((value+1)*2>5)`) survive intact.
    */
  def parseListKeepEmpty(s: String): Seq[String] =
    if (s == null || s.trim.isEmpty) Seq.empty
    else {
      val parts = s.trim.split("""\)\s*,\s*\(""", -1)
      val last = parts.length - 1
      parts.zipWithIndex.map { case (p, i) =>
        val noOpen = if (i == 0) p.replaceFirst("""^\s*\(""", "") else p
        val noClose = if (i == last) noOpen.replaceFirst("""\)\s*$""", "") else noOpen
        noClose.trim
      }.toSeq
    }

  /** Expand a user-id list x event-type list into concrete argument pairs
    * (the reference's src/dst IN-list expansion, CreateArgumentsTable.sql:74-101),
    * deduplicated. Returns a tiny DataFrame meant for `broadcast(...)`.
    */
  def expand(spark: SparkSession, userList: String, typeList: String): DataFrame = {
    import spark.implicits._
    val pairs = for {
      u <- parseList(userList).map(_.toLong)
      t <- parseList(typeList)
    } yield (u, t)
    pairs.distinct.toDF("user_id", "event_type")
  }

  /** Zip N parallel positional lists into one row per position (the
    * reference's `FROM t1,t2,t3 WHERE t1.id=t2.id AND ...` positional join,
    * CreateArgumentsTable.sql:36-37). Truncates to the shortest list.
    * Empty `()` elements are KEPT (as "") — dropping them would shift later
    * positions and misalign the zip.
    */
  def zip(spark: SparkSession, cols: Seq[(String, String)]): DataFrame = {
    val names = cols.map(_._1)
    val lists = cols.map(c => parseListKeepEmpty(c._2))
    val n = if (lists.isEmpty) 0 else lists.map(_.size).min
    val rows = (0 until n).map(i => Row.fromSeq(lists.map(_(i))))
    val schema = StructType(names.map(StructField(_, StringType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1), schema)
  }
}
