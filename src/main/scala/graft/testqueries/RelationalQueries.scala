package graft.testqueries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{ArgmaxLatest, DynamicFilter}

/** Relational operator coverage (SURVEY.md §2.2–§2.6) expressed over the
  * driver's TPC-H-ish testdata, each paired with a DuckDB oracle.
  *
  * Numeric outputs are rounded onto the data's own cent/10⁻⁴ grids so the
  * hash compare is immune to float summation order; dates are emitted as
  * 'yyyy-MM-dd' strings so Parquet timestamp unit differences (ns vs µs)
  * can't break the compare.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 A-family: grouped aggregation (TPC-H Q1 shape). Map-side partial
    // aggregation collapses each scan partition to ≤|groups| rows before the
    // single shuffle — the shape that survives 100 TB.
    "q01_agg_pricing" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // §2.2 P1–P3: dynamic conjunctive filter + projection/derivation. The
    // whole conjunction reaches the Parquet scan as PushedFilters.
    "q02_filter_project" -> { (s, dir) =>
      val cond = DynamicFilter.conjunct(
        DynamicFilter.eqArg(col("l_returnflag"), "R"),
        Some(col("l_shipdate") >= lit("2000-01-01").cast("timestamp")),
        DynamicFilter.geArg(col("l_quantity"), 45L))
      t(s, dir, "lineitem")
        .where(cond)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
    },

    // §2.3 J1/J3: star-join decoration with two broadcast dims, then agg.
    "q03_join_star" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      cust
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("total_bal"))
    },

    // §2.2 P5: IN-subquery as left_semi join (no dedup/shuffle of the big side
    // beyond the join itself; Catalyst broadcasts the filtered key set).
    "q04_semi_join" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("2001-06-01").cast("timestamp"))
      t(s, dir, "part")
        .join(li, col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_brand", "p_type")
    },

    // §2.3 J4: NOT-EXISTS as a real left_anti join (the reference emulates it
    // with LEFT OUTER + IS NULL, SQL/GetMessage.sql:372-377).
    "q05_anti_join" -> { (s, dir) =>
      val recent = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      t(s, dir, "customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    },

    // §2.3 J5 + §2.7 F11: left outer join + sentinel defaults via coalesce —
    // the reference mutates NULLs to -1/0 post-hoc; here it's projection-time.
    "q06_outer_defaults" -> { (s, dir) =>
      val perCust = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("spend"))
      t(s, dir, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(
          col("c_custkey"),
          coalesce(col("cnt"), lit(0L)).as("order_count"),
          coalesce(col("spend"), lit(0.0)).as("total_spend"))
    },

    // §2.3 J6 / §2.4 A3: greatest-row-per-group via max_by partial agg —
    // replaces the reference's max-GROUP-BY + RIGHT OUTER self-join
    // (SQL/GetMessage.sql:205-214) and its per-row UDF (RetrieveMessage.java:92-105).
    "q07_argmax_latest" -> { (s, dir) =>
      val latest = ArgmaxLatest.latestRows(
        // prune to the argmax payload BEFORE the shuffle: max_by(struct)
        // carries every input column through the exchange otherwise
        t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        Seq("o_custkey"),
        struct(col("o_orderdate"), col("o_orderkey")))
      latest.select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"))
    },

    // §2.5 W1: top-K per group with full deterministic tie-break.
    "q08_window_topk" -> { (s, dir) =>
      ArgmaxLatest.topKPerKey(
          t(s, dir, "lineitem"),
          Seq("l_suppkey"),
          Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
          3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    },

    // §2.5 W6-adjacent: running sum over an ordered per-key frame.
    "q09_running_sum" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
    },

    // §2.6 U2 + §2.4 A8/A9: union of overlapping slices + distinct.
    "q10_union_dedup" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val big = o.where(col("o_totalprice") > 450000.0)
      val recent = o.where(col("o_orderdate") >= lit("2001-06-01").cast("timestamp"))
      big.unionByName(recent)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .distinct()
    },

    // §2.4 A1/A2: GROUP BY + HAVING count threshold.
    "q11_having" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_lines"), round(sum("l_quantity"), 2).as("total_qty"))
        .where(col("n_lines") > 40)
    },

    // §2.4 A4: COUNT(DISTINCT) per group (exact; swap to
    // approx_count_distinct at 100 TB when ±2% is acceptable).
    "q12_count_distinct" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
        .agg(countDistinct(col("o_custkey")).as("n_custs"), count(lit(1)).as("n_orders"))
    },

    // Fact-side aggregate first, then decorate with two broadcast dims —
    // the aggregate-before-join order matters at scale: the shuffle carries
    // one row per supplier, not one per lineitem.
    "q21_supplier_revenue" -> { (s, dir) =>
      val revenue = t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      revenue
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"), col("revenue"))
    },

    // §2.5 W2/W5: global order + limit with total tie-break (driver sorts
    // rows before hashing, so the SET must be deterministic — it is).
    "q16_sort_limit" -> { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    })

  val oracles: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
         round(l_extendedprice * (1.0 - l_discount), 4) AS revenue
         FROM lineitem
         WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '2000-01-01'
           AND l_quantity >= 45""",
    "q03_join_star" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
         round(sum(c_acctbal), 2) AS total_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q04_semi_join" ->
      """SELECT p_partkey, p_brand, p_type FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem
           WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-06-01')""",
    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')""",
    "q06_outer_defaults" ->
      """SELECT c_custkey,
         coalesce(cnt, 0) AS order_count,
         coalesce(spend, 0.0) AS total_spend
         FROM customer LEFT JOIN (
           SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
                  round(sum(o_totalprice), 2) AS spend
           FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
           GROUP BY o_custkey) ON c_custkey = o_custkey""",
    "q07_argmax_latest" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders) WHERE rn = 1""",
    "q08_window_topk" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rn
               FROM lineitem) WHERE rn <= 3""",
    "q09_running_sum" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
         FROM orders""",
    "q10_union_dedup" ->
      """SELECT DISTINCT o_orderkey, o_custkey, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS order_date
         FROM (SELECT * FROM orders WHERE o_totalprice > 450000.0
               UNION ALL
               SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01')""",
    "q11_having" ->
      """SELECT l_partkey, count(*) AS n_lines,
         round(sum(l_quantity), 2) AS total_qty
         FROM lineitem GROUP BY l_partkey HAVING count(*) > 40""",
    "q12_count_distinct" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
         count(*) AS n_orders
         FROM orders GROUP BY 1""",
    "q16_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""",
    "q21_supplier_revenue" ->
      """SELECT s_suppkey, s_name, n_name, revenue FROM (
           SELECT l_suppkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
           FROM lineitem GROUP BY l_suppkey)
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey""")
}
