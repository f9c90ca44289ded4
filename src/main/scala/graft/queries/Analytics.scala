package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The downstream-analytics surface the reference defers to DuckDB
  * (reference README.md:99-103; SURVEY.md §2.2): joins, aggregations,
  * windows, set ops, time buckets over the star schema + events.
  *
  * Scale notes (100 TB posture): every aggregation is a partial-agg
  * shuffle on its group keys; dimension joins (region/nation/customer/
  * supplier) broadcast under the session's 64 MB threshold so the fact
  * table never shuffles for them; windows partition by their natural key
  * (segment / user) so skew stays bounded by key cardinality.
  *
  * Oracle parity notes: double sums are rounded at 2 decimals (sums of
  * money-like values; SURVEY §7.3 item 5); l_quantity is integral so its
  * sums/avgs are exact in IEEE double regardless of order; counts are
  * exact. Column names are aliased identically on both sides.
  */
object Analytics {

  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  // -- q01: filter + project with computed column (P1/P2 pushdown shape) --
  private val q01: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_quantity" > 45 && $"l_discount" <= 0.02)
      .select($"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
  }
  private val q01Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS revenue
      |FROM lineitem WHERE l_quantity > 45 AND l_discount <= 0.02""".stripMargin

  // -- q02: global sort + top-n (P3 + limit) --
  private val q02: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(100)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }
  private val q02Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // -- q03: TPC-H Q1-style pricing summary --
  private val q03: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc"),
        avg($"l_quantity").as("avg_qty"),
        count(lit(1)).as("cnt"))
  }
  private val q03Sql =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc,
      |  avg(l_quantity) AS avg_qty,
      |  count(*) AS cnt
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // -- q04: 4-way join + agg, revenue by nation (dims broadcast) --
  private val q04: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }
  private val q04Sql =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  // -- q05: window top-k per group --
  private val q05: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    t(s, dir, "customer")
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
        row_number().over(w).cast("long").as("rn"))
      .filter($"rn" <= 3)
  }
  private val q05Sql =
    """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) WHERE rn <= 3""".stripMargin

  // -- q06: distinct --
  private val q06: Q = (s, dir) =>
    t(s, dir, "orders").select("o_orderpriority", "o_orderstatus").distinct()
  private val q06Sql =
    "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders"

  // -- q07: date_trunc month buckets --
  private val q07: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      // trunc() keeps DateType (date_trunc widens to timestamp; DuckDB's
      // date_trunc over DATE stays DATE, so trunc is the parity form)
      .groupBy(trunc($"o_orderdate", "month").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total"))
  }
  private val q07Sql =
    """SELECT date_trunc('month', o_orderdate) AS month,
      |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1""".stripMargin

  // -- q08: rollup over region/nation --
  private val q08: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_cust"), round(sum($"c_acctbal"), 2).as("acctbal"))
  }
  private val q08Sql =
    """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)""".stripMargin

  // -- q09: EXCEPT (customers with no orders) --
  private val q09: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "customer").select($"c_custkey")
      .except(t(s, dir, "orders").select($"o_custkey".as("c_custkey")))
  }
  private val q09Sql =
    "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey AS c_custkey FROM orders"

  // -- q10: INTERSECT (nations having both customers and suppliers) --
  private val q10: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "customer").select($"c_nationkey".as("nationkey"))
      .intersect(t(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
  }
  private val q10Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT SELECT s_nationkey AS nationkey FROM supplier""".stripMargin

  // -- q11: JSON extraction + agg over events.props --
  private val q11: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
  }
  private val q11Sql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  // -- q12: gap sessionization (30 min) over events --
  private val q12: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val ms = unix_millis($"ts")
    val gap = ms - lag(ms, 1).over(w)
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"ts", $"value",
        when(gap.isNull || gap > 1800000L, 1L).otherwise(0L).as("ns"))
      .select($"user_id", $"event_id", $"ts", $"value",
        sum($"ns").over(w).as("session"))
      .groupBy($"user_id", $"session")
      .agg(count(lit(1)).as("n_events"),
        min(unix_millis($"ts")).as("start_ms"),
        max(unix_millis($"ts")).as("end_ms"),
        round(sum($"value"), 2).as("total_value"))
  }
  private val q12Sql =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
      |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session
      |  FROM g)
      |SELECT user_id, session, count(*) AS n_events,
      |  min(epoch_ms(ts)) AS start_ms, max(epoch_ms(ts)) AS end_ms,
      |  round(sum(value), 2) AS total_value
      |FROM s GROUP BY user_id, session""".stripMargin

  // -- q13: hourly event-type buckets --
  private val q13: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
  }
  private val q13Sql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2""".stripMargin

  // -- q14: T5 batch append — unionByName across differing column sets --
  private val q14: Q = (s, dir) => {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val a = li.filter($"l_orderkey" % 3 === 0)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val b = li.filter($"l_orderkey" % 3 === 1)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    a.unionByName(b, allowMissingColumns = true)
  }
  private val q14Sql =
    """SELECT l_orderkey, l_partkey, l_quantity, NULL::DOUBLE AS l_extendedprice
      |FROM lineitem WHERE l_orderkey % 3 = 0
      |UNION ALL
      |SELECT l_orderkey, NULL::BIGINT AS l_partkey, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_orderkey % 3 = 1""".stripMargin

  // -- q15: anti join — parts never ordered --
  private val q15: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "part")
      .join(t(s, dir, "lineitem"), $"p_partkey" === $"l_partkey", "left_anti")
      .select($"p_partkey", $"p_name")
  }
  private val q15Sql =
    """SELECT p_partkey, p_name FROM part
      |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)""".stripMargin

  // -- q16: semi join — customers having at least one order --
  private val q16: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_mktsegment")
  }
  private val q16Sql =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)""".stripMargin

  // -- q17: left outer join + agg preserving zero-order customers --
  private val q17: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"),
        round(sum(coalesce($"o_totalprice", lit(0.0))), 2).as("total"))
  }
  private val q17Sql =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  round(sum(coalesce(o_totalprice, 0)), 2) AS total
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey""".stripMargin

  // -- q18: cube over order priority x status --
  private val q18: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
  }
  private val q18Sql =
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin

  // -- q19: running per-customer revenue (cumulative window) --
  private val q19: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        round(sum($"o_totalprice").over(w), 2).as("running_total"))
  }
  private val q19Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  round(sum(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      |FROM orders""".stripMargin

  // -- q34: salted two-phase aggregation over hot keys --
  // l_returnflag has 3 distinct values, so a plain groupBy funnels 1/3 of
  // the table through each of 3 reducers regardless of cluster size; the
  // salted form (graft.operators.Skew) spreads each hot key over 16
  // partial groups first. Results are exactly re-aggregable, so the
  // oracle is the plain GROUP BY.
  private val q34: Q = (s, dir) => {
    import s.implicits._
    graft.operators.Skew.saltedSumCount(
      t(s, dir, "lineitem"),
      keys = Seq($"l_returnflag"), saltBy = $"l_orderkey", salts = 16,
      value = $"l_quantity", sumAlias = "sum_qty", cntAlias = "n")
      .select($"l_returnflag", $"sum_qty", $"n")
  }
  private val q34Sql =
    """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // -- q35: correlated scalar subquery (Catalyst decorrelates to a join) --
  // Registered through the SQL surface on purpose: users of the library
  // get spark.sql too, and the decorrelation rewrite (subquery -> agg +
  // join) is exactly what makes this shape scale instead of re-running
  // the inner query per row.
  private val q35: Q = (s, dir) => {
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders_v o
      WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                                FROM orders_v o2
                                WHERE o2.o_custkey = o.o_custkey)""")
  }
  private val q35Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
      |                          FROM orders o2
      |                          WHERE o2.o_custkey = o.o_custkey)""".stripMargin

  // -- q36: exact interpolated percentiles per group --
  private val q36: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        percentile($"l_quantity", lit(0.5)).as("med_qty"),
        percentile($"l_quantity", lit(0.9)).as("p90_qty"),
        round(percentile($"l_extendedprice", lit(0.25)), 2).as("p25_price"))
  }
  private val q36Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS med_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.25), 2) AS p25_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // -- q37: sketch aggregations (HLL++ distinct, approximate percentile) --
  // Sketch bits differ across engines, so the raw sketch values can't
  // hash-match a DuckDB oracle. Instead the accuracy CONTRACT is the
  // oracle: both sides emit the exact answers (hash-checked for
  // exactness) plus within-tolerance booleans — Spark compares its own
  // sketch values against its own exact values; DuckDB asserts TRUE.
  // A sketch drifting outside its documented bound (3×rsd for HLL++,
  // one quantile step for percentile_approx) flips a boolean and fails
  // the hash. SketchSpec pins the same bounds in Scala. At scale the
  // sketch forms are the re-aggregable, fixed-memory versions of
  // q06/q36 — the exact companions here exist to make the check real.
  private val q37: Q = (s, dir) => {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    // one pass of re-aggregable sketches (the production shape)...
    val sk = li.groupBy($"l_returnflag").agg(
      approx_count_distinct($"l_partkey").as("nd_parts_approx"),
      approx_count_distinct($"l_orderkey").as("nd_orders_approx"),
      percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("med_qty_approx"))
    // ...and the exact companions, each as its own narrow aggregation —
    // NOT one agg with two count_distincts, which would Expand the scan
    // 3× under a buffering percentile. The joins are 3-row broadcasts.
    // count(col), not count(*): a null key must not count as a distinct
    // value (SQL COUNT(DISTINCT) semantics, matched by the oracle)
    val ndp = li.select($"l_returnflag", $"l_partkey").distinct()
      .groupBy($"l_returnflag").agg(count($"l_partkey").as("nd_parts"))
    val ndo = li.select($"l_returnflag", $"l_orderkey").distinct()
      .groupBy($"l_returnflag").agg(count($"l_orderkey").as("nd_orders"))
    val med = li.groupBy($"l_returnflag")
      .agg(percentile($"l_quantity", lit(0.5)).as("med_qty"))
    sk.join(ndp, Seq("l_returnflag")).join(ndo, Seq("l_returnflag"))
      .join(med, Seq("l_returnflag"))
      .select($"l_returnflag", $"nd_parts", $"nd_orders", $"med_qty",
        (abs($"nd_parts_approx" - $"nd_parts") <= $"nd_parts" * 0.15).as("nd_parts_ok"),
        (abs($"nd_orders_approx" - $"nd_orders") <= $"nd_orders" * 0.15).as("nd_orders_ok"),
        (abs($"med_qty_approx" - $"med_qty") <= 1.0).as("med_qty_ok"))
  }
  private val q37Sql =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS nd_parts,
      |  count(DISTINCT l_orderkey) AS nd_orders,
      |  quantile_cont(l_quantity, 0.5) AS med_qty,
      |  TRUE AS nd_parts_ok, TRUE AS nd_orders_ok, TRUE AS med_qty_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // -- q38: full outer join with null sides both ways --
  private val q38: Q = (s, dir) => {
    import s.implicits._
    val c = t(s, dir, "customer").filter($"c_acctbal" > 9000)
      .groupBy($"c_nationkey".as("nationkey")).agg(count(lit(1)).as("n_cust"))
    val p = t(s, dir, "supplier").filter($"s_acctbal" > 9000)
      .groupBy($"s_nationkey".as("nationkey")).agg(count(lit(1)).as("n_supp"))
    c.withColumnRenamed("nationkey", "c_nk")
      .join(p.withColumnRenamed("nationkey", "s_nk"), $"c_nk" === $"s_nk", "full_outer")
      .select(coalesce($"c_nk", $"s_nk").as("nationkey"),
        coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp"))
  }
  private val q38Sql =
    """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
      |           FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
      |     p AS (SELECT s_nationkey AS nk, count(*) AS n_supp
      |           FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
      |SELECT coalesce(c.nk, p.nk) AS nationkey,
      |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN p ON c.nk = p.nk""".stripMargin

  // -- q39: ranking/navigation window family --
  private val q39: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice",
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"))
      .filter($"rnk" <= 500)
  }
  private val q39Sql =
    """SELECT * FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    rank() OVER w AS rnk,
      |    dense_rank() OVER w AS drnk,
      |    ntile(4) OVER w AS quartile,
      |    lag(o_totalprice, 1) OVER w AS prev_price,
      |    lead(o_totalprice, 1) OVER w AS next_price
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority
      |               ORDER BY o_totalprice DESC, o_orderkey))
      |WHERE rnk <= 500""".stripMargin

  // -- q50: as-of join — each click joined to the user's latest prior
  // purchase (inclusive). DuckDB's native ASOF JOIN is the oracle; the
  // Spark side is the union + carry-forward composition (AsofJoin), one
  // shuffle on the user key. --
  private val q50: Q = (s, dir) => {
    import s.implicits._
    val ev = t(s, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    graft.operators.AsofJoin.backward(
      clicks, purchases,
      keyCols = Seq("user_id"), tsCol = "ts", tieBreak = "event_id",
      rightCols = Seq("value"))
      .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"),
        round($"value", 2).as("last_purchase_value"))
  }
  private val q50Sql =
    """SELECT c.user_id, c.event_id, epoch_ms(c.ts) AS ts_ms,
      |  round(p.value, 2) AS last_purchase_value
      |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN
      |     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  // -- q159: gap-filled daily resampling with forward-fill — the
  // time-series regularization step (metrics dashboards, feature
  // snapshots): each user's value series resampled onto a daily grid
  // from date_trunc(day, first obs) to last obs, each grid instant
  // carrying the latest observation at-or-before it (null before the
  // first). The grid is a per-key sequence explode (rows = keys × days,
  // never a cross join with the corpus), and the fill is the SAME
  // AsofJoin.backward carry-forward composition as q50 — one shuffle on
  // the user key. Oracle: generate_series grid + DuckDB's native ASOF
  // LEFT JOIN, an independent implementation of the fill. --
  private val q159: Q = (s, dir) => {
    import s.implicits._
    val ev = t(s, dir, "events")
    val grid = ev.groupBy($"user_id")
      .agg(date_trunc("DAY", min($"ts")).as("__mn"), max($"ts").as("__mx"))
      .select($"user_id",
        explode(sequence($"__mn", $"__mx", expr("interval 1 day"))).as("ts"))
      .withColumn("event_id", lit(-1L)) // tie-break slot; grid rows are unique
    graft.operators.AsofJoin.backward(
      grid, ev.select($"user_id", $"event_id", $"ts", $"value"),
      keyCols = Seq("user_id"), tsCol = "ts", tieBreak = "event_id",
      rightCols = Seq("value"))
      .select($"user_id", unix_millis($"ts").as("gts_ms"),
        round($"value", 2).as("last_value"))
  }
  private val q159Sql =
    """WITH b AS (
      |  SELECT user_id, date_trunc('day', min(ts)) AS mn, max(ts) AS mx
      |  FROM events GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS gts
      |  FROM b)
      |SELECT g.user_id, epoch_ms(g.gts) AS gts_ms,
      |  round(e.value, 2) AS last_value
      |FROM grid g ASOF LEFT JOIN
      |     (SELECT user_id, ts, value FROM events) e
      |  ON g.user_id = e.user_id AND g.gts >= e.ts""".stripMargin

  // -- q160: rolling event-time aggregates — per-user trailing-hour
  // count and value sum via a RANGE window over epoch seconds (the
  // sliding companion of q13's tumbling buckets; q19's running total is
  // the unbounded case). Values enter as exact integer cents
  // (round(value*100)) so the windowed sums are order-independent
  // longs — no float-summation parity risk inside engine-internal frame
  // order. One shuffle on the user key; frame state is the hour's rows. --
  private val q160: Q = (s, dir) => {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
      .orderBy(unix_seconds($"ts"))
      .rangeBetween(-3599L, 0L)
    t(s, dir, "events")
      .select($"event_id", $"user_id", $"ts",
        round($"value" * 100).cast("long").as("__cents"))
      .withColumn("cnt_1h", count(lit(1)).over(w))
      .withColumn("sum_cents_1h", sum($"__cents").over(w))
      .select($"event_id", $"user_id", unix_millis($"ts").as("ts_ms"),
        $"cnt_1h", $"sum_cents_1h")
  }
  private val q160Sql =
    """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      |  CAST(count(*) OVER w AS BIGINT) AS cnt_1h,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_cents_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""".stripMargin

  // -- q168: winsorization (Percentiles.winsorize) — l_extendedprice
  // clipped into its own exact [5%, 95%] quantile band (thresholds
  // quantized to the column's 2-dp precision): the fat-tail tamer that
  // keeps every row. Raw interpolated quantiles differ by 1 ulp between
  // the rank/interpolate pass and DuckDB at sf0.1 (measured) — the
  // roundTo=2 quantization is both the semantically right clip bound
  // for money and the cross-engine parity device (the q58 precedent). --
  private val q168: Q = (s, dir) => {
    import s.implicits._
    graft.operators.Percentiles.winsorize(
      t(s, dir, "lineitem").select($"l_orderkey", $"l_linenumber",
        $"l_extendedprice"),
      "l_extendedprice", lo = 0.05, hi = 0.95, roundTo = 2)
      .select($"l_orderkey", $"l_linenumber",
        $"l_extendedprice".as("price"), $"l_extendedprice_w".as("price_w"))
  }
  private val q168Sql =
    """WITH th AS (
      |  SELECT round(quantile_cont(l_extendedprice, 0.05), 2) AS lo,
      |         round(quantile_cont(l_extendedprice, 0.95), 2) AS hi
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, l_extendedprice AS price,
      |  least(greatest(l_extendedprice, lo), hi) AS price_w
      |FROM lineitem CROSS JOIN th""".stripMargin

  // -- q169: median/MAD robust outlier flags (Percentiles.madOutliers)
  // — robust z = 0.6745(x − median)/MAD over event values; cut 1.2 sits
  // inside the fixture's (bounded-support) z range so both flag values
  // appear. Two exact quantile passes feed a narrow scoring fold; the
  // unrounded z drives the flag, the 6-dp round only formats output. --
  private val q169: Q = (s, dir) => {
    import s.implicits._
    graft.operators.Percentiles.madOutliers(
      t(s, dir, "events").select($"event_id", $"value"), "value", cut = 1.2)
      .select($"event_id", $"value", round($"robust_z", 6).as("robust_z"),
        $"is_outlier")
  }
  private val q169Sql =
    """WITH m AS (SELECT quantile_cont(value, 0.5) AS med FROM events),
      |md AS (SELECT quantile_cont(abs(value - m.med), 0.5) AS mad
      |       FROM events, m),
      |z AS (SELECT event_id, value,
      |        CAST(0.6745 AS DOUBLE) * (value - m.med) / md.mad AS rz
      |      FROM events, m, md)
      |SELECT event_id, value, round(rz, 6) AS robust_z,
      |  abs(rz) > CAST(1.2 AS DOUBLE) AS is_outlier
      |FROM z""".stripMargin

  // -- q170: group-median imputation — the tabular null-repair step
  // (fill missing metrics from the cohort's median, not the global
  // one): nulls synthesized deterministically (event_id % 7), medians
  // from the exact per-group quantile pass over the NON-null rows
  // (Percentiles.quantileCont — the q58-proven interpolation parity),
  // broadcast back onto the stream. --
  private val q170: Q = (s, dir) => {
    import s.implicits._
    val ev = t(s, dir, "events").select($"event_id", $"event_type",
      when($"event_id" % 7 === 0, lit(null)).otherwise($"value").as("value"))
    val med = graft.operators.Percentiles.quantileCont(
      ev.filter($"value".isNotNull), Seq("event_type"), "value",
      Seq("med" -> 0.5))
    ev.join(broadcast(med), Seq("event_type"))
      .select($"event_id", $"event_type",
        coalesce($"value", $"med").as("value_filled"),
        $"value".isNull.as("was_null"))
  }
  private val q170Sql =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
      |  FROM events),
      |med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM ev WHERE value IS NOT NULL GROUP BY 1)
      |SELECT ev.event_id, ev.event_type,
      |  COALESCE(ev.value, med.med) AS value_filled,
      |  ev.value IS NULL AS was_null
      |FROM ev JOIN med USING (event_type)""".stripMargin

  // -- q171: blocked fuzzy join by edit distance (FuzzyJoin) — the
  // entity-resolution step: a "re-crawled" batch of part names, each
  // with ONE character deleted at a key-dependent position, matched
  // back at Levenshtein <= 2 through length-band blocking. The oracle
  // is the INDEPENDENT |length difference| <= maxDist formulation — the
  // hash match is simultaneously the completeness proof for the
  // blocking (no true pair missed). The 1/16 sample keeps BOTH sides
  // bounded: TPC-H part names concentrate in a few length bands (the
  // operator's documented skew caveat), so the quarter-sample form
  // benched 19 s at sf0.1 — candidate volume, not levenshtein, is the
  // knob, and the sample keeps the demo inside the bench budget while
  // the completeness theorem is size-independent. --
  private val q171: Q = (s, dir) => {
    import s.implicits._
    val parts = t(s, dir, "part").filter($"p_partkey" % 16 === 0)
      .select($"p_partkey", $"p_name")
    val pos = ($"p_partkey" % length($"p_name")).cast("int") + 1
    val batch = parts.select(($"p_partkey" + 100000).as("b_id"),
      concat($"p_name".substr(lit(1), pos - 1),
        $"p_name".substr(pos + 1, length($"p_name"))).as("b_name"))
    graft.operators.FuzzyJoin.byEditDistance(parts, batch,
      "p_partkey", "p_name", "b_id", "b_name", maxDist = 2)
  }
  private val q171Sql =
    """WITH parts AS (
      |  SELECT p_partkey, p_name FROM part WHERE p_partkey % 16 = 0),
      |batch AS (
      |  SELECT p_partkey + 100000 AS b_id,
      |    substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT)) ||
      |    substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2) AS b_name
      |  FROM parts)
      |SELECT a.p_partkey, b.b_id, levenshtein(a.p_name, b.b_name) AS dist
      |FROM parts a JOIN batch b
      |  ON abs(length(a.p_name) - length(b.b_name)) <= 2
      |WHERE levenshtein(a.p_name, b.b_name) <= 2""".stripMargin

  // -- q172: entity-resolution clusters — the q171 fuzzy matches closed
  // into canonical entities (Dedup.clusters min-label over the match
  // graph): every typo'd variant resolves to its cluster's minimum id.
  // The full ER pipeline shape: block -> verify -> cluster. Oracle:
  // q171's pair SQL + the recursive-CTE transitive closure (the q62
  // device — an independent fixpoint algorithm). --
  private val q172: Q = (s, dir) => {
    import s.implicits._
    graft.operators.Dedup.clusters(q171(s, dir), "p_partkey", "b_id")
      .select($"node", $"cluster")
  }
  private val q172Sql =
    s"""WITH RECURSIVE
       |pairs AS ($q171Sql),
       |edges AS (SELECT p_partkey AS src, b_id AS dst FROM pairs
       |          UNION SELECT b_id, p_partkey FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |members AS (
       |  SELECT src AS node, dst AS m FROM reach
       |  UNION ALL
       |  SELECT src, src FROM edges)
       |SELECT node, min(m) AS cluster FROM members GROUP BY node""".stripMargin

  // -- q173: session funnel — the conversion analysis the sessionizer
  // exists for: per (user, session), did the FIRST view precede the
  // first click, and that the first purchase (strict event-time order)?
  // One q12-shaped session pass + conditional-min aggregates; flags are
  // exact millisecond comparisons.
  // Oracle note: `session` MUST be CAST to BIGINT — DuckDB's sum(INT)
  // returns HUGEINT, whose pandas fetch renders float64 ("3.0" vs
  // Spark's "3"), hash-red under a pandas-canonicalizing checker while
  // fetchall-based checkers stay green (the r9/r10 driver-red
  // signature; q173 was the only oracle emitting an uncast HUGEINT —
  // tools/type_audit.py now sweeps all oracles for this class). --
  private val q173: Q = (s, dir) => {
    import s.implicits._
    val sess = graft.operators.Sessions.assign(
      t(s, dir, "events").select($"user_id", $"event_id", $"ts", $"event_type"),
      "user_id", "ts", "event_id", gapMs = 1800000L)
    sess.groupBy($"user_id", $"session")
      .agg(count(lit(1)).as("n_events"),
        min(when($"event_type" === "view", unix_millis($"ts"))).as("__tv"),
        min(when($"event_type" === "click", unix_millis($"ts"))).as("__tc"),
        min(when($"event_type" === "purchase", unix_millis($"ts"))).as("__tp"))
      .select($"user_id", $"session", $"n_events",
        $"__tv".isNotNull.as("saw_view"),
        ($"__tv".isNotNull && $"__tc".isNotNull && $"__tc" > $"__tv")
          .as("view_to_click"),
        ($"__tv".isNotNull && $"__tc".isNotNull && $"__tp".isNotNull &&
          $"__tc" > $"__tv" && $"__tp" > $"__tc").as("full_funnel"))
  }
  private val q173Sql =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
      |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session
      |  FROM g
      |), a AS (
      |  SELECT user_id, session, CAST(count(*) AS BIGINT) AS n_events,
      |    min(epoch_ms(ts)) FILTER (WHERE event_type = 'view') AS tv,
      |    min(epoch_ms(ts)) FILTER (WHERE event_type = 'click') AS tc,
      |    min(epoch_ms(ts)) FILTER (WHERE event_type = 'purchase') AS tp
      |  FROM s GROUP BY 1, 2)
      |SELECT user_id, session, n_events,
      |  tv IS NOT NULL AS saw_view,
      |  (tv IS NOT NULL AND tc IS NOT NULL AND tc > tv) AS view_to_click,
      |  (tv IS NOT NULL AND tc IS NOT NULL AND tp IS NOT NULL
      |   AND tc > tv AND tp > tc) AS full_funnel
      |FROM a""".stripMargin

  // -- q175: co-occurrence mining (market-basket pairs) — parts ordered
  // together: the in-order self-join (bounded by per-order line counts,
  // ~4 in TPC-H — never a corpus cross join), pair-keyed count, top 20
  // by (support desc, pair asc). The association-rule precursor and the
  // same pair-generation shape the LSH buckets use. --
  private val q175: Q = (s, dir) => {
    import s.implicits._
    val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_partkey")
    // kernel floor (Par.widen) on the PROBE side only: the pair
    // blow-up (≈ lines²/order rows out per row in) is CPU-dense and
    // otherwise runs on the scan's few row-group splits (measured: 3
    // tasks carrying the whole 1.1 s pair stage) while the build side
    // broadcasts; identical pair set under any partitioning.
    val pairs = graft.operators.Par.widen(li).toDF("o", "pa")
      .join(li.toDF("o", "pb"), Seq("o"))
      .filter($"pa" < $"pb")
    pairs.groupBy($"pa", $"pb")
      .agg(count(lit(1)).as("support"))
      .orderBy($"support".desc, $"pa", $"pb")
      .limit(20)
  }
  private val q175Sql =
    """SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS support
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2
      |ORDER BY support DESC, pa, pb LIMIT 20""".stripMargin

  // -- q51: banded range join — events within ±5 min of each signup --
  private val q51: Q = (s, dir) => {
    import s.implicits._
    val ev = t(s, dir, "events")
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id", $"ts".as("l_ts"))
    val all = ev.select($"ts".as("r_ts"))
    graft.operators.RangeJoin.bandPairs(signups, all, "l_ts", "r_ts", 300000000L)
      .groupBy($"event_id")
      .agg(count(lit(1)).as("n_nearby"))
  }
  private val q51Sql =
    """SELECT a.event_id, count(*) AS n_nearby
      |FROM (SELECT event_id, ts FROM events WHERE event_type = 'signup') a
      |JOIN events b
      |  ON b.ts BETWEEN a.ts - INTERVAL 5 MINUTE AND a.ts + INTERVAL 5 MINUTE
      |GROUP BY a.event_id""".stripMargin

  // -- q53: pivot — per-user event-type counts as columns --
  // Explicit value list so the pivot is a single pass (no distinct-values
  // pre-query) and the oracle can mirror it as conditional aggregation.
  private val q53: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }
  private val q53Sql =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY user_id""".stripMargin

  // -- q57: bucketed co-located fact join. The write-once layout that
  // deletes the recurring lineitem⋈orders shuffle: both fact tables land
  // hash-bucketed by orderkey (Bucketing.writeBucketed), and every later
  // join on that key is exchange-free (PlanSpec pins zero shuffles below
  // the join). This is the Spark answer to the reference's README
  // workflow, which re-shuffles the dumped facts inside DuckDB on every
  // query (reference README.md:99-103). The layout write runs once per
  // (session, sf) — exactly the amortization bucketing buys at 100 TB —
  // then the query itself is the plain join+agg the oracle mirrors.
  private val q57: Q = (s, dir) => {
    import s.implicits._
    // sf-specific table names: the warehouse outlives the JVM, and a
    // sf0.01 layout must never satisfy a sf0.1 run
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    val li = s"graft_bkt_lineitem_$sfx"
    val ord = s"graft_bkt_orders_$sfx"
    if (!s.catalog.tableExists(li))
      graft.sinks.Bucketing.writeBucketed(
        t(s, dir, "lineitem").select($"l_orderkey", $"l_extendedprice", $"l_discount"),
        li, Seq("l_orderkey"), buckets = 8)
    if (!s.catalog.tableExists(ord))
      graft.sinks.Bucketing.writeBucketed(
        t(s, dir, "orders").select($"o_orderkey", $"o_orderpriority"),
        ord, Seq("o_orderkey"), buckets = 8)
    // orders would broadcast at this SF, hiding the bucketed path the
    // query exists to exercise — force the merge join over buckets
    s.table(li).hint("merge")
      .join(s.table(ord), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
  }
  private val q57Sql =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  // -- q58: exact percentiles via distributed sort (Percentiles operator)
  // — same quantile_cont semantics as q36 but computed from a rank/
  // interpolate pass instead of the built-in's per-group value buffer,
  // which is the shape that survives groups too large to hold in memory
  // (the q36 scale cliff). Oracle: DuckDB quantile_cont, same as q36. --
  private val q58: Q = (s, dir) => {
    import s.implicits._
    graft.operators.Percentiles.quantileContMulti(
      t(s, dir, "lineitem"), Seq("l_linestatus"),
      Seq(
        "l_quantity" -> Seq("med_qty" -> 0.5, "p90_qty" -> 0.9),
        "l_extendedprice" -> Seq("p25_raw" -> 0.25)))
      .select($"l_linestatus", $"med_qty", $"p90_qty",
        round($"p25_raw", 2).as("p25_price"))
  }
  private val q58Sql =
    """SELECT l_linestatus,
      |  quantile_cont(l_quantity, 0.5) AS med_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.25), 2) AS p25_price
      |FROM lineitem GROUP BY l_linestatus""".stripMargin

  // -- q204: grouped exact quantiles via the RANK SCAN
  // (Percentiles.quantileContScanGrouped) — q58's semantics with q58's
  // documented skew note removed: no per-group single-task window, the
  // group ranks come from the grouped two-pass prefix scan, so a giant
  // group spreads across partitions. Same (n−1)·p interpolation,
  // bit-identical to the sort path (spec-pinned); oracle = the same
  // quantile_cont GROUP BY as q58. --
  private val q204: Q = (s, dir) =>
    graft.operators.Percentiles.quantileContScanGrouped(
      t(s, dir, "lineitem"), Seq("l_linestatus"), "l_quantity",
      Seq("med_qty" -> 0.5, "p90_qty" -> 0.9))
  private val q204Sql =
    """SELECT l_linestatus,
      |  quantile_cont(l_quantity, 0.5) AS med_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty
      |FROM lineitem GROUP BY l_linestatus""".stripMargin

  // -- q60: GROUPING SETS — the general form behind q08's rollup and
  // q18's cube, with grouping() flags so all-rows null groups are
  // distinguishable from null group values. SQL on both sides (the
  // DataFrame API has no grouping-sets surface pre-Spark-4.0 SQL parity;
  // the plan is the same single-pass Expand + partial agg either way). --
  private val q60: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    s.sql("""
      SELECT c_mktsegment, o_orderpriority,
        grouping(c_mktsegment) AS g_seg,
        grouping(o_orderpriority) AS g_pri,
        count(*) AS n,
        round(sum(o_totalprice), 2) AS rev
      FROM orders_v JOIN customer_v ON o_custkey = c_custkey
      GROUP BY GROUPING SETS ((c_mktsegment), (c_mktsegment, o_orderpriority), ())""")
  }
  private val q60Sql =
    """SELECT c_mktsegment, o_orderpriority,
      |  grouping(c_mktsegment) AS g_seg,
      |  grouping(o_orderpriority) AS g_pri,
      |  count(*) AS n,
      |  round(sum(o_totalprice), 2) AS rev
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY GROUPING SETS ((c_mktsegment), (c_mktsegment, o_orderpriority), ())""".stripMargin

  // -- q61: order→ship latency profile (TPC-H Q12 shape) — date
  // arithmetic + conditional aggregation. avg of an exact integer-day
  // sum is deterministic in IEEE double, so round(.,3) is oracle-safe. --
  private val q61: Q = (s, dir) => {
    import s.implicits._
    val lag = datediff($"l_shipdate".cast("date"), $"o_orderdate".cast("date"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        sum(when(lag > 60, 1L).otherwise(0L)).as("n_late"),
        count(lit(1)).as("n_total"),
        round(avg(lag), 3).as("avg_ship_days"))
  }
  private val q61Sql =
    """SELECT o_orderpriority,
      |  count(*) FILTER (date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60) AS n_late,
      |  count(*) AS n_total,
      |  round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 3) AS avg_ship_days
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  // -- q127: Z-order (Morton) key (sinks.Layout.zValue2) — the write-
  // side layout key that makes per-file min/max stats narrow on TWO
  // columns at once (LayoutSpec pins the skipping effect on real
  // files; this query pins the bit arithmetic itself). Pure integer
  // bit interleave — exact compare. --
  private val q127: Q = (s, dir) =>
    t(s, dir, "lineitem").select(col("l_orderkey"),
      col("l_linenumber").cast("long").as("l_linenumber"),
      graft.sinks.Layout.zValue2(col("l_partkey"), col("l_suppkey"), 16)
        .as("zval"))
  private val q127Sql = {
    def half(c: String, off: Int) = (0 until 16).map(i =>
      s"(((CAST($c AS BIGINT) >> $i) & 1) << ${2 * i + off})").mkString(" + ")
    s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       |  ${half("l_partkey", 0)} +
       |  ${half("l_suppkey", 1)} AS zval
       |FROM lineitem""".stripMargin
  }

  // -- q193: mergeable quantile sketch (graft_quantile_sketch — the
  // rank/quantile member of the sketch family beside q96 Count-Min, q84
  // Misra–Gries, q37 HLL): one-pass O(k log(n/k))-state rank estimation
  // where the exact q58 path is a full distributed sort. The sketch is
  // deterministic (MRL odd-index collapse, no RNG) but its contents
  // depend on merge order, so — the q84/q37 pattern — the query emits
  // exact-derived values plus GUARANTEE booleans that are provably true
  // under ANY merge order: |est_rank − exact_rank| ≤ the sketch's own
  // accumulated error budget (each collapse perturbs ranks by at most
  // its source weight), and that budget ≤ the deterministic
  // (n/k)·(⌈log₂(n/k)⌉+2) cap. Probes are lo + (hi−lo)·p — identical
  // IEEE doubles in both engines. Oracle: exact ranks + literal true. --
  private val q193: Q = (s, dir) => {
    import s.implicits._
    graft.functions.GraftFunctions.ensureRegistered(s)
    import graft.functions.QuantileSketch
    val li = t(s, dir, "lineitem")
      .select($"l_extendedprice".cast("double").as("v"))
    val one = li.agg(
      QuantileSketch.sketch($"v", 256).as("sk"),
      count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
    val probes = one.select($"sk", $"n", $"lo", $"hi",
      explode(typedlit(Seq(0.1, 0.25, 0.5, 0.75, 0.9))).as("p"))
      .withColumn("px", $"lo" + ($"hi" - $"lo") * $"p")
    val exact = li.crossJoin(broadcast(probes.select($"p", $"px")))
      .groupBy($"p", $"px")
      .agg(sum(when($"v" <= $"px", 1L).otherwise(0L)).as("exact_rank"))
    val nk = $"n".cast("double") / lit(256.0)
    exact.join(broadcast(probes.select($"p", $"sk", $"n")), Seq("p"))
      .select($"p", $"exact_rank",
        (abs(QuantileSketch.estRank($"sk", $"px") - $"exact_rank") <=
          $"sk".getField("err")).as("within_err"),
        ($"sk".getField("err").cast("double") <=
          nk * (ceil(log2(greatest(lit(2.0), nk))) + lit(2.0)))
          .as("err_capped"))
  }
  private val q193Sql =
    """WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |             min(CAST(l_extendedprice AS DOUBLE)) AS lo,
      |             max(CAST(l_extendedprice AS DOUBLE)) AS hi
      |           FROM lineitem),
      |p AS (SELECT p, lo + (hi - lo) * p AS px
      |      FROM s, (SELECT unnest(CAST([0.1, 0.25, 0.5, 0.75, 0.9]
      |                              AS DOUBLE[])) AS p)),
      |r AS (SELECT p.p,
      |        CAST(sum(CASE WHEN CAST(l.l_extendedprice AS DOUBLE) <= p.px
      |                      THEN 1 ELSE 0 END) AS BIGINT) AS exact_rank
      |      FROM p, lineitem l GROUP BY p.p)
      |SELECT p, exact_rank, true AS within_err, true AS err_capped FROM r""".stripMargin

  // -- q232: small-file COMPACTION (sinks.Layout.compact) — the
  // lakehouse OPTIMIZE half: a 32-way fragmented write (the streaming-
  // ingest pathology — at 100 TB, 10^6 micro-batch files turn every
  // scan into an open storm) bin-packed back to ⌈bytes/target⌉ files
  // by a shuffle-free coalesce + temp-dir/rename swap. The aggregate
  // reads THROUGH the compacted layout, so a hash match proves the
  // rewrite lost and duplicated nothing; `n_files` pins that the
  // rewrite actually landed at the single-bin count. Exact-int cells
  // only. LayoutSpec pins the swap mechanics (no temp left behind,
  // hive leaves, idempotence). --
  private val q232: Q = (s, dir) => {
    import s.implicits._
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    val out = s"/tmp/graft_compact_$sfx"
    t(s, dir, "documents").repartition(32, $"doc_id")
      .write.mode("overwrite").parquet(out)
    val stats = graft.sinks.Layout.compact(s, out, 256L * 1024 * 1024)
    val nAfter = stats.map(_.filesAfter).sum
    s.read.parquet(out).groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        countDistinct($"doc_id").as("n_ids"))
      .withColumn("n_files", lit(nAfter))
  }
  private val q232Sql =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
      |  CAST(1 AS BIGINT) AS n_files
      |FROM documents GROUP BY lang""".stripMargin

  // -- q233: manifest-driven FILE SKIPPING (statsManifest/prunedRead) —
  // the Iceberg/Delta metadata-pruning shape without the table format:
  // events z-ordered on (event_id, user_id) [q127's layout, written
  // for real], per-file min/max read from parquet FOOTERS ONLY
  // (distributed, zero data pages), and a user_id range scan that
  // skips every file whose footer provably excludes it — user_id is
  // the SECOND z dimension, precisely the column a plain event_id sort
  // leaves unskippable. The predicate re-applies on the scan, so the
  // oracle (which sees only the raw table) pins that pruning is a
  // strict superset — a wrongly-dropped file would break the hash.
  // Exact-int cells only. --
  private val q233: Q = (s, dir) => {
    import s.implicits._
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    val out = s"/tmp/graft_zlayout_$sfx"
    val ev = t(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type")
    graft.sinks.Layout.zorderWrite(ev, "event_id", "user_id", out, 16)
    val mf = graft.sinks.Layout.statsManifest(s, out, Seq("user_id"))
    val umax = ev.agg(max($"user_id")).as[Long].head()
    val (lo, hi) = (umax / 4, umax * 7 / 20)
    graft.sinks.Layout.prunedRead(s, out, mf, "user_id", lo.toDouble, hi.toDouble)
      .where($"user_id".between(lo, hi))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        min($"event_id").as("min_ev"), max($"event_id").as("max_ev"))
  }
  private val q233Sql =
    """WITH b AS (SELECT max(user_id) // 4 AS lo, max(user_id) * 7 // 20 AS hi
      |           FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  min(event_id) AS min_ev, max(event_id) AS max_ev
      |FROM events, b WHERE user_id BETWEEN b.lo AND b.hi
      |GROUP BY event_type""".stripMargin

  // -- q238: the FULL lakehouse read path (Snapshots + Layout composed)
  // — commit fragmented events to the snapshot log, OPTIMIZE ZORDER BY
  // (event_id, user_id) as a committed rewrite, then scan a user_id
  // range through the snapshot-pinned footer manifest: log → manifest
  // → file-skip → scan, the Iceberg/Delta read anatomy end to end.
  // The oracle sees only the raw table, so the hash pins every link:
  // a lost/duplicated row in the rewrite, a wrongly-pruned file, or a
  // manifest bound off by one breaks it. Exact-int cells. --
  private val q238: Q = (s, dir) => {
    import s.implicits._
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    val out = s"/tmp/graft_lake_$sfx"
    val root = new org.apache.hadoop.fs.Path(out)
    root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
    val ev = t(s, dir, "events").select($"event_id", $"user_id", $"event_type")
    graft.sinks.Snapshots.writeAppend(ev.repartition(16), out)
    graft.sinks.Snapshots.optimizeZorder(s, out, "event_id", "user_id",
      targetBytes = 32L * 1024)
    val umax = ev.agg(max($"user_id")).as[Long].head()
    val (lo, hi) = (umax / 2, umax * 3 / 5)
    graft.sinks.Snapshots.prunedRead(s, out, "user_id", lo.toDouble, hi.toDouble)
      .where($"user_id".between(lo, hi))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        sum($"event_id").as("sum_ev"))
  }
  private val q238Sql =
    """WITH b AS (SELECT max(user_id) // 2 AS lo, max(user_id) * 3 // 5 AS hi
      |           FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(event_id) AS BIGINT) AS sum_ev
      |FROM events, b WHERE user_id BETWEEN b.lo AND b.hi
      |GROUP BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q232_compaction" -> q232,
    "q233_manifest_skipping" -> q233,
    "q238_lakehouse_scan" -> q238,
    "q193_quantile_sketch" -> q193,
    "q01_filter_project" -> q01,
    "q02_sort_topn" -> q02,
    "q03_agg_pricing" -> q03,
    "q04_revenue_nation" -> q04,
    "q05_topk_per_segment" -> q05,
    "q06_distinct" -> q06,
    "q07_orders_by_month" -> q07,
    "q08_rollup_region_nation" -> q08,
    "q09_except_no_orders" -> q09,
    "q10_intersect_nations" -> q10,
    "q11_json_props_agg" -> q11,
    "q12_sessionize" -> q12,
    "q13_hourly_buckets" -> q13,
    "q14_union_append" -> q14,
    "q15_anti_unordered_parts" -> q15,
    "q16_semi_active_customers" -> q16,
    "q17_leftjoin_order_counts" -> q17,
    "q18_cube_priority_status" -> q18,
    "q19_running_revenue" -> q19,
    "q34_salted_hotkey_agg" -> q34,
    "q35_corr_subquery" -> q35,
    "q36_percentiles" -> q36,
    "q37_approx_sketches" -> q37,
    "q38_full_outer" -> q38,
    "q39_rank_family" -> q39,
    "q50_asof_join" -> q50,
    "q51_range_join" -> q51,
    "q159_resample_ffill" -> q159,
    "q160_rolling_window" -> q160,
    "q168_winsorize" -> q168,
    "q169_mad_outliers" -> q169,
    "q170_impute_median" -> q170,
    "q171_fuzzy_join" -> q171,
    "q172_entity_clusters" -> q172,
    "q173_session_funnel" -> q173,
    "q175_basket_pairs" -> q175,
    "q53_pivot" -> q53,
    "q57_bucketed_join" -> q57,
    "q204_scan_percentiles" -> q204,
    "q58_sort_percentiles" -> q58,
    "q60_grouping_sets" -> q60,
    "q61_late_shipments" -> q61,
    "q127_zorder_key" -> q127,
  )

  val oracle: Map[String, String] = Map(
    "q232_compaction" -> q232Sql,
    "q233_manifest_skipping" -> q233Sql,
    "q238_lakehouse_scan" -> q238Sql,
    "q193_quantile_sketch" -> q193Sql,
    "q01_filter_project" -> q01Sql,
    "q02_sort_topn" -> q02Sql,
    "q03_agg_pricing" -> q03Sql,
    "q04_revenue_nation" -> q04Sql,
    "q05_topk_per_segment" -> q05Sql,
    "q06_distinct" -> q06Sql,
    "q07_orders_by_month" -> q07Sql,
    "q08_rollup_region_nation" -> q08Sql,
    "q09_except_no_orders" -> q09Sql,
    "q10_intersect_nations" -> q10Sql,
    "q11_json_props_agg" -> q11Sql,
    "q12_sessionize" -> q12Sql,
    "q13_hourly_buckets" -> q13Sql,
    "q14_union_append" -> q14Sql,
    "q15_anti_unordered_parts" -> q15Sql,
    "q16_semi_active_customers" -> q16Sql,
    "q17_leftjoin_order_counts" -> q17Sql,
    "q18_cube_priority_status" -> q18Sql,
    "q19_running_revenue" -> q19Sql,
    "q34_salted_hotkey_agg" -> q34Sql,
    "q35_corr_subquery" -> q35Sql,
    "q36_percentiles" -> q36Sql,
    "q37_approx_sketches" -> q37Sql,
    "q38_full_outer" -> q38Sql,
    "q39_rank_family" -> q39Sql,
    "q50_asof_join" -> q50Sql,
    "q51_range_join" -> q51Sql,
    "q159_resample_ffill" -> q159Sql,
    "q160_rolling_window" -> q160Sql,
    "q168_winsorize" -> q168Sql,
    "q169_mad_outliers" -> q169Sql,
    "q170_impute_median" -> q170Sql,
    "q171_fuzzy_join" -> q171Sql,
    "q172_entity_clusters" -> q172Sql,
    "q173_session_funnel" -> q173Sql,
    "q175_basket_pairs" -> q175Sql,
    "q53_pivot" -> q53Sql,
    "q57_bucketed_join" -> q57Sql,
    "q204_scan_percentiles" -> q204Sql,
    "q58_sort_percentiles" -> q58Sql,
    "q60_grouping_sets" -> q60Sql,
    "q61_late_shipments" -> q61Sql,
    "q127_zorder_key" -> q127Sql,
  )
}
