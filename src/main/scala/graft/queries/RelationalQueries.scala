package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The north-star relational surface (SURVEY.md §7.5): joins, aggregations,
  * windows, grouping sets over the TPC-H-ish warehouse tables. These are
  * the queries a user of the ingested warehouse runs; each is shaped so
  * Catalyst broadcast-joins the small dimensions and keeps the one big
  * fact-table scan as the only heavy input.
  *
  * Money math: integer cents (see [[QueryDef]] scaladoc) — `revenue_c`
  * columns are exact cents, order-free under parallel aggregation, and safe
  * at any scale (BIGINT cents overflow at ~9e16 dollars).
  */
object RelationalQueries {
  import Q._

  /** revenue per row in cents: round(ep * (1-disc) * 100). */
  private def revCents = round(
    col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")

  private val RevSql = "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape: full-scan aggregate with computed measures.
    QueryDef("q1_pricing_summary",
      (s, d) => table(s, d, "lineitem")
        .filter(expr("l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(revCents).as("sum_disc_price_c"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")) * 100).cast("long")).as("sum_charge_c"),
          (sum(col("l_quantity").cast("long")).cast("double")
            / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order")),
      Some(s"""SELECT l_returnflag, l_linestatus,
        |CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |CAST(sum($RevSql) AS BIGINT) AS sum_disc_price_c,
        |CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
        |CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // TPC-H Q3 shape: 3-way join, aggregate, deterministic top-10.
    QueryDef("q3_top_orders",
      (s, d) => {
        val c = table(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val o = table(s, d, "orders")
          .filter(expr("o_orderdate < TIMESTAMP_NTZ '1998-06-01 00:00:00'"))
        val l = table(s, d, "lineitem")
          .filter(expr("l_shipdate > TIMESTAMP_NTZ '1998-06-01 00:00:00'"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            col("o_orderdate").cast("date").as("order_date"),
            col("o_orderpriority"))
          .agg(sum(revCents).as("revenue_c"))
          .orderBy(col("revenue_c").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |o_orderpriority, CAST(sum($RevSql) AS BIGINT) AS revenue_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5 shape: 6-way snowflake join down to per-nation revenue.
    QueryDef("q5_region_revenue",
      (s, d) => {
        val r = table(s, d, "region").filter(col("r_name") === "ASIA")
        val n = table(s, d, "nation")
        val su = table(s, d, "supplier")
        val c = table(s, d, "customer")
        val o = table(s, d, "orders").filter(
          expr("o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          expr("o_orderdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        val l = table(s, d, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(revCents).as("revenue_c"))
      },
      Some(s"""SELECT n_name, CAST(sum($RevSql) AS BIGINT) AS revenue_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin)),

    // Window: per-customer running order total (exact cents).
    QueryDef("q_window_running_total",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          sum(cents(col("o_totalprice"))).over(w).as("running_c"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        |CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
        |FROM orders""".stripMargin)),

    // Window: top-3 orders per priority class.
    QueryDef("q_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        table(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            cents(col("o_totalprice")).as("totalprice_c"),
            row_number().over(w).cast("long").as("rn"))
          .filter(col("rn") <= 3)
      },
      Some("""SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
        |    CAST(row_number() OVER (
        |      PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin)),

    // Distinct aggregate per group.
    QueryDef("q_distinct_agg",
      (s, d) => table(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("min_key")),
      Some("""SELECT o_orderstatus,
        |CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |CAST(count(*) AS BIGINT) AS n_orders,
        |min(o_orderkey) AS min_key
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // Sessionization: 30-minute-gap sessions per user over the event
    // stream — lag + conditional cumulative sum, all integer arithmetic on
    // epoch micros so both engines agree exactly.
    QueryDef("q_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_id"))
        val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, d, "events")
          .select(col("event_id"), col("user_id"), tsMicros.as("ts_us"))
          .withColumn("new_session",
            when(col("ts_us") - lag(col("ts_us"), 1).over(byUser)
              > 1800000000L, 1).otherwise(
              when(lag(col("ts_us"), 1).over(byUser).isNull, 1).otherwise(0)))
          .select(col("event_id"), col("user_id"),
            sum(col("new_session")).over(runSum).as("session_seq"))
      },
      Some("""WITH e AS (SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |g AS (SELECT event_id, user_id, ts_us,
        |  CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL THEN 1
        |       WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        |  FROM e)
        |SELECT event_id, user_id,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |FROM g""".stripMargin)),

    // Native session windows: Spark's session_window() operator — the
    // STREAMING-capable session primitive (q_sessionize's window-function
    // form cannot run incrementally; this one drops into readStream +
    // watermark unchanged). Semantics quirk the oracle must mirror: Spark
    // merges sessions whose [ts, ts+gap) intervals OVERLAP, so a gap of
    // exactly 30 min starts a NEW session (>= in the oracle, where
    // q_sessionize's lag-form uses >). Session end = last event + gap.
    QueryDef("st_session_window",
      (s, d) => table(s, d, "events")
        .select(col("user_id"), tsCol.as("ts"))
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start"),
          unix_micros(col("w.end")).as("session_end"),
          col("n_events")),
      Some("""WITH e AS (SELECT user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |g AS (SELECT user_id, ts_us,
        |  CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
        |         OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) >= 1800000000
        |       THEN 1 ELSE 0 END AS ns FROM e),
        |s AS (SELECT user_id, ts_us,
        |  sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, min(ts_us) AS session_start,
        |  max(ts_us) + 1800000000 AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin)),

    // TPC-H Q7 shape: bilateral volume between two customer/supplier
    // nations, by year — join-heavy with a symmetric OR-pair predicate.
    QueryDef("q7_nation_volume",
      (s, d) => {
        val n1 = table(s, d, "nation")
          .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
        val n2 = table(s, d, "nation")
          .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
        table(s, d, "lineitem")
          .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(revCents).as("revenue_c"))
      },
      Some(s"""SELECT supp_nation, cust_nation, l_year,
        |CAST(sum($RevSql) AS BIGINT) AS revenue_c
        |FROM (SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    l_extendedprice, l_discount
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        |     OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')) AS sq
        |GROUP BY 1, 2, 3""".stripMargin)),

    // TPC-H Q18 shape: large orders via HAVING, expressed through the SQL
    // front end (GraftTables views) — the user-facing spark.sql path.
    QueryDef("q18_large_orders",
      (s, d) => {
        GraftTables.registerViews(s, d)
        // Pre-aggregate lineitem by l_orderkey (with the HAVING pushed
        // into the aggregate) BEFORE touching orders/customer: the big
        // shuffle then moves one row per QUALIFYING order instead of the
        // full join fan-out — at 100 TB the join input shrinks by the
        // lineitem-per-order multiplicity times the >180 selectivity.
        // Equivalent because o_orderkey is unique in orders (one customer
        // per order), so grouping by l_orderkey == (c_name, o_orderkey).
        s.sql("""WITH lq AS (
          |  SELECT l_orderkey,
          |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
          |  FROM lineitem
          |  GROUP BY l_orderkey
          |  HAVING sum(CAST(l_quantity AS BIGINT)) > 180)
          |SELECT c_name, o_orderkey, total_qty
          |FROM lq
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey""".stripMargin)
      },
      Some("""SELECT c_name, o_orderkey,
        |CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name, o_orderkey
        |HAVING sum(CAST(l_quantity AS BIGINT)) > 180""".stripMargin)),

    // Scalar subquery: orders above the mean price. The comparison is done
    // in exact integer cross-multiplication (cents × count > total cents) —
    // a floating-point average would be accumulation-order-dependent and
    // could flip boundary rows between engines.
    QueryDef("q_above_avg_orders",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql("""SELECT o_orderkey,
          |  CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c
          |FROM orders
          |WHERE CAST(round(o_totalprice * 100) AS BIGINT)
          |      * (SELECT CAST(count(*) AS BIGINT) FROM orders)
          |    > (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |       FROM orders)""".stripMargin)
      },
      Some("""SELECT o_orderkey,
        |CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c
        |FROM orders
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT)
        |      * (SELECT CAST(count(*) AS BIGINT) FROM orders)
        |    > (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |       FROM orders)""".stripMargin)),

    // TPC-H Q14 shape: promo revenue share — conditional aggregation over
    // a fact-dimension join; the share is one division of two exact cents
    // sums, so it's deterministic cross-engine.
    QueryDef("q14_promo_share",
      (s, d) => {
        val l = table(s, d, "lineitem").filter(
          expr("l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
          expr("l_shipdate < TIMESTAMP_NTZ '1997-04-01 00:00:00'"))
        l.join(broadcast(table(s, d, "part")),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", revCents).otherwise(0L))
              .as("promo_c"),
            sum(revCents).as("total_c"))
          .withColumn("promo_share",
            col("promo_c").cast("double") * 100.0 / col("total_c"))
      },
      Some(s"""SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN $RevSql ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS promo_c,
        |CAST(sum($RevSql) AS BIGINT) AS total_c,
        |CAST(sum(CASE WHEN p_type = 'PROMO' THEN $RevSql ELSE CAST(0 AS BIGINT) END) AS DOUBLE) * 100.0
        |  / CAST(sum($RevSql) AS BIGINT) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin)),

    // TPC-H Q4 shape: EXISTS correlated subquery → left-semi join with a
    // non-key condition, then aggregate.
    QueryDef("q4_priority_exists",
      (s, d) => {
        val o = table(s, d, "orders")
        val l = table(s, d, "lineitem").select("l_orderkey", "l_shipdate")
        o.join(l, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin)),

    // As-of semantics via windows: each event joined to the user's most
    // recent PRIOR purchase (the composition-tier as-of join — no custom
    // operator needed when the frame is per-key ordered history).
    QueryDef("q_asof_prior_purchase",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        table(s, d, "events")
          .select(col("event_id"), col("user_id"), tsMicros.as("ts_us"),
            col("event_type"), cents(col("value")).as("value_c"))
          .withColumn("prior_purchase_c",
            last(when(col("event_type") === "purchase", col("value_c")),
              ignoreNulls = true).over(w))
          .select("event_id", "user_id", "prior_purchase_c")
      },
      Some("""SELECT event_id, user_id,
        |last_value(CASE WHEN event_type = 'purchase'
        |    THEN CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
        |  OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_purchase_c
        |FROM events""".stripMargin)),

    // Pivot: per-user event-type count matrix (missing combos are 0, not
    // null, so both engines' shapes agree).
    QueryDef("q_pivot_counts",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = table(s, d, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
        p.select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      },
      Some("""SELECT user_id,
        |CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY user_id""".stripMargin)),

    // Set operations: EXCEPT and INTERSECT (distinct semantics) composed.
    QueryDef("q_setops_users",
      (s, d) => {
        def users(t: String) = table(s, d, "events")
          .filter(col("event_type") === t).select("user_id").distinct()
        users("click").except(users("purchase"))
          .withColumn("tag", lit("click_no_purchase"))
          .union(users("signup").intersect(users("error"))
            .withColumn("tag", lit("signup_and_error")))
      },
      Some("""SELECT user_id, 'click_no_purchase' AS tag FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT user_id, 'signup_and_error' AS tag FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error')""".stripMargin)),

    // Per-group top-k through the CUSTOM physical operator
    // (graft.plans.GroupTopK: logical node + Strategy + bounded-heap exec —
    // O(n log k) and no sort, vs the window row_number's full sort). The
    // score folds event_id in as a tiebreaker so the result is total-ordered
    // and the DuckDB row_number oracle agrees exactly.
    QueryDef("q_group_topk_native",
      (s, d) => {
        val base = table(s, d, "events").select(
          col("event_id"), col("event_type"),
          (cents(col("value")) * 100000L + col("event_id")).as("score"))
        graft.plans.GroupTopK(base, Seq("event_type"), "score", k = 3)
      },
      Some("""SELECT event_id, event_type, score FROM (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) * 100000 + event_id AS score,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(round(value * 100) AS BIGINT) * 100000 + event_id DESC) AS rn
        |  FROM events) AS t WHERE rn <= 3""".stripMargin)),

    // Sketch aggregate: HyperLogLog++ distinct counting — the sketch a
    // 100 TB pipeline uses where exact distinct would shuffle every key.
    // No SQL oracle (sketch estimates are engine-specific); the error
    // bound vs the exact count is asserted in PropertiesSpec.
    QueryDef("q_approx_distinct",
      (s, d) => table(s, d, "events")
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users")),
      None),

    // Grouping sets: ROLLUP over status × priority.
    QueryDef("q_rollup_counts",
      (s, d) => table(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_c")),
      Some("""SELECT o_orderstatus, o_orderpriority,
        |CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin)),

    // CUBE — all grouping-set combinations (the rollup above covers only
    // the hierarchy prefixes). Spark expands the cube in a single Expand +
    // one aggregation pass; the measure goes through integer cents like
    // every aggregate in the contract.
    QueryDef("q_cube_counts",
      (s, d) => table(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_c")),
      Some("""SELECT o_orderstatus, o_orderpriority,
        |CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // Window-function breadth: lag/lead (per-user event timeline), ntile
    // quartiles, percent_rank and cume_dist (value position within the
    // event type). Every ordering carries event_id as the final key so
    // ranks are total-ordered and both engines compute identical
    // rationals. One shuffle per distinct partitioning, nothing else.
    QueryDef("q_window_funcs",
      (s, d) => {
        val ev = table(s, d, "events").select(col("event_id"),
          col("user_id"), tsMicros.as("ts_us"),
          cents(col("value")).as("value_c"), col("event_type"))
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_id"))
        val byType = Window.partitionBy("event_type")
          .orderBy(col("value_c"), col("event_id"))
        ev.select(col("event_id"),
          lag("value_c", 1).over(byUser).as("prev_value_c"),
          lead("value_c", 1).over(byUser).as("next_value_c"),
          ntile(4).over(byUser).cast("long").as("quartile"),
          percent_rank().over(byType).as("pct_rank"),
          cume_dist().over(byType).as("cume"))
      },
      Some("""SELECT event_id,
        |  lag(CAST(round(value * 100) AS BIGINT), 1) OVER u AS prev_value_c,
        |  lead(CAST(round(value * 100) AS BIGINT), 1) OVER u AS next_value_c,
        |  CAST(ntile(4) OVER u AS BIGINT) AS quartile,
        |  percent_rank() OVER t AS pct_rank,
        |  cume_dist() OVER t AS cume
        |FROM events
        |WINDOW
        |  u AS (PARTITION BY user_id
        |        ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id),
        |  t AS (PARTITION BY event_type
        |        ORDER BY CAST(round(value * 100) AS BIGINT), event_id)""".stripMargin)),

    // Explicit GROUPING SETS (beyond the rollup/cube shorthands): an
    // arbitrary list of grouping combinations in ONE pass over the data —
    // Spark plans a single Expand + aggregate, not one scan per set.
    // grouping_id disambiguates "NULL because aggregated away" from
    // "NULL in the data" (both engines number bits identically for the
    // same column order).
    QueryDef("q_grouping_sets",
      (s, d) => {
        val t = table(s, d, "orders")
        t.createOrReplaceTempView("orders_gs")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
          |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
          |  (o_orderstatus), (o_orderpriority))""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority))""".stripMargin)),

    // TPC-H Q6 shape: pure scan-filter-aggregate — the query that measures
    // whether predicate pushdown and whole-stage codegen are working (no
    // join, no shuffle beyond the final partial-agg merge).
    QueryDef("q6_forecast_revenue",
      (s, d) => table(s, d, "lineitem")
        .filter(expr("l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          expr("l_shipdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(round(col("l_extendedprice") * col("l_discount") * 100)
            .cast("long")).as("revenue_c"),
          count(lit(1)).as("n_lines")),
      Some("""SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // TPC-H Q10 shape: returned-item revenue per customer over one
    // quarter — 3 fact-dimension joins (nation broadcast), aggregate,
    // deterministic top-20. The shuffle is keyed by the group
    // (customer), never by the unaggregated join output.
    QueryDef("q10_returned_revenue",
      (s, d) => {
        val o = table(s, d, "orders").filter(
          expr("o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          expr("o_orderdate < TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
        val l = table(s, d, "lineitem").filter(col("l_returnflag") === "R")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(table(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
            cents(col("c_acctbal")).as("acctbal_c"))
          .agg(sum(revCents).as("revenue_c"))
          .orderBy(col("revenue_c").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name,
        |CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
        |CAST(sum($RevSql) AS BIGINT) AS revenue_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q13 shape: order-count distribution — LEFT OUTER join with an
    // extra join-side predicate (which must stay in the join condition,
    // not become a WHERE that silently turns the join inner), then a
    // two-level aggregation (per-customer count → histogram of counts).
    QueryDef("q13_order_distribution",
      (s, d) => {
        val o = table(s, d, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
        table(s, d, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |GROUP BY c_count""".stripMargin)),

    // TPC-H Q16 shape: supplier-diversity count — join facts to two
    // dimensions, EXCLUDE a supplier subset via anti-join (Q16's
    // complaint filter, here negative-balance suppliers), then
    // count(DISTINCT supplier) per (brand, type). Distinct-agg after a
    // join: Spark expands to a two-phase aggregate (distinct keys
    // shuffle once, then per-group counts), never a row-level distinct
    // over the join output.
    QueryDef("q16_supplier_diversity",
      (s, d) => {
        val excluded = table(s, d, "supplier")
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        table(s, d, "lineitem")
          .join(broadcast(table(s, d, "part")
              .filter(col("p_size") >= 20)
              .select(col("p_partkey"), col("p_brand"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(excluded),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size >= 20
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2""".stripMargin)),

    // TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti-join.
    // High-balance customers (above the positive-balance average) with no
    // order since 2000, grouped by nation. The threshold is computed over
    // exact integer cents (a double average of raw doubles would be
    // accumulation-order-dependent and could never hash-match); the
    // anti-join side is only the date-filtered orders slice.
    QueryDef("q22_idle_customers",
      (s, d) => {
        val cust = table(s, d, "customer").select(col("c_custkey"),
          col("c_nationkey"), cents(col("c_acctbal")).as("bal_c"))
        val pos = cust.filter(col("bal_c") > 0)
        val thr = pos.agg((sum(col("bal_c")).cast("double") /
          count(lit(1))).as("thr"))
        val recent = table(s, d, "orders")
          .filter(expr("o_orderdate >= TIMESTAMP_NTZ '2000-01-01 00:00:00'"))
          .select(col("o_custkey"))
        pos.join(broadcast(thr)).filter(col("bal_c") > col("thr"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_cust"), sum(col("bal_c")).as("total_bal_c"))
      },
      Some("""WITH pos AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0),
        |thr AS (SELECT CAST(sum(bal_c) AS DOUBLE) / count(*) AS thr FROM pos)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(bal_c) AS BIGINT) AS total_bal_c
        |FROM pos, thr
        |WHERE bal_c > thr AND NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = pos.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey""".stripMargin)),

    // Ordered-sequence funnel: users reaching view -> click -> purchase
    // IN ORDER (each stage's first event at or after the previous
    // stage's). Every stage is a per-user min aggregate followed by a
    // user-keyed equi-join — the same hash shuffle reused three times,
    // never a window over a user's whole history; the three stage counts
    // meet in a broadcast of three 1-row aggregates.
    QueryDef("q_funnel",
      (s, d) => {
        val ev = table(s, d, "events")
          .select(col("user_id"), col("event_type"), tsMicros.as("us"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("us").as("t1"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("us") >= col("t1"))
          .groupBy("user_id").agg(min("us").as("t2"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("us") >= col("t2"))
          .groupBy("user_id").agg(min("us").as("t3"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(broadcast(c.agg(count(lit(1)).as("n_view_click"))))
          .crossJoin(broadcast(p.agg(count(lit(1)).as("n_full_funnel"))))
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT ev.user_id, min(us) AS t2 FROM ev JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us >= t1 GROUP BY 1),
        |p AS (SELECT ev.user_id, min(us) AS t3 FROM ev JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us >= t2 GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_view_click,
        |  (SELECT count(*) FROM p) AS n_full_funnel""".stripMargin)),

    // Cohort retention: users grouped by first-seen day, counted per
    // day-offset of later activity — the (cohort x offset) retention
    // matrix. Day indices are pure integer epoch-day arithmetic
    // (us DIV 86400e6), so no date-function semantics cross the oracle
    // boundary. Two shuffles total: per-user min, then the
    // (cohort, offset, user) distinct rollup.
    QueryDef("q_cohort_retention",
      (s, d) => {
        val ev = table(s, d, "events")
          .select(col("user_id"), tsMicros.as("us"))
          .select(col("user_id"), expr("us DIV 86400000000").as("day"))
        val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
        ev.join(first, "user_id")
          .select(col("cohort_day"), (col("day") - col("cohort_day"))
            .as("offset_days"), col("user_id"))
          .distinct()
          .groupBy("cohort_day", "offset_days")
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH ev AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT cohort_day, day - cohort_day AS offset_days,
        |  CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
        |FROM ev JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin)),

    // Event-type TRANSITION MATRIX — the first-order Markov model of
    // user behavior (the sequence model behind next-action prediction
    // and funnel design): consecutive same-user event pairs under the
    // deterministic (time, event_id) order, rolled up to per-(prev,
    // next) counts and row-normalized transition probabilities in
    // integer ppm. The lag window is user-partitioned (parallel,
    // bounded by one user's history — never corpus-wide); the |types|²-
    // sized count table then broadcasts against its row totals. Output
    // is at most |types|² rows regardless of corpus size.
    QueryDef("q_event_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val pairs = table(s, d, "events")
          .select(col("user_id"), tsMicros.as("us"), col("event_id"),
            col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
        val counts = pairs
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n_obs"))
        val totals = counts.groupBy("prev_type")
          .agg(sum("n_obs").as("n_from"))
        counts.join(broadcast(totals), "prev_type")
          .select(col("prev_type"), col("next_type"), col("n_obs"),
            expr("n_obs * 1000000 DIV n_from").as("p_ppm"))
      },
      Some("""WITH ev AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id, event_type
        |  FROM events),
        |pr AS (SELECT event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS prev_type
        |  FROM ev),
        |c AS (SELECT prev_type, next_type,
        |    CAST(count(*) AS BIGINT) AS n_obs
        |  FROM pr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n_obs) AS BIGINT) AS n_from
        |  FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, n_obs,
        |  n_obs * 1000000 // n_from AS p_ppm
        |FROM c JOIN t USING (prev_type)""".stripMargin)),

    // Point-in-time dimension join (graft.operators.AsOfJoin): every
    // purchase picks up the user's profile value from their LATEST signup
    // at or before the purchase — the feature-store / SCD primitive where
    // reading a version from the future is silent training leakage. The
    // union-tag implementation shuffles ONCE on user_id and carries the
    // attribute forward with a window last(ignoreNulls); the oracle is
    // the declarative correlated-subquery form DuckDB can afford.
    QueryDef("q_asof_dim",
      (s, d) => {
        val ev = table(s, d, "events")
        graft.operators.AsOfJoin.pointInTime(
          facts = ev.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), tsMicros.as("us")),
          dims = ev.filter(col("event_type") === "signup")
            .select(col("user_id"), tsMicros.as("us"),
              cents(col("value")).as("profile_c")),
          key = "user_id", factId = "event_id", factTime = "us",
          dimTime = "us", attr = "profile_c", outName = "profile_asof_c")
      },
      Some("""WITH f AS (SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE event_type = 'purchase'),
        |d AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS profile_c
        |  FROM events WHERE event_type = 'signup')
        |SELECT f.event_id, f.user_id, f.us,
        |  (SELECT profile_c FROM d
        |   WHERE d.user_id = f.user_id AND d.us <= f.us
        |   ORDER BY d.us DESC, profile_c DESC LIMIT 1) AS profile_asof_c
        |FROM f""".stripMargin)),

    // SCD Type-2 dimension build — the WRITE side of the point-in-time
    // story above (q_asof_dim is the read side): collapse each user's
    // event stream into [valid_from, valid_to) validity intervals, one
    // row per attribute CHANGE (gaps-and-islands via lag), open interval
    // (null valid_to_us) for the current version. One hash shuffle on
    // user_id serves both windows — same partitioning, same (us,
    // event_id) sort order, so Catalyst plans a single Sort+Exchange and
    // the change-filter and interval/version windows pipeline over it. At
    // 100 TB a user's history is bounded (thousands of events), so
    // per-user windows never straddle memory.
    QueryDef("q_scd2_dim",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        table(s, d, "events")
          .select(col("user_id"), tsMicros.as("us"), col("event_id"),
            col("event_type"))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
          .select(col("user_id"), col("event_type"),
            col("us").as("valid_from_us"),
            lead("us", 1).over(w).as("valid_to_us"),
            row_number().over(w).cast("long").as("version"))
      },
      Some("""WITH e AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id, event_type
        |  FROM events),
        |ch AS (SELECT *, lag(event_type) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |  FROM e)
        |SELECT user_id, event_type, us AS valid_from_us,
        |  lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    AS valid_to_us,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    AS BIGINT) AS version
        |FROM ch WHERE prev_type IS NULL OR prev_type <> event_type""".stripMargin)),

    // Rolling 7-day spend per user via a RANGE window frame — the
    // value-based frame (`RANGE 6 PRECEDING` over epoch-day) that rows
    // frames get wrong whenever days are missing: a user with purchases
    // on days 1 and 9 must NOT see day 1 in day 9's trailing week. The
    // daily pre-aggregate keeps the window input to one row per
    // (user, day) — the frame scan is bounded by 7 regardless of how
    // many raw events land in a day. Two exchanges by design: the raw
    // stream partial-aggregates map-side before its (user_id, day)
    // shuffle, and only the REDUCED daily series re-shuffles to the
    // window's user_id partitioning — at scale that second exchange
    // moves days-per-user rows, not events, which beats the
    // one-exchange alternative of shuffling raw events by user_id with
    // no map-side combine.
    QueryDef("q_rolling_window",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = table(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), tsMicros.as("us"),
            cents(col("value")).as("v_c"))
          .groupBy(col("user_id"), expr("us DIV 86400000000").as("day"))
          .agg(sum(col("v_c")).as("day_spend_c"))
        val w = Window.partitionBy("user_id").orderBy(col("day"))
          .rangeBetween(-6, Window.currentRow)
        daily.select(col("user_id"), col("day"), col("day_spend_c"),
          sum("day_spend_c").over(w).as("spend_7d_c"))
      },
      Some("""WITH daily AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_spend_c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT user_id, day, day_spend_c,
        |  CAST(sum(day_spend_c) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS spend_7d_c
        |FROM daily""".stripMargin))
  )
}
