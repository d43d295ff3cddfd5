package graft.queries

import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes (Q2, Q8, Q9, Q11, Q12, Q15, Q17, Q19,
  * Q20, Q21), adapted to the warehouse's columns: there is no `partsupp`
  * table and no commit/receipt-date or ship-mode columns, so supply
  * relationships derive from `lineitem` (which supplier actually shipped
  * which part), cost from `p_retailprice`, and lateness from
  * `l_shipdate - o_orderdate`. The PLAN shapes — correlated scalar
  * subqueries (decorrelated by Catalyst into agg + join-back), scalar
  * subqueries in HAVING, OR-of-ANDs pushdown, semi-join chains, and
  * EXISTS/NOT-EXISTS pairs — are the faithful part; those are what decide
  * whether the query survives 100 TB.
  *
  * Money math follows the [[QueryDef]] determinism rules: exact integer
  * cents for every aggregated measure, cross-multiplied integer
  * comparisons instead of floating-point averages, BIGINT casts on both
  * engines.
  */
object TpchShapeQueries {
  import Q._

  private val RevSql =
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q2 shape: min-value supplier per part. The textbook form is a
    // CORRELATED scalar subquery (the oracle keeps it); Catalyst
    // decorrelates that into an aggregate joined back — but INLINES the
    // candidate CTE into both branches, scanning part⋈lineitem⋈supplier
    // twice. The window-min form below computes the candidates ONCE and
    // pays one p_partkey shuffle — the shape that survives 100 TB. Ties on
    // the minimum keep all tied suppliers (exactly Q2's semantics).
    // "Suppliers of a part" = distinct (l_partkey, l_suppkey) pairs, the
    // lineitem-derived stand-in for partsupp.
    QueryDef("q2_min_supplier",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql("""WITH shipped AS (
          |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
          |cand AS (
          |  SELECT p_partkey, p_brand, s_suppkey, s_name,
          |    CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_c
          |  FROM part
          |  JOIN shipped ON l_partkey = p_partkey
          |  JOIN supplier ON s_suppkey = l_suppkey
          |  WHERE p_size BETWEEN 45 AND 50)
          |SELECT p_partkey, p_brand, s_suppkey, s_name, acctbal_c
          |FROM (SELECT *, min(acctbal_c)
          |        OVER (PARTITION BY p_partkey) AS min_c FROM cand)
          |WHERE acctbal_c = min_c""".stripMargin)
      },
      Some("""WITH shipped AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |cand AS (
        |  SELECT p_partkey, p_brand, s_suppkey, s_name,
        |    CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_c
        |  FROM part
        |  JOIN shipped ON l_partkey = p_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  WHERE p_size BETWEEN 45 AND 50)
        |SELECT p_partkey, p_brand, s_suppkey, s_name, acctbal_c
        |FROM cand c
        |WHERE acctbal_c = (SELECT min(acctbal_c) FROM cand m
        |                   WHERE m.p_partkey = c.p_partkey)""".stripMargin)),

    // TPC-H Q8 shape: national market share — a two-armed snowflake (one
    // nation lookup for the customer side, another for the supplier side)
    // with a conditional-aggregate share per year. Every dimension arm is
    // broadcast-sized; lineitem stays the only shuffled input.
    QueryDef("q8_market_share",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          |  CAST(sum(CASE WHEN sn.n_name = 'NATION_7' THEN $RevSql
          |           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS nation_c,
          |  CAST(sum($RevSql) AS BIGINT) AS total_c,
          |  CAST(sum(CASE WHEN sn.n_name = 'NATION_7' THEN $RevSql
          |           ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
          |    / sum($RevSql) AS share
          |FROM lineitem
          |JOIN orders   ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation cn ON c_nationkey = cn.n_nationkey
          |JOIN region   ON cn.n_regionkey = r_regionkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation sn ON s_nationkey = sn.n_nationkey
          |JOIN part     ON l_partkey = p_partkey
          |WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
          |GROUP BY year(o_orderdate)""".stripMargin)
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN sn.n_name = 'NATION_7' THEN $RevSql
        |           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS nation_c,
        |  CAST(sum($RevSql) AS BIGINT) AS total_c,
        |  CAST(sum(CASE WHEN sn.n_name = 'NATION_7' THEN $RevSql
        |           ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
        |    / sum($RevSql) AS share
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region   ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN part     ON l_partkey = p_partkey
        |WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
        |GROUP BY year(o_orderdate)""".stripMargin)),

    // TPC-H Q9 shape: profit by supplier nation and year. Cost adapts to
    // the available columns (no ps_supplycost): retail price in cents
    // times quantity — per-row exact integer arithmetic, so the profit
    // aggregate stays order-free. The p_name LIKE filter lands on the
    // broadcast part arm.
    QueryDef("q9_profit",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql(s"""SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS l_year,
          |  CAST(sum($RevSql
          |    - CAST(round(p_retailprice * 100) AS BIGINT)
          |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_c
          |FROM lineitem
          |JOIN part     ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation   ON s_nationkey = n_nationkey
          |WHERE p_name LIKE '%red%'
          |GROUP BY n_name, year(l_shipdate)""".stripMargin)
      },
      Some(s"""SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum($RevSql
        |    - CAST(round(p_retailprice * 100) AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_c
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, year(l_shipdate)""".stripMargin)),

    // TPC-H Q11 shape: groups exceeding a fraction of a GLOBAL total — a
    // scalar subquery inside HAVING. The 2% threshold is an exact integer
    // cross-multiplication (sum * 50 > total), never a floating-point
    // fraction that could flip boundary groups between engines. Both sides
    // aggregate the fact table twice; at scale the global total is a
    // byte-sized broadcast, not a second shuffle of the groups.
    QueryDef("q11_nation_share",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql(s"""SELECT n_name,
          |  CAST(sum($RevSql) AS BIGINT) AS rev_c
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation   ON s_nationkey = n_nationkey
          |GROUP BY n_name
          |HAVING sum($RevSql) * 50
          |     > (SELECT sum($RevSql) FROM lineitem)""".stripMargin)
      },
      Some(s"""SELECT n_name,
        |  CAST(sum($RevSql) AS BIGINT) AS rev_c
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |HAVING sum($RevSql) * 50
        |     > (SELECT sum($RevSql) FROM lineitem)""".stripMargin)),

    // TPC-H Q12 shape: shipment-lateness buckets × order-priority severity
    // counts. Lateness derives from l_shipdate - o_orderdate (the schema
    // has no commit/receipt dates); the CASE buckets are computed per-row
    // after an equi-join whose only big side is lineitem.
    QueryDef("q12_late_priority",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql("""SELECT
          |  CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 'LATE'
          |       WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY THEN 'SLOW'
          |       ELSE 'ONTIME' END AS lateness,
          |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY 1""".stripMargin)
      },
      Some("""SELECT
        |  CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 'LATE'
        |       WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY THEN 'SLOW'
        |       ELSE 'ONTIME' END AS lateness,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin)),

    // TPC-H Q15 shape: top supplier(s) by windowed revenue — a derived
    // aggregate consumed twice (once for the rows, once for its max). The
    // exact-cents revenue makes the "= max" tie semantics deterministic;
    // Spark plans the CTE's second use as a reused exchange, not a second
    // scan of lineitem.
    QueryDef("q15_top_supplier",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql(s"""WITH rev AS (
          |  SELECT l_suppkey, CAST(sum($RevSql) AS BIGINT) AS total_rev_c
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
          |    AND l_shipdate <  TIMESTAMP_NTZ '1997-04-01 00:00:00'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, total_rev_c
          |FROM supplier JOIN rev ON s_suppkey = l_suppkey
          |WHERE total_rev_c = (SELECT max(total_rev_c) FROM rev)""".stripMargin)
      },
      Some(s"""WITH rev AS (
        |  SELECT l_suppkey, CAST(sum($RevSql) AS BIGINT) AS total_rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev_c
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev_c = (SELECT max(total_rev_c) FROM rev)""".stripMargin)),

    // TPC-H Q17 shape: rows below 20% of their group's average — the
    // correlated-average filter decorrelated into a per-part aggregate
    // join. The comparison is integer cross-multiplied (5·qty·count < sum):
    // quantities are integral, so no floating-point average exists to
    // disagree across engines.
    QueryDef("q17_small_quantity",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql("""WITH pq AS (
          |  SELECT l_partkey,
          |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          |    CAST(count(*) AS BIGINT) AS n_li
          |  FROM lineitem GROUP BY l_partkey)
          |SELECT
          |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          |    AS total_price_c,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN pq   ON pq.l_partkey = part.p_partkey
          |WHERE p_brand = 'Brand#3'
          |  AND CAST(l_quantity AS BIGINT) * 5 * n_li < sum_qty""".stripMargin)
      },
      Some("""WITH pq AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |    CAST(count(*) AS BIGINT) AS n_li
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_price_c,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN pq   ON pq.l_partkey = part.p_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND CAST(l_quantity AS BIGINT) * 5 * n_li < sum_qty""".stripMargin)),

    // TPC-H Q19 shape: an OR of per-branch AND blocks mixing part and
    // lineitem predicates. The plan question Q19 exists to ask: does the
    // optimizer extract the part-only disjunction and push it below the
    // join (CNF conversion), so the broadcast side is pre-filtered instead
    // of every part row surviving to the join? PlanQualitySpec asserts it.
    QueryDef("q19_or_brands",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql(s"""SELECT CAST(sum($RevSql) AS BIGINT) AS revenue_c,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
          |       AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
          |       AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
          |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
      },
      Some(s"""SELECT CAST(sum($RevSql) AS BIGINT) AS revenue_c,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // TPC-H Q20 shape: a semi-join CHAIN — suppliers IN (shippers of parts
    // IN (promo parts) with enough volume). Each IN becomes a left-semi
    // join over a pre-aggregated subquery; nothing fans out, and the
    // HAVING aggregates lineitem down to one row per qualifying supplier
    // BEFORE touching the supplier table.
    QueryDef("q20_promo_shippers",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql("""SELECT s_suppkey, s_name, n_name
          |FROM supplier
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey FROM lineitem
          |  WHERE l_partkey IN
          |      (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
          |    AND l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
          |    AND l_shipdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
          |  GROUP BY l_suppkey
          |  HAVING sum(CAST(l_quantity AS BIGINT)) > 500)""".stripMargin)
      },
      Some("""SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 500)""".stripMargin)),

    // TPC-H Q21 shape: the EXISTS + NOT-EXISTS pair — suppliers whose
    // shipment was the ONLY late one on a multi-supplier finished order.
    // Catalyst plans the pair as a left-semi then left-anti join on
    // l_orderkey with the supplier-inequality as a residual; "late" adapts
    // to shipdate - orderdate > 60 days (no receipt/commit dates in this
    // schema).
    QueryDef("q21_waiting_supplier",
      (s, d) => {
        GraftTables.registerViews(s, d)
        s.sql("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
          |FROM lineitem l1
          |JOIN orders   ON o_orderkey = l1.l_orderkey
          |JOIN supplier ON s_suppkey = l1.l_suppkey
          |WHERE o_orderstatus = 'F'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
          |GROUP BY s_name""".stripMargin)
      },
      Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |JOIN orders   ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name""".stripMargin))
  )
}
