package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/**
 * The rest of the classic TPC-H-shaped battery (SURVEY.md §2.3/2.4 —
 * relational surface), re-shaped to the fixture's columns (no partsupp,
 * no l_commitdate/l_receiptdate, no c_phone/p_container — each query
 * keeps its canonical PLAN SHAPE and swaps the missing column for an
 * available analogue; the point is the operator pattern, not benchmark
 * compliance).
 *
 * Scale notes (100 TB design review):
 *  - every dim (part/supplier/nation/region, filtered first) broadcasts;
 *    the only fact-fact shuffles are lineitem ⨝ orders on orderkey.
 *  - EXISTS / NOT EXISTS become left_semi / left_anti hash joins —
 *    never a correlated per-row subquery.
 *  - scalar subqueries (q15 max, q22 avg) reduce to a 1-row aggregate
 *    broadcast back over the candidate set, and the q22 threshold is
 *    computed in exact integer cents so the cross-engine comparison can
 *    never hinge on a double ULP.
 *  - double aggregates are rounded to stabilize FP across engines (house
 *    rule, as q1/q9).
 */
object TpchExtraQueries {

  /** TPC-H Q4-shaped: order-priority checking. EXISTS(lineitem shipped
    * >90 days after order date) → a left_semi hash join whose extra
    * non-equi term rides the orderkey equality; orders window-filtered
    * BEFORE the join so the semi probe side is already small. */
  private val q4 = QueryDef(
    (s, dir) => Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .join(Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin))

  /** TPC-H Q6-shaped: forecasting revenue change — THE scan-efficiency
    * query. All three predicates push to the parquet scan (PushedFilters
    * carries shipdate bounds, discount range, quantity cap), then one
    * partial-agg of a single product; at 100 TB this reads only the four
    * referenced columns and prunes row groups on shipdate. */
  private val q6 = QueryDef(
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue")),
    Some("""SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin))

  /** TPC-H Q7-shaped: volume shipping between two nations, both
    * directions, by ship year. The nation dim joins twice under two
    * aliases (supplier side, customer side) — both broadcast; the
    * disjunctive nation-pair filter lands right after the cheap
    * broadcasts so the orderkey shuffle carries only matching rows. */
  private val q7 = QueryDef(
    (s, dir) => {
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.supplier(s, dir)), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin))

  /** TPC-H Q8-shaped: national market share — NATION_3 suppliers' slice
    * of ECONOMY-part revenue sold into ASIA, per order year. The share
    * divides two PRE-ROUNDED sums (house FP rule) so the quotient is
    * computed from identical doubles on both engines. */
  private val q8 = QueryDef(
    (s, dir) => {
      val sn = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val marketNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nkey"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nkey"))
        .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("c_custkey") === col("o_custkey"))
        .join(broadcast(marketNations), col("c_nationkey") === col("c_nkey"), "left_semi")
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(
          round(sum(when(col("supp_nation") === "NATION_3",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)), 2)
            .as("nation_rev"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("total_rev"))
        .withColumn("mkt_share", round(col("nation_rev") / col("total_rev"), 4))
        .orderBy("o_year")
    },
    Some("""WITH base AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    l_extendedprice * (1 - l_discount) AS volume, n1.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  WHERE p_type = 'ECONOMY' AND c_nationkey IN (
      |    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      |    WHERE r_name = 'ASIA')),
      |agg AS (
      |  SELECT o_year,
      |    ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2)
      |      AS nation_rev,
      |    ROUND(SUM(volume), 2) AS total_rev
      |  FROM base GROUP BY o_year)
      |SELECT o_year, nation_rev, total_rev,
      |  ROUND(nation_rev / total_rev, 4) AS mkt_share
      |FROM agg ORDER BY o_year""".stripMargin))

  /** TPC-H Q10-shaped: returned-item reporting — top 20 customers by
    * lost revenue (l_returnflag = 'R') in 1998Q1. orderBy+limit plans as
    * TakeOrderedAndProject: each partition keeps its top 20, no global
    * sort ever materializes. */
  private val q10 = QueryDef(
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-04-01").cast("timestamp")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, dir)), col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20),
    Some("""SELECT c_custkey, c_name, n_name,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON n_nationkey = c_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1998-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-04-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin))

  /** TPC-H Q13-shaped: customer order-count distribution INCLUDING the
    * zero-order customers — the canonical left-outer-join + double
    * aggregation. count(o_orderkey) ignores the null rows the outer
    * join manufactures, so no-order customers land in bucket 0. */
  private val q13 = QueryDef(
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") =!= "P"),
        col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc),
    Some("""SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON o_custkey = c_custkey AND o_orderstatus <> 'P'
      |      GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  /** TPC-H Q14-shaped: promotion-revenue share for one ship month.
    * Same pre-rounded-quotient discipline as q8; part broadcasts. */
  private val q14 = QueryDef(
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir)), col("p_partkey") === col("l_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)), 2)
          .as("promo_rev"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_rev"))
      .withColumn("promo_share", round(col("promo_rev") / col("total_rev") * 100, 4)),
    Some("""WITH agg AS (
      |  SELECT
      |    ROUND(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_rev,
      |    ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      |    AND l_shipdate < TIMESTAMP '1997-10-01')
      |SELECT promo_rev, total_rev,
      |  ROUND(promo_rev / total_rev * 100, 4) AS promo_share
      |FROM agg""".stripMargin))

  /** TPC-H Q15-shaped: top supplier(s) by 1997Q1 revenue. The scalar
    * MAX reduces the 100-row per-supplier aggregate to one row and
    * broadcasts back — the "view + subquery on the view" pattern with
    * zero extra passes over lineitem. Equality compares the SAME rounded
    * values on both engines. */
  private val q15 = QueryDef(
    (s, dir) => {
      val revenue = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_revenue"))
      val top = revenue.agg(max("total_revenue").as("max_revenue"))
      Tables.supplier(s, dir)
        .join(revenue, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(top), col("total_revenue") === col("max_revenue"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH revenue AS (
      |  SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
      |    AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin))

  /** TPC-H Q16-shaped: supplier variety per (brand, type, size). No
    * partsupp in the fixture, so the part↔supplier association is the
    * distinct (l_partkey, l_suppkey) pairs lineitem witnessed — same
    * distinct-agg-after-join shape. The distinct count is partial-agg'd
    * (map-side dedup of pairs) before the final count. */
  private val q16 = QueryDef(
    (s, dir) => Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#4" &&
          col("p_size").isin(1, 5, 9, 13, 17, 21))),
        col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size")),
    Some("""SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#4' AND p_size IN (1, 5, 9, 13, 17, 21)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  /** TPC-H Q18-shaped: large-volume customers — orders whose total
    * quantity exceeds 300. The HAVING reduces lineitem to orderkey
    * granularity FIRST (46 survivors at sf0.01), then a semi-ish join
    * back enriches with customer; the big tables join pre-aggregated. */
  private val q18 = QueryDef(
    (s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 2).as("total_qty"))
        .filter(col("total_qty") > 300)
      Tables.orders(s, dir)
        .join(big, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), round(col("o_totalprice"), 2).as("o_price"),
          col("total_qty"))
        .orderBy(col("o_price").desc, col("o_orderkey"))
    },
    Some("""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  ROUND(o_totalprice, 2) AS o_price, total_qty
      |FROM (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_price DESC, o_orderkey""".stripMargin))

  /** TPC-H Q19-shaped: discounted revenue under an OR-of-ANDs predicate
    * (brand × size-range × quantity-range triples — p_container swapped
    * for p_size). The whole disjunction sits in ONE join filter so
    * Catalyst can extract the common p_partkey equality and push the
    * per-branch ranges into both scans. */
  private val q19 = QueryDef(
    (s, dir) => Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(5, 25)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue")),
    Some("""SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 5 AND 25)
      |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity BETWEEN 10 AND 30)""".stripMargin))

  /** TPC-H Q22-shaped: dormant high-balance customers — above-average
    * balance, no order since 2000-06-01 (NOT EXISTS → left_anti on the
    * date-filtered orders), grouped by nation. The average-balance
    * threshold crosses engines in EXACT INTEGER CENTS (sum of rounded
    * cents, integer-divided) so membership can never flip on a double
    * ULP; only the reported sum is a rounded double. */
  private val q22 = QueryDef(
    (s, dir) => {
      val cust = Tables.customer(s, dir)
        .withColumn("bal_cents", round(col("c_acctbal") * 100).cast("long"))
      // integer (truncating) division on BOTH engines — `/` would be a
      // double divide whose cast TRUNCATES in Spark but ROUNDS in DuckDB
      val thresh = cust.filter(col("c_acctbal") > 0)
        .agg(expr("sum(bal_cents) div count(1)").as("avg_cents"))
      cust.filter(col("c_acctbal") > 0)
        .join(broadcast(thresh), col("bal_cents") > col("avg_cents"))
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("numcust"),
          round(sum("c_acctbal"), 2).as("totacctbal"))
        .orderBy("nationkey")
    },
    Some("""WITH cust AS (
      |  SELECT c_custkey, c_nationkey, c_acctbal,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
      |  FROM customer WHERE c_acctbal > 0),
      |thresh AS (
      |  SELECT SUM(bal_cents) // COUNT(*) AS avg_cents FROM cust)
      |SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
      |  ROUND(SUM(c_acctbal), 2) AS totacctbal
      |FROM cust, thresh
      |WHERE bal_cents > avg_cents
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = cust.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '2000-06-01')
      |GROUP BY c_nationkey
      |ORDER BY nationkey""".stripMargin))

  /** FOOTER-ONLY statistics — parquet AGGREGATE PUSHDOWN: a bare
    * COUNT(*)/MIN/MAX over an unfiltered scan reads row-group FOOTERS
    * instead of data pages (the `BatchScan … PushedAggregation:
    * [COUNT(*), MIN(…), MAX(…)]` plan, PlanSuite-asserted). At 100 TB
    * this is the difference between a metadata round and a full scan
    * for every freshness/rowcount/bounds probe a pipeline issues.
    * Requires the V2 parquet source: the reader flips
    * `useV1SourceList` for THIS read only and restores it immediately —
    * the rest of the library keeps the default V1 planning its plan
    * pins assert against. `aggregatePushdown` is a documented SESSION
    * INVARIANT set at bootstrap ([[graft.Tables.configure]]) — it must
    * be on at execution time, after this function returns, and setting
    * it there (not here) means a future V2 read inherits it visibly,
    * not as a QueryDef side effect. The set below only repeats the
    * invariant for driver-built sessions that skipped `configure` (the
    * same self-sufficiency pattern as `Tables.load`'s nanos flag). */
  private lazy val aggFooterStats = QueryDef(
    (s, dir) => {
      val key = "spark.sql.sources.useV1SourceList"
      val prev = s.conf.get(key)
      s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      s.conf.set(key, "")
      val base =
        try s.read.parquet(s"$dir/lineitem.parquet")
        finally s.conf.set(key, prev)
      base.selectExpr("count(*) as n_rows",
        "min(l_orderkey) as min_orderkey", "max(l_orderkey) as max_orderkey",
        "min(l_linenumber) as min_line", "max(l_linenumber) as max_line")
    },
    Some("""SELECT COUNT(*) AS n_rows,
      |  MIN(l_orderkey) AS min_orderkey, MAX(l_orderkey) AS max_orderkey,
      |  MIN(l_linenumber) AS min_line, MAX(l_linenumber) AS max_line
      |FROM lineitem""".stripMargin))

  /** TPC-H Q2-shaped: minimum-cost supplier. The correlated scalar-MIN
    * subquery decorrelates into ONE map-side-combined per-part minimum
    * joined back to the (part, supplier) offers — never a per-row
    * subquery; all dims (filtered part, supplier→nation→region chain)
    * broadcast. No partsupp in the fixture: lineitem stands in as the
    * offer table, offer cost = the pair's minimum line price in EXACT
    * INTEGER CENTS (the q22 discipline — the min-equality join can
    * never hinge on a double ULP). s_acctbal is raw parquet data, so
    * ordering on it is engine-stable. */
  private val q2 = QueryDef(
    (s, dir) => {
      // r20 opt: offers feeds BOTH the per-part minimum and the join's
      // left side — without a materialization boundary the whole
      // lineitem aggregation executed twice (2 × ~10 MB partial-agg
      // exchanges, the query's entire 19.8 MB shuffle). Lazy checkpoint
      // = the r18 multi-arm dedup pattern; offers is (part, supp)-pair
      // sized, far smaller than the fact table, at any scale.
      val offers = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("cost_c"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min("cost_c").as("cost_c"))
        .localCheckpoint(false)
      val minCost = offers.groupBy("l_partkey")
        .agg(min("cost_c").as("min_c"))
      val eligible = Tables.part(s, dir)
        .filter(col("p_type") === "STANDARD")
        .select("p_partkey")
      val suppliers = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      offers
        .join(minCost, Seq("l_partkey"))
        .filter(col("cost_c") === col("min_c"))
        .join(broadcast(eligible), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppliers), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("cost_c"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },
    Some("""WITH offers AS (
      |  SELECT l_partkey, l_suppkey,
      |         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_c
      |  FROM lineitem GROUP BY 1, 2),
      |mc AS (SELECT l_partkey, MIN(cost_c) AS min_c FROM offers GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, p_partkey, cost_c
      |FROM offers
      |JOIN mc USING (l_partkey)
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN region ON r_regionkey = n_regionkey
      |WHERE cost_c = min_c AND p_type = 'STANDARD'
      |  AND r_name = 'EUROPE'
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin))

  /** TPC-H Q11-shaped: important stock identification. Per-part value
    * from one nation's suppliers, kept where value exceeds a FRACTION of
    * the total — the global threshold is a 1-row aggregate broadcast
    * back (never a correlated subquery), and the fraction compare is
    * pure integer (`1000·value_c > total_c` ⇔ value > 0.1%): exact
    * cents end-to-end. No partsupp: value = the nation's lineitem
    * revenue per part. */
  private val q11 = QueryDef(
    (s, dir) => {
      val natSupp = Tables.supplier(s, dir)
        .filter(col("s_nationkey") === 1)
        .select(col("s_suppkey"))
      val vals = Tables.lineitem(s, dir)
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)"))
          .as("value_c"))
      val total = vals.agg(sum("value_c").as("total_c"))
      vals.crossJoin(broadcast(total))
        .filter(expr("1000 * value_c > total_c"))
        .select(col("l_partkey").as("p_partkey"),
          col("value_c").cast("long").as("value_c"))
        .orderBy(col("value_c").desc, col("p_partkey"))
    },
    Some("""WITH v AS (
      |  SELECT l_partkey AS p_partkey,
      |         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |           AS value_c
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE s_nationkey = 1
      |  GROUP BY 1),
      |t AS (SELECT CAST(SUM(value_c) AS BIGINT) AS total_c FROM v)
      |SELECT p_partkey, value_c
      |FROM v CROSS JOIN t
      |WHERE 1000 * value_c > total_c
      |ORDER BY value_c DESC, p_partkey""".stripMargin))

  /** TPC-H Q12-shaped: shipping-priority analysis. One fact-fact join
    * on orderkey, LATE lines only (shipdate > orderdate + 60d — the
    * fixture has no commit/receipt dates), conditional CASE aggregation
    * splitting urgent from routine priorities — the canonical
    * two-counter rollup, grouped by l_returnflag in place of the absent
    * l_shipmode. */
  private val q12 = QueryDef(
    (s, dir) => Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** TPC-H Q21-shaped: suppliers who kept orders waiting. The classic
    * EXISTS + NOT EXISTS pair becomes a left_semi (another supplier
    * contributed to the order) then a left_anti (no OTHER supplier was
    * also late) — both hash joins on orderkey with the suppkey
    * inequality riding the join condition, never per-row subqueries.
    * "Late" = shipped >90 days after the order date (no receipt/commit
    * dates in the fixture); finished orders only. */
  private val q21 = QueryDef(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val late = li
        .join(Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = late.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      late
        .join(l2, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    Some("""WITH late AS (
      |  SELECT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "q2_min_cost_supplier" -> q2,
    "q11_important_parts" -> q11,
    "q12_priority_lateness" -> q12,
    "q21_waiting_suppliers" -> q21,
    "agg_footer_stats" -> aggFooterStats,
    "q4_priority_late" -> q4,
    "q6_forecast_revenue" -> q6,
    "q7_volume_shipping" -> q7,
    "q8_market_share" -> q8,
    "q10_returned_items" -> q10,
    "q13_order_distribution" -> q13,
    "q14_promo_share" -> q14,
    "q15_top_supplier" -> q15,
    "q16_supplier_variety" -> q16,
    "q18_large_volume" -> q18,
    "q19_disjunctive_pred" -> q19,
    "q22_dormant_customers" -> q22)
}
