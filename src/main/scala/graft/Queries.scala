package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** The correctness-gate query catalog.
  *
  * Each entry is (spark DataFrame program, equivalent ANSI SQL for the
  * DuckDB oracle). Names + column aliases must match exactly between the
  * two sides (the driver sorts columns by name before hashing).
  *
  * Determinism rules applied throughout (SURVEY.md §7.4):
  *  - no bare `first()` / `collect_list` — `min_by` / sorted concat;
  *  - every float aggregate rounded so cross-engine summation order
  *    cannot flip a low-order bit into the hash;
  *  - every result totally ordered before limit.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q01
  /** A1/A4/A9 pricing summary (TPC-H Q1 shape): scan → filter →
    * hash-agg. Partial aggregation map-side; one shuffle of ~4 groups. */
  val q01Pricing: Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** P1/P2/P3/P5/P11: filter + projection + cast. Predicates and the
    * 4-column ReadSchema both reach the parquet scan (pushdown). */
  val q02FilterProject: Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_quantity" >= 48 && $"l_returnflag" === "R")
      .select($"l_orderkey", $"l_linenumber",
        // floor() before the int cast: Spark CAST truncates toward zero
        // while DuckDB rounds half-away-from-zero; floor is identical in
        // both engines for any value, integral or not (ADVICE r1).
        floor($"l_quantity").cast("int").as("qty"), $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, CAST(floor(l_quantity) AS INT) AS qty, l_returnflag
      |FROM lineitem
      |WHERE l_quantity >= 48 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  /** P8/P9: CASE-WHEN recodes (reference gender / unit-id recodes,
    * `parse_ICNARC_xml.py:66-75`, `ipynb:cell 21`). */
  val q03CaseRecode: Q = (s, dir) => {
    import s.implicits._
    Tables.orders(s, dir)
      .withColumn("priority_class",
        when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), "high")
          .when($"o_orderpriority" === "3-MEDIUM", "medium")
          .otherwise("low"))
      .withColumn("status_name",
        when($"o_orderstatus" === "F", "finished")
          .when($"o_orderstatus" === "O", "open")
          .otherwise("partial"))
      .groupBy($"priority_class", $"status_name")
      .agg(count(lit(1)).as("n"))
      .orderBy($"priority_class", $"status_name")
  }
  val q03Sql: String =
    """SELECT
      |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
      |       WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
      |       ELSE 'low' END AS priority_class,
      |  CASE WHEN o_orderstatus = 'F' THEN 'finished'
      |       WHEN o_orderstatus = 'O' THEN 'open'
      |       ELSE 'partial' END AS status_name,
      |  count(*) AS n
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q04
  /** P10: dict-lookup recode → null on miss (ICNARC diagnosis-code maps,
    * `ipynb:cells 30,32`): broadcast left join against a literal
    * dimension — never a UDF, never a driver-side map. */
  val q04DictLookup: Q = (s, dir) => {
    import s.implicits._
    val lookup = Seq(
      ("FRANCE", "western-europe"), ("GERMANY", "western-europe"),
      ("UNITED KINGDOM", "western-europe"), ("CHINA", "east-asia"),
      ("JAPAN", "east-asia"), ("UNITED STATES", "north-america"))
      .toDF("name", "region_label")
    Tables.nation(s, dir)
      .join(broadcast(lookup), $"n_name" === $"name", "left")
      .select($"n_nationkey", $"n_name", $"region_label")
      .orderBy($"n_nationkey")
  }
  val q04Sql: String =
    """SELECT n_nationkey, n_name, m.region_label
      |FROM nation LEFT JOIN (VALUES
      |  ('FRANCE','western-europe'), ('GERMANY','western-europe'),
      |  ('UNITED KINGDOM','western-europe'), ('CHINA','east-asia'),
      |  ('JAPAN','east-asia'), ('UNITED STATES','north-america'))
      |  AS m(name, region_label) ON n_name = m.name
      |ORDER BY n_nationkey""".stripMargin

  // ---------------------------------------------------------------- q05
  /** J1/J2/P13: known-bad key correction — broadcast left join +
    * coalesce (the reference's issue-list repair intent). */
  val q05KeyCorrection: Q = (s, dir) => {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val issues = orders.filter($"o_orderkey" % 97 === 0)
      .select($"o_orderkey", ($"o_orderkey" + 10000000L).as("corrected"))
    KeyCorrection.correctKeys(orders, issues, "o_orderkey", "corrected")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"o_orderkey" =!= $"o_orderkey_original", 1L).otherwise(0L)).as("n_corrected"),
        sum($"o_orderkey").as("key_checksum"))
  }
  val q05Sql: String =
    """WITH issues AS (
      |  SELECT o_orderkey AS k, o_orderkey + 10000000 AS corrected
      |  FROM orders WHERE o_orderkey % 97 = 0),
      |corr AS (
      |  SELECT coalesce(i.corrected, o.o_orderkey) AS key_fixed,
      |         o.o_orderkey AS orig
      |  FROM orders o LEFT JOIN issues i ON o.o_orderkey = i.k)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CASE WHEN key_fixed <> orig THEN 1 ELSE 0 END) AS BIGINT) AS n_corrected,
      |       CAST(sum(key_fixed) AS BIGINT) AS key_checksum
      |FROM corr""".stripMargin

  // ---------------------------------------------------------------- q06
  /** A1: dedup-merge "simple" — one hash agg, deterministic first via
    * min_by over the unique order key. */
  val q06DedupMerge: Q = (s, dir) => {
    import s.implicits._
    Dedup.combine(Tables.orders(s, dir), Seq("o_custkey"), Seq(
      count(lit(1)).as("n_frag"),
      Dedup.firstBy($"o_orderstatus", $"o_orderkey").as("first_status"),
      min($"o_orderdate").as("first_date"),
      max($"o_orderdate").as("last_date"),
      round(sum($"o_totalprice"), 2).as("total_price")))
      .orderBy($"o_custkey")
  }
  val q06Sql: String =
    """SELECT o_custkey, count(*) AS n_frag,
      |  arg_min(o_orderstatus, o_orderkey) AS first_status,
      |  min(o_orderdate) AS first_date,
      |  max(o_orderdate) AS last_date,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q07
  /** A2/A3: dedup-merge "concat" — sorted collect_list (deterministic)
    * + the `_get_err` first-non-default aggregate. */
  val q07DedupConcat: Q = (s, dir) => {
    import s.implicits._
    Dedup.combine(Tables.orders(s, dir), Seq("o_custkey"), Seq(
      count(lit(1)).as("n_orders"),
      Dedup.sortedConcat($"o_orderkey").as("order_ids"),
      Dedup.firstNonDefault($"o_orderpriority", "5-LOW").as("priority_err")))
      .orderBy($"o_custkey")
  }
  val q07Sql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  array_to_string(list_sort(list(CAST(o_orderkey AS VARCHAR))), ',') AS order_ids,
      |  coalesce(min(CASE WHEN o_orderpriority <> '5-LOW' THEN o_orderpriority END), '5-LOW') AS priority_err
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q08
  /** J3/J8: fact ⋈ fact shuffle join + broadcast dim chain. nation is
    * dimension-sized → broadcast; customer⋈orders shuffles on the key
    * (AQE picks the strategy at real scale). */
  val q08JoinInner: Q = (s, dir) => {
    import s.implicits._
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(Tables.orders(s, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct($"c_custkey").as("n_customers"),
        round(sum($"o_totalprice"), 2).as("revenue"))
      .orderBy($"n_name")
  }
  val q08Sql: String =
    """SELECT n_name, count(*) AS n_orders,
      |  count(DISTINCT c_custkey) AS n_customers,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q09
  /** J4: composite-key equi-join (reference joins on
    * (ICNARC number, Unit ID)) — agg then join back on both keys. */
  val q09CompositeJoin: Q = (s, dir) => {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val ps = li.groupBy($"l_partkey".as("pk"), $"l_suppkey".as("sk"))
      .agg(count(lit(1)).as("n_li"), sum($"l_quantity").as("grp_qty"))
    li.join(ps, $"l_partkey" === $"pk" && $"l_suppkey" === $"sk")
      .groupBy($"l_partkey")
      .agg(count(lit(1)).as("n_rows"),
        round(sum($"l_quantity" / $"grp_qty"), 4).as("share_sum"))
      .orderBy($"l_partkey")
  }
  val q09Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk, count(*) AS n_li,
      |         sum(l_quantity) AS grp_qty
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l.l_partkey, count(*) AS n_rows,
      |       round(sum(l.l_quantity / ps.grp_qty), 4) AS share_sum
      |FROM lineitem l JOIN ps ON l.l_partkey = ps.pk AND l.l_suppkey = ps.sk
      |GROUP BY l.l_partkey ORDER BY l.l_partkey""".stripMargin

  // ---------------------------------------------------------------- q10
  /** J5/J9: semi-join (IN-subquery shape) — left_semi keeps the build
    * side out of the output, no fan-out. */
  val q10SemiJoin: Q = (s, dir) => {
    import s.implicits._
    val keys = Tables.lineitem(s, dir).filter($"l_discount" > 0.06)
      .select($"l_orderkey".as("o_orderkey"))
    Tables.orders(s, dir)
      .join(keys, Seq("o_orderkey"), "left_semi")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }
  val q10Sql: String =
    """SELECT o_orderstatus, count(*) AS n
      |FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.06)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q11
  /** NOT-IN exclusion (§2.7) as a left_anti join: customers with no
    * high-value order. */
  val q11AntiJoin: Q = (s, dir) => {
    import s.implicits._
    val bigOrderCust = Tables.orders(s, dir)
      .filter($"o_totalprice" > 150000.0)
      .select($"o_custkey".as("c_custkey"))
    Tables.customer(s, dir)
      .join(bigOrderCust, Seq("c_custkey"), "left_anti")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy($"c_mktsegment")
  }
  val q11Sql: String =
    """SELECT c_mktsegment, count(*) AS n
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q12
  /** J5: cohort right-join — every cohort member kept, zero counts for
    * members with no facts (reference cell 49 chartevents restriction). */
  val q12RightCohort: Q = (s, dir) => {
    import s.implicits._
    val cohort = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    Tables.orders(s, dir)
      .join(cohort, $"o_custkey" === $"c_custkey", "right")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"))
      .orderBy($"c_custkey")
  }
  val q12Sql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** Registry: name → (spark program, oracle sql). */
  // ---------------------------------------------------------------- q150
  /** Local-supplier volume — the TPC-H Q5 shape, the canonical
    * join-order workout: 6 tables (customer ⋈ orders ⋈ lineitem ⋈
    * supplier ⋈ nation ⋈ region), the region/nation dims broadcast,
    * the selective same-nation predicate (`c_nationkey = s_nationkey`)
    * riding the supplier join, the date range pushed to the orders
    * scan. Catalyst + AQE pick the fact-join order; the declared plan
    * stays three shuffles (customer⋈orders, ⋈lineitem, ⋈supplier) no
    * matter the SF. */
  val q150LocalVolume: Q = (s, dir) => {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(s, dir),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA" &&
        $"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
      .orderBy($"n_name")
  }
  val q150Sql: String =
    """SELECT n_name, count(*) AS n_lines,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q167
  /** Two-nation trade volume — the TPC-H Q7 shape: lineitem ⋈ orders ⋈
    * supplier ⋈ customer with BOTH trade directions admitted through a
    * disjunctive predicate over two broadcast copies of nation, split
    * by shipping year. The workout Q5 doesn't give the planner: the
    * nation pair filter can't collapse to one dim equi-join, so the
    * disjunction must ride the joined frame while the two nation dims
    * broadcast independently. Date range pushes to the lineitem scan —
    * the biggest table prunes FIRST. */
  val q167TradeVolume: Q = (s, dir) => {
    import s.implicits._
    val n1 = Tables.nation(s, dir)
      .select($"n_nationkey".as("s_nkey"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select($"n_nationkey".as("c_nkey"), $"n_name".as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1998-01-01")
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"s_nationkey" === $"s_nkey")
      .join(broadcast(n2), $"c_nationkey" === $"c_nkey")
      .filter(($"supp_nation" === "NATION_0" && $"cust_nation" === "NATION_1") ||
        ($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_0"))
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").as("l_year"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("volume"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }
  val q167Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(extract(year FROM l_shipdate) AS INTEGER) AS l_year,
      |  count(*) AS n_lines,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS volume
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND ((n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
      |    OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0'))
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q168
  /** National market share — the TPC-H Q8 shape: the PROMO-part order
    * volume per year, with NATION_0's share of it — a ratio of two
    * conditional aggregates over one joined frame (`sum(when)` /
    * `sum`), the pattern that needs no second pass or self-join. Six
    * tables; part is filtered BEFORE its join (partkey pruning), dims
    * broadcast. Share is an exact-ordering-hazard float ratio →
    * rounded like every float aggregate. */
  val q168MarketShare: Q = (s, dir) => {
    import s.implicits._
    val promo = Tables.part(s, dir).filter($"p_type" === "PROMO")
      .select($"p_partkey")
    val supN = Tables.nation(s, dir)
      .select($"n_nationkey".as("s_nkey"), $"n_name".as("supp_nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(promo), $"l_partkey" === $"p_partkey")
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1998-01-01")
      .join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(supN), $"s_nationkey" === $"s_nkey")
      .withColumn("volume", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"volume"), 2).as("total_volume"),
        round(sum(when($"supp_nation" === "NATION_0", $"volume")
          .otherwise(lit(0.0))) / sum($"volume"), 6).as("mkt_share"))
      .orderBy($"o_year")
  }
  val q168Sql: String =
    """SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
      |  count(*) AS n_lines,
      |  round(sum(volume), 2) AS total_volume,
      |  round(sum(CASE WHEN supp_nation = 'NATION_0' THEN volume ELSE 0.0 END)
      |    / sum(volume), 6) AS mkt_share
      |FROM (
      |  SELECT o_orderdate, n_name AS supp_nation,
      |         l_extendedprice * (1.0 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01') t
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val catalog: Seq[(String, Q, Option[String])] = Seq(
    ("q01_pricing_summary", q01Pricing, Some(q01Sql)),
    ("q02_filter_project", q02FilterProject, Some(q02Sql)),
    ("q03_case_recode", q03CaseRecode, Some(q03Sql)),
    ("q04_dict_lookup", q04DictLookup, Some(q04Sql)),
    ("q05_key_correction", q05KeyCorrection, Some(q05Sql)),
    ("q06_dedup_merge", q06DedupMerge, Some(q06Sql)),
    ("q07_dedup_concat", q07DedupConcat, Some(q07Sql)),
    ("q08_join_inner", q08JoinInner, Some(q08Sql)),
    ("q09_composite_join", q09CompositeJoin, Some(q09Sql)),
    ("q10_semi_join", q10SemiJoin, Some(q10Sql)),
    ("q11_anti_join", q11AntiJoin, Some(q11Sql)),
    ("q12_right_cohort", q12RightCohort, Some(q12Sql)),
    ("q150_local_volume", q150LocalVolume, Some(q150Sql)),
    ("q167_trade_volume", q167TradeVolume, Some(q167Sql)),
    ("q168_market_share", q168MarketShare, Some(q168Sql)),
  )
}
