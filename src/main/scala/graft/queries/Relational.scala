package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._
import QueryDsl._

/** Batch relational corpus — joins, keyed aggregation, window functions,
  * sorts/limits, set ops, grouping sets, scalar functions, subqueries.
  *
  * The reference (song9446/kstreamjs) has none of these (SURVEY.md §2.3);
  * they complete the engine per SURVEY.md §7 step 5. Everything is
  * DataFrame-declarative so Catalyst owns pushdown/pruning/join selection;
  * scale notes per query explain the 100 TB plan shape.
  *
  * Determinism contract with the DuckDB oracle: exact DECIMAL aggregation
  * (see [[QueryDsl]]), explicit ORDER BY with unique tie-breaks, explicit
  * NULLS FIRST on rollup/cube keys.
  */
object Relational {

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q1
    // TPC-H Q1 shape: scan → pushed filter → hash agg (map-side partial).
    // At 100 TB: 4-group output, pure partial-agg pipeline, no skew risk.
    // Product sums use split scaled-long accumulators (see QueryDsl):
    // exact, overflow-safe, and entirely long-arithmetic in codegen —
    // the high-precision-decimal alternative is 2.5× slower.
    Q("q1_agg", (s, d) => {
      // price·(1−disc) in 10^-4 dollars; ·(1+tax) in 10^-6 dollars.
      val p1 = s"${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})"
      val p2 = s"($p1) * (100 + ${centsSql("l_tax")})"
      val aggs: Seq[org.apache.spark.sql.Column] =
        Seq(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price")) ++
          splitSumAggs("dp", p1, 1000000L) ++
          splitSumAggs("ch", p2, 1000000000L) ++
          Seq(
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(aggs.head, aggs.tail: _*)
        .select(
          col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("sum_base_price"),
          splitSumValue("dp", 1000000L, 10000L).as("sum_disc_price"),
          splitSumValue("ch", 1000000000L, 1000000L).as("sum_charge"),
          col("avg_qty"), col("avg_disc"), col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1000000.0 AS sum_charge,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""), headline = true),

    // ----------------------------------------------------- broadcast join
    // region(5) and nation(25) are broadcast — zero shuffle on the dims;
    // only the final 25-group agg shuffles. Same plan holds at 100 TB.
    Q("q_join_broadcast", (s, d) => {
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("r_name"), col("n_name"))
    }, Some("""
      SELECT r_name, n_name, COUNT(*) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS total_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""")),

    // ------------------------------------------------------- shuffle join
    // TPC-H Q3 shape: filters pushed into all three scans BEFORE the join;
    // customer→orders is broadcastable after the segment filter at small SF
    // (AQE decides at runtime); orders⋈lineitem shuffles on the join key.
    Q("q3_shuffle_join", (s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      val l = lineitem(s, d).filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      val p1 = s"${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})"
      val revAggs = splitSumAggs("rev", p1, 1000000L)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(revAggs.head, revAggs.tail: _*)
        .select(col("o_orderkey"), col("o_orderdate"),
          splitSumValue("rev", 1000000L, 10000L).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
    }, Some("""
      SELECT o_orderkey, o_orderdate,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-01'
        AND l_shipdate  > TIMESTAMP '1997-06-01'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 20"""), headline = true),

    // ---------------------------------------------------------- semi join
    // EXISTS → left_semi: no payload from the right side is materialized,
    // and Spark dedups build-side keys — right plan at any scale.
    Q("q_join_semi", (s, d) => {
      orders(s, d)
        .join(lineitem(s, d).filter(col("l_quantity") > 45).select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      ORDER BY o_orderkey""")),

    // ---------------------------------------------------------- anti join
    Q("q_join_anti", (s, d) => {
      customer(s, d)
        .join(orders(s, d).filter(col("o_orderstatus") === "F").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey""")),

    // ---------------------------------------------------------- as-of join
    // For each click, the latest error by the same user at-or-before its ts.
    // Spark lacks ASOF JOIN; the scalable composition is union-tag + one
    // window pass: a SINGLE shuffle on user_id (vs the naive
    // join+groupBy-max which shuffles twice and explodes on skewed users).
    // DuckDB oracle uses its native ASOF LEFT JOIN.
    Q("q_asof_join", (s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(1).as("tag"), lit(null).cast("timestamp").as("e_ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
          lit(0).as("tag"), col("ts").as("e_ts"))
      // tag=0 (error) sorts before tag=1 (click) at equal ts → ties are
      // inclusive, matching ASOF's `c.ts >= e.ts`.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("tag").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      errors.unionByName(clicks)
        .withColumn("err_ts", last(col("e_ts"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("ts"), col("err_ts"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           errors AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
      SELECT c.event_id, c.user_id, c.ts, e.ts AS err_ts
      FROM clicks c ASOF LEFT JOIN errors e
        ON c.user_id = e.user_id AND c.ts >= e.ts
      ORDER BY c.event_id"""), headline = true),

    // -------------------------------------------------------- top-k / sort
    // TakeOrderedAndProject: per-partition top-k then a k-row merge on the
    // driver — never a full global sort at scale.
    Q("q_topk", (s, d) => {
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10""")),

    // --------------------------------------------------- window functions
    // rank/lag/lead/running-sum; one shuffle on o_custkey, sort within
    // partitions. Unique (o_orderdate, o_orderkey) tie-break ⇒ frame order
    // is total, so lag/lead/running values are engine-independent.
    Q("q_window_rank", (s, d) => {
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(byDate).as("rn"),
          rank().over(byPrice).as("price_rank"),
          lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
          lead(col("o_totalprice"), 1).over(byDate).as("next_price"),
          sum(decM(col("o_totalprice")))
            .over(byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"))
        .orderBy(col("o_custkey"), col("rn"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER wd AS rn,
             RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
             LAG(o_totalprice, 1)  OVER wd AS prev_price,
             LEAD(o_totalprice, 1) OVER wd AS next_price,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
      FROM orders
      WINDOW wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, rn"""), headline = true),

    // ------------------------------------------------------------ set ops
    Q("q_intersect", (s, d) => {
      val c = customer(s, d)
      c.filter(col("c_acctbal") > 5000).select(col("c_nationkey"))
        .intersect(c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey")))
        .orderBy(col("c_nationkey"))
    }, Some("""
      SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      ORDER BY c_nationkey""")),

    Q("q_except", (s, d) => {
      val c = customer(s, d)
      c.select(col("c_nationkey"))
        .except(c.filter(col("c_acctbal") < -900).select(col("c_nationkey")))
        .orderBy(col("c_nationkey"))
    }, Some("""
      SELECT c_nationkey FROM customer
      EXCEPT
      SELECT c_nationkey FROM customer WHERE c_acctbal < -900
      ORDER BY c_nationkey""")),

    // ------------------------------------------------------- distinct agg
    Q("q_distinct_agg", (s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_partkey) AS nd_parts,
             COUNT(DISTINCT l_suppkey) AS nd_supp,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------------------ rollup / cube
    Q("q_rollup", (s, d) => {
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }, Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    Q("q_cube", (s, d) => {
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ------------------------------------------------------- scalar: string
    Q("q_string_funcs", (s, d) => {
      part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        lower(col("p_brand")).as("brand_lo"),
        substring(col("p_type"), 1, 5).as("type5"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "a", "@").as("name_rep"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        col("p_name").like("a%").as("starts_a"))
        .orderBy(col("p_partkey"))
    }, Some("""
      SELECT p_partkey,
             UPPER(p_name) AS name_up, LOWER(p_brand) AS brand_lo,
             SUBSTR(p_type, 1, 5) AS type5, LENGTH(p_name) AS name_len,
             p_brand || '#' || p_type AS brand_type,
             REPLACE(p_name, 'a', '@') AS name_rep,
             LPAD(p_brand, 12, '*') AS brand_pad,
             p_name LIKE 'a%' AS starts_a
      FROM part ORDER BY p_partkey""")),

    // --------------------------------------------------------- scalar: date
    Q("q_date_funcs", (s, d) => {
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             CAST(day(o_orderdate) AS INT) AS dy,
             CAST(quarter(o_orderdate) AS INT) AS qtr,
             CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since
      FROM orders ORDER BY o_orderkey""")),

    // --------------------------------------------------------- scalar: math
    Q("q_math_funcs", (s, d) => {
      part(s, d).select(
        col("p_partkey"),
        sqrt(col("p_retailprice")).as("sq"),
        floor(col("p_retailprice")).cast("long").as("fl"),
        ceil(col("p_retailprice")).cast("long").as("ce"),
        abs(col("p_retailprice") - lit(1000.0)).as("ab"),
        (col("p_partkey") % 7).as("md"),
        round(col("p_retailprice"), 4).as("rd4"),
        signum(col("p_retailprice") - lit(1000.0)).cast("int").as("sgn"))
        .orderBy(col("p_partkey"))
    }, Some("""
      SELECT p_partkey,
             SQRT(p_retailprice) AS sq,
             CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
             CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
             ABS(p_retailprice - 1000.0) AS ab,
             p_partkey % 7 AS md,
             ROUND(p_retailprice, 4) AS rd4,
             CAST(SIGN(p_retailprice - 1000.0) AS INT) AS sgn
      FROM part ORDER BY p_partkey""")),

    // --------------------------------------------------- CASE + JSON access
    Q("q_case_json", (s, d) => {
      events(s, d).select(
        col("event_id"),
        when(col("value") > 10, "high").when(col("value") > 5, "mid")
          .otherwise("low").as("band"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id,
             CASE WHEN value > 10 THEN 'high' WHEN value > 5 THEN 'mid' ELSE 'low' END AS band,
             CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events ORDER BY event_id""")),

    // ------------------------------------------------------------- HAVING
    Q("q_having", (s, d) => {
      events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .filter(col("n") > 70)
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total
      FROM events GROUP BY user_id HAVING COUNT(*) > 70
      ORDER BY user_id""")),

    // ---------------------------------------------------- scalar subquery
    // The 1-row aggregate is broadcast and compared on executors — no
    // driver-side collect, works unchanged at 100 TB.
    Q("q_subquery_scalar", (s, d) => {
      val o = orders(s, d)
      val avgp = o.agg(davg(col("o_totalprice")).as("avg_price"))
      o.crossJoin(broadcast(avgp))
        .filter(col("o_totalprice") > col("avg_price"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) FROM orders)
      ORDER BY o_orderkey"""))
  )
}
