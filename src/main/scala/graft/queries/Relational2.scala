package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._
import QueryDsl._

/** Relational corpus, part 2 — outer/cross joins, grouping sets, discrete
  * percentiles, argmax, IN/NOT-IN subqueries, window frames, ordered array
  * aggregation, conditional aggregation, range join, approx distinct.
  *
  * Same determinism contract as [[Relational]]; notes per query describe
  * the 100 TB plan shape.
  */
object Relational2 {

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------- left join
    // Dim-side broadcast; fact side streams. COALESCE for the null branch.
    Q("q_join_left", (s, d) => {
      customer(s, d)
        .join(orders(s, d).filter(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_f"), dsum(col("o_totalprice")).as("spent_f")),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_f"), lit(0L)).as("n_f"),
          coalesce(col("spent_f"), lit(0.0d)).as("spent_f"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey,
             COALESCE(n_f, 0) AS n_f,
             COALESCE(spent_f, 0.0) AS spent_f
      FROM customer LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_f,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS spent_f
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) o
        ON c_custkey = o_custkey
      ORDER BY c_custkey""")),

    // ------------------------------------------------------ full outer join
    // Nation-level: customers vs suppliers per nation; either side may be
    // missing. Both sides pre-aggregated to 25 rows → trivially broadcast.
    Q("q_join_full", (s, d) => {
      val cn = customer(s, d).groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      val sn = supplier(s, d).groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }, Some("""
      SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
             COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        ON c.c_nationkey = s.s_nationkey
      ORDER BY nationkey""")),

    // ----------------------------------------------------------- cross join
    // Deliberate tiny×tiny (5×5) — the only sane cross join at any scale.
    Q("q_join_cross", (s, d) => {
      val r = region(s, d)
      r.as("a").crossJoin(r.as("b"))
        .select(col("a.r_name").as("ra"), col("b.r_name").as("rb"))
        .orderBy(col("ra"), col("rb"))
    }, Some("""
      SELECT a.r_name AS ra, b.r_name AS rb
      FROM region a CROSS JOIN region b
      ORDER BY ra, rb""")),

    // -------------------------------------------------------- grouping sets
    Q("q_grouping_sets", (s, d) => {
      orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // -------------------------------------------- discrete percentiles (topk)
    // Engine-independent by construction: the ceil(p·n)-th smallest VALUE
    // per group — integer ranks, no interpolation FP.
    //
    // SCALE: computed via operators.Quantiles — the (group, value)
    // HISTOGRAM path. o_orderpriority has 5 values, so a rank window over
    // the raw rows would land the whole table on 5 reducers; instead only
    // distinct (priority, price) pairs shuffle and the cumulative window
    // runs over the histogram (bounded by the price domain, not the row
    // count). QuantilesSpec proves value-equality with the rank-window
    // SEMANTIC SPEC, which the oracle below states directly; the sketch
    // companion for when approximation is acceptable is q_approx_quantile.
    Q("q_percentile_disc", (s, d) => {
      graft.operators.Quantiles.groupPercentilesDisc(
        orders(s, d), "o_orderpriority", "o_totalprice",
        Seq("p50" -> 0.5, "p90" -> 0.9))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
      SELECT o_orderpriority,
             MIN(o_totalprice) AS p50, MAX(o_totalprice) AS p90
      FROM ranked
      WHERE rn = CEIL(n * 0.5) OR rn = CEIL(n * 0.9)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------ percentiles, bucketed two-level
    // The NEAR-CONTINUOUS-domain path (Quantiles.groupPercentilesDiscBucketed):
    // o_totalprice is near-unique per group, exactly where the one-level
    // histogram degenerates — coarse bucket counts bound the window at
    // `buckets` rows per group, exact refinement runs only inside each
    // percentile's target bucket. Same discrete definition, so the SAME
    // rank-window oracle as q_percentile_disc applies verbatim.
    Q("q_percentile_bucketed", (s, d) => {
      graft.operators.Quantiles.groupPercentilesDiscBucketed(
        orders(s, d), "o_orderpriority", "o_totalprice",
        Seq("p50" -> 0.5, "p90" -> 0.9), buckets = 64)
        .orderBy(col("o_orderpriority"))
    }, Some("""
      WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
      SELECT o_orderpriority,
             MIN(o_totalprice) AS p50, MAX(o_totalprice) AS p90
      FROM ranked
      WHERE rn = CEIL(n * 0.5) OR rn = CEIL(n * 0.9)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- argmax
    // Deterministic arg-max as a partial-aggregate struct-max: maximizing
    // (o_totalprice, -o_orderkey) lexicographically ≡ rank 1 under
    // (o_totalprice DESC, o_orderkey ASC) — but it map-side combines to one
    // row per group per partition, so only |groups|·P tiny rows shuffle.
    // The rank-window formulation would land the whole table on 5 reducers
    // (o_orderpriority has 5 values); max_by/arg_max are tie-arbitrary in
    // both engines, so neither is oracle-safe. The oracle keeps the window
    // formulation as the semantic spec — same rows, different plan.
    Q("q_argmax", (s, d) => {
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(max(struct(col("o_totalprice").as("p"), (-col("o_orderkey")).as("nk"))).as("m"))
        .select(col("o_orderpriority"), (-col("m.nk")).as("top_order"),
          col("m.p").as("top_price"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority, o_orderkey AS top_order, o_totalprice AS top_price
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders)
      WHERE rn = 1 ORDER BY o_orderpriority""")),

    // --------------------------------------------------------- IN subquery
    // IN → left_semi; build side deduped, payload-free.
    Q("q_in_subquery", (s, d) => {
      orders(s, d)
        .join(customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      ORDER BY o_orderkey""")),

    // ------------------------------------------------------ NOT IN subquery
    // Keys are non-null here, so NOT IN ≡ left_anti (the null-poisoning
    // NOT IN trap is documented; with nullable keys use NOT EXISTS).
    Q("q_not_in_subquery", (s, d) => {
      part(s, d)
        .join(lineitem(s, d).filter(col("l_quantity") >= 49)
          .select(col("l_partkey")),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    }, Some("""
      SELECT p_partkey, p_name FROM part
      WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      ORDER BY p_partkey""")),

    // -------------------------------------------------------- window frames
    // first/last/nth over explicit ROWS frames with a total order.
    Q("q_window_frames", (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val trailing = w.rowsBetween(-2, Window.currentRow)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(whole).as("first_price"),
          last(col("o_totalprice")).over(whole).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(whole).as("second_price"),
          count(lit(1)).over(trailing).as("trailing3"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
             FIRST_VALUE(o_totalprice) OVER wfull AS first_price,
             LAST_VALUE(o_totalprice)  OVER wfull AS last_price,
             NTH_VALUE(o_totalprice, 2) OVER wfull AS second_price,
             COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS trailing3
      FROM orders
      WINDOW wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""")),

    // ------------------------------------------------- ordered array agg
    // Deterministic list aggregation: sort the collected array (collect_list
    // order is partition-dependent; sort_array makes it canonical). The
    // output is serialized to a CSV string — the driver's pandas comparator
    // can't hash list cells, and a canonical string is engine-portable.
    Q("q_array_agg", (s, d) => {
      nation(s, d)
        .join(customer(s, d).filter(col("c_acctbal") > 9900),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          expr("array_join(transform(sort_array(collect_list(c_custkey)), x -> cast(x as string)), ',')")
            .as("rich_custs"),
          count(lit(1)).as("n"))
        .orderBy(col("n_name"))
    }, Some("""
      SELECT n_name,
             array_to_string(list_sort(list(c_custkey)), ',') AS rich_custs,
             COUNT(*) AS n
      FROM nation JOIN customer ON n_nationkey = c_nationkey
      WHERE c_acctbal > 9900
      GROUP BY n_name ORDER BY n_name""")),

    // ------------------------------------------------ conditional aggregation
    // Pivot-style counts/sums via FILTER/CASE — one scan, one tiny group.
    Q("q_conditional_agg", (s, d) => {
      events(s, d)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0d)))
            .as("purchase_value"))
        .filter(col("n_purchase") > 0)
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id,
             COUNT(*) FILTER (event_type = 'click') AS n_click,
             COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
             CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
                           AS DECIMAL(12,4))) AS DOUBLE) AS purchase_value
      FROM events GROUP BY user_id HAVING COUNT(*) FILTER (event_type = 'purchase') > 0
      ORDER BY user_id""")),

    // ----------------------------------------------------------- range join
    // Clicks within 1 h after an error by the same user: equi-join on
    // user_id + range predicate. At 100 TB: bucket both sides by
    // (user_id, time_bucket) so the range probe stays partition-local.
    Q("q_range_join", (s, d) => {
      val ev = events(s, d)
      val err = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
          col("event_id").as("e_id"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      err.join(clk,
        col("e_user") === col("c_user") &&
          col("c_ts") >= col("e_ts") &&
          col("c_ts") <= col("e_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("e_id"))
        .agg(count(lit(1)).as("clicks_after"))
        .orderBy(col("e_id"))
    }, Some("""
      SELECT e.event_id AS e_id, COUNT(*) AS clicks_after
      FROM events e JOIN events c
        ON e.user_id = c.user_id
       AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 1 HOUR
      WHERE e.event_type = 'error' AND c.event_type = 'click'
      GROUP BY e.event_id ORDER BY e_id""")),

    // ------------------------------------------------------ array functions
    // Array-typed intermediates, string-serialized outputs: the driver's
    // pandas comparator can't hash list cells, so first3/sorted5 go through
    // array_join (≡ DuckDB array_to_string) — same values, portable hash.
    Q("q_array_funcs", (s, d) => {
      documents(s, d)
        .filter(col("doc_id") < 100)
        .withColumn("toks", expr("split(lower(text), ' ')"))
        .select(
          col("doc_id"),
          expr("size(toks)").as("n"),
          expr("array_contains(toks, 'spark')").as("has_spark"),
          expr("array_position(toks, 'data')").as("pos_data"),
          expr("element_at(toks, 1)").as("first_tok"),
          expr("element_at(toks, -1)").as("last_tok"),
          expr("array_join(slice(toks, 1, 3), '|')").as("first3"),
          expr("array_join(array_sort(array_distinct(slice(toks, 1, 5))), '|')").as("sorted5"),
          expr("array_join(slice(toks, 1, 3), '-')").as("joined3"),
          expr("array_max(transform(toks, t -> length(t)))").as("max_len"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                 FROM documents WHERE doc_id < 100)
      SELECT doc_id,
             len(toks) AS n,
             list_contains(toks, 'spark') AS has_spark,
             CAST(COALESCE(list_position(toks, 'data'), 0) AS BIGINT) AS pos_data,
             toks[1] AS first_tok,
             toks[-1] AS last_tok,
             array_to_string(toks[1:3], '|') AS first3,
             array_to_string(list_sort(list_distinct(toks[1:5])), '|') AS sorted5,
             array_to_string(toks[1:3], '-') AS joined3,
             list_max(list_transform(toks, t -> length(t))) AS max_len
      FROM t ORDER BY doc_id""")),

    // --------------------------------------------------------------- pivot
    // Explicit value list ⇒ deterministic output columns AND no extra
    // values-discovery job — the required form at scale (implicit pivot
    // first runs a distinct over the whole input).
    Q("q_pivot", (s, d) => {
      events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id,
             COUNT(*) FILTER (event_type = 'click') AS click,
             COUNT(*) FILTER (event_type = 'error') AS error,
             COUNT(*) FILTER (event_type = 'purchase') AS purchase,
             COUNT(*) FILTER (event_type = 'signup') AS signup,
             COUNT(*) FILTER (event_type = 'view') AS view
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // ------------------------------------------------------------- unpivot
    // Wide → long via stack (Spark's unpivot form); per-row only.
    Q("q_unpivot", (s, d) => {
      lineitem(s, d)
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("stack(2, 'quantity', l_quantity, 'extendedprice', l_extendedprice) AS (measure, val)"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
    }, Some("""
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
      FROM lineitem WHERE l_orderkey <= 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
      FROM lineitem WHERE l_orderkey <= 100
      ORDER BY l_orderkey, l_linenumber, measure""")),

    // ------------------------------------------------------ null handling
    // NULL-aware scalar + aggregate semantics: nullif/coalesce, the
    // null-skipping count(col) vs count(*), null-safe equality.
    Q("q_null_handling", (s, d) => {
      customer(s, d)
        .withColumn("pos_bal",
          when(col("c_acctbal") >= 0, col("c_acctbal")).otherwise(lit(null)))
        .withColumn("seg2",
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")))
        .groupBy(col("c_nationkey"))
        .agg(
          count(lit(1)).as("n"),
          count(col("pos_bal")).as("n_pos"),
          dsum(coalesce(col("pos_bal"), lit(0.0d))).as("sum_pos"),
          count(when(col("seg2") === "OTHER", 1)).as("n_other"))
        .orderBy(col("c_nationkey"))
    }, Some("""
      SELECT c_nationkey,
             COUNT(*) AS n,
             COUNT(CASE WHEN c_acctbal >= 0 THEN c_acctbal END) AS n_pos,
             CAST(SUM(CAST(COALESCE(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0)
                           AS DECIMAL(12,4))) AS DOUBLE) AS sum_pos,
             COUNT(CASE WHEN COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') = 'OTHER'
                        THEN 1 END) AS n_other
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ------------------------------------------- approx distinct (sketch)
    // HLL++ parameters differ per engine, so the raw sketch value has no SQL
    // oracle. Instead the query emits the exact distinct (oracle-checked)
    // plus a deterministic sketch-sanity flag: Spark's HLL++ is
    // deterministic for fixed input, so |approx-exact| <= 15%·exact is a
    // stable boolean the oracle can assert as TRUE. At 100 TB the sketch
    // replaces exact distinct when mergeability matters (rsd default 5%).
    Q("q_approx_distinct", (s, d) => {
      events(s, d)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users").cast("double") * 0.15).as("approx_ok"),
          col("n"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type,
             COUNT(DISTINCT user_id) AS exact_users,
             TRUE AS approx_ok,
             COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------- approx quantile (sketch)
    // Same pattern as q_approx_distinct: the KLL/GK-style sketch value has
    // no cross-engine oracle, so the query emits the EXACT discrete p50
    // (rank-picked actual data value — bitwise portable, oracle-checked)
    // plus a sketch-sanity flag: approx_percentile is deterministic for
    // fixed input, and |approx − exact| ≤ 10% of the exact is asserted
    // TRUE. At 100 TB the sketch is the one-pass mergeable path; the exact
    // rank pick is the verification baseline.
    Q("q_approx_quantile", (s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      val exact = events(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .filter(col("rn") === ceil(col("n") * 0.5))
        .groupBy(col("event_type"))
        .agg(min(col("value")).as("exact_p50"), min(col("n")).as("n"))
      val approx = events(s, d)
        .groupBy(col("event_type"))
        .agg(expr("approx_percentile(value, 0.5, 1000)").as("ap50"))
      exact.join(approx, "event_type")
        .select(col("event_type"), col("exact_p50"),
          (abs(col("ap50") - col("exact_p50")) <=
            abs(col("exact_p50")) * 0.1).as("approx_ok"),
          col("n"))
        .orderBy(col("event_type"))
    }, Some("""
      WITH ranked AS (
        SELECT event_type, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events)
      SELECT event_type, MIN(value) AS exact_p50, TRUE AS approx_ok, MIN(n) AS n
      FROM ranked WHERE rn = CEIL(n * 0.5)
      GROUP BY event_type ORDER BY event_type""")),

    // ---------------------------------------------------- MERGE / upsert
    // Batch MERGE semantics (the engine's CDC-apply story): a delta of
    // updates + inserts full-outer-joins the base on the key; COALESCE
    // picks the surviving value and the action is derivable from the null
    // sides. One shuffle on the key (or zero with co-bucketed tables —
    // BucketingSpec); arithmetic is the same single double op both
    // engines. The delta here is derived deterministically from the base.
    Q("q_merge_upsert", (s, d) => {
      val base = customer(s, d)
        .select(col("c_custkey").as("k"), col("c_acctbal"))
      val updates = customer(s, d).filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("k"), (col("c_acctbal") + 100.0d).as("new_bal"))
      val inserts = customer(s, d).filter(col("c_custkey") % 97 === 0)
        .select((col("c_custkey") + 1000000L).as("k"), lit(50.0d).as("new_bal"))
      val delta = updates.unionByName(inserts)
      base.as("b").join(delta.as("d"), Seq("k"), "full_outer")
        .select(col("k"),
          when(col("d.new_bal").isNull, "kept")
            .when(col("b.c_acctbal").isNull, "inserted")
            .otherwise("updated").as("action"),
          coalesce(col("d.new_bal"), col("b.c_acctbal")).as("bal"))
        .orderBy(col("k"))
    }, Some("""
      WITH delta AS (
        SELECT c_custkey AS k, c_acctbal + 100.0 AS new_bal
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 1000000 AS k, 50.0 AS new_bal
        FROM customer WHERE c_custkey % 97 = 0)
      SELECT COALESCE(b.c_custkey, d.k) AS k,
             CASE WHEN d.k IS NULL THEN 'kept'
                  WHEN b.c_custkey IS NULL THEN 'inserted'
                  ELSE 'updated' END AS action,
             COALESCE(d.new_bal, b.c_acctbal) AS bal
      FROM customer b FULL OUTER JOIN delta d ON b.c_custkey = d.k
      ORDER BY k""")),

    // -------------------------------------------------------- histogram
    // Fixed-bound binning (the portable width_bucket): bucket =
    // floor((v - lo) / step) clamped to [0, nbins+1] — every step is the
    // same IEEE double op on both engines, so bucket assignment is exact.
    // Map-side-combinable groupBy on a small int key: the classic
    // distribution profile at any scale.
    Q("q_histogram", (s, d) => {
      events(s, d)
        .withColumn("bucket", expr(
          "greatest(0L, least(11L, CAST(floor((value - 0.0d) / 50.0d) AS BIGINT) + 1))"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy(col("bucket"))
    }, Some("""
      SELECT GREATEST(0, LEAST(11, CAST(FLOOR((value - 0.0) / 50.0) AS BIGINT) + 1)) AS bucket,
             COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
      FROM events GROUP BY bucket ORDER BY bucket"""))
  )
}
