package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._
import QueryDsl._

/** Relational corpus, part 3 — event/time-series shapes a stream-derived
  * engine needs in batch form: sessionization (gaps-and-islands), sliding
  * windows, keep-latest-per-key (CDC dedup), per-group-average filters
  * (correlated subquery), gap-filled resampling, and the distribution
  * window functions (ntile / percent_rank / cume_dist / nth_value).
  *
  * Same determinism contract as [[Relational]]: all time arithmetic is
  * integer microseconds (`unix_micros` ≡ DuckDB `epoch_us`), money goes
  * through exact decimals, and every output has a total ORDER BY.
  */
object Relational3 {

  val all: Seq[Q] = Seq(
    // ------------------------------------------------- recursive CTE (4.x)
    // Hierarchical roll-up via the engine's own WITH RECURSIVE (new in
    // Spark 4 — before it, iterative operators like graft's CC had to
    // hand-build the loop; the relational surface now states bounded
    // recursion declaratively, and DuckDB replays the identical SQL).
    // The hierarchy is the decimal trie over p_partkey (parent = key
    // div 10; keys 1-9 are roots — a stand-in for the BOM parent column
    // the TPC-H-ish schema lacks, derived deterministically from the
    // data): each part rolls up to its single-digit root; per root we
    // emit the subtree size, the exact integer p_size sum, and the max
    // depth. Every key reaches a root in ≤ ⌈log10(maxkey)⌉ steps, so
    // the recursion is provably bounded. Scale shape: each recursion
    // level is one equi-join of the frontier against the part relation
    // (pushed-filter scans; frontier shrinks as the trie narrows) — the
    // same per-level plan our hand-built iterative operators stage.
    Q("q_recursive_cte", (s, d) => {
      part(s, d).createOrReplaceTempView("part_rec")
      s.sql("""
        WITH RECURSIVE anc(key, root, depth) AS (
          SELECT p_partkey, p_partkey, 0
          FROM part_rec WHERE p_partkey < 10
          UNION ALL
          SELECT p.p_partkey, a.root, a.depth + 1
          FROM part_rec p JOIN anc a ON p.p_partkey div 10 = a.key
          WHERE p.p_partkey >= 10)
        SELECT a.root,
               COUNT(*) AS n_parts,
               CAST(SUM(CAST(p.p_size AS BIGINT)) AS BIGINT) AS size_sum,
               CAST(MAX(a.depth) AS BIGINT) AS max_depth
        FROM anc a JOIN part_rec p ON a.key = p.p_partkey
        GROUP BY a.root ORDER BY a.root""")
    }, Some("""
      WITH RECURSIVE anc(key, root, depth) AS (
        SELECT p_partkey, p_partkey, 0
        FROM part WHERE p_partkey < 10
        UNION ALL
        SELECT p.p_partkey, a.root, a.depth + 1
        FROM part p JOIN anc a ON p.p_partkey // 10 = a.key
        WHERE p.p_partkey >= 10)
      SELECT a.root,
             COUNT(*) AS n_parts,
             CAST(SUM(CAST(p.p_size AS BIGINT)) AS BIGINT) AS size_sum,
             CAST(MAX(a.depth) AS BIGINT) AS max_depth
      FROM anc a JOIN part p ON a.key = p.p_partkey
      GROUP BY a.root ORDER BY a.root""")),

    // --------------------------------------------- LATERAL subquery (top-k)
    // The correlated-table-subquery surface: each customer's two highest-
    // value orders via `, LATERAL (... ORDER BY ... LIMIT 2)` — stated
    // declaratively and DECORRELATED by Catalyst into a broadcast
    // equi-join + bounded per-group selection (verified: no per-row
    // re-execution of the subquery — the 100 TB hazard hand-written
    // lateral loops have). DuckDB runs the identical SQL. Determinism:
    // the LIMIT is tie-broken inside the subquery (price DESC, then
    // orderkey), and emitted prices are raw parquet values (no
    // arithmetic), so the rows compare bitwise.
    Q("q_lateral_topk", (s, d) => {
      customer(s, d).createOrReplaceTempView("c_lat")
      orders(s, d).createOrReplaceTempView("o_lat")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM c_lat c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM o_lat o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
    }, Some("""
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")),

    // -------------------------------------------------------- sessionization
    // Gaps-and-islands: a new session starts after a >30-minute silence.
    // One shuffle on user_id serves both the lag() and the running sum; the
    // session aggregate then groups on (user_id, session_id) — already
    // co-partitioned, no second exchange. At 100 TB this is THE
    // sessionization plan: no self-join, no driver state, skew bounded by
    // the per-user event count.
    Q("q_sessionize", (s, d) => {
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byTs))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("is_new")).over(byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          dsum(col("value")).as("session_value"))
        .orderBy(col("user_id"), col("session_id"))
    }, Some("""
      WITH lagged AS (
        SELECT user_id, event_id, ts, value,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events),
      flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM lagged),
      sessioned AS (
        SELECT user_id, ts, value,
               -- BIGINT cast: DuckDB SUM(INT) yields HUGEINT (int128), which
               -- the driver's arrow/pandas bridge renders as object/float and
               -- hash-mismatches Spark's int64. Values fit long trivially.
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, COUNT(*) AS n_events,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS session_value
      FROM sessioned
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id""")),

    // ------------------------------------------------------- sliding window
    // 10-minute windows sliding by 5: every event lands in exactly two
    // epoch-aligned windows. Spark's window() generator expands them
    // map-side; the aggregate shuffles on window start — the same partial
    // aggregation pipeline as a tumbling window, just 2× the rows into the
    // combine. (The oracle enumerates the two aligned starts explicitly.)
    Q("q_window_sliding", (s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(col("w.start").as("w_start"), col("n"), col("total"))
        .orderBy(col("w_start"))
    }, Some("""
      WITH starts AS (
        SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 300000000) AS s0,
               value FROM events),
      expanded AS (
        SELECT unnest([s0, s0 - INTERVAL 5 MINUTE]) AS w_start, value FROM starts)
      SELECT w_start, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total
      FROM expanded
      GROUP BY w_start
      ORDER BY w_start""")),

    // ------------------------------------------------- keep-latest (CDC dedup)
    // The canonical changelog-compaction op: latest record per key by
    // (ts, event_id). One shuffle on the key; row_number + filter plans as
    // a single WindowExec with no join. At scale prefer this over
    // groupBy(max) + self-join (one shuffle instead of two).
    Q("q_dedup_latest", (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id, event_id, ts, value FROM (
        SELECT user_id, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY user_id""")),

    // --------------------------------------- correlated subquery (group avg)
    // Orders above their customer's average price. The correlated scalar
    // subquery decorrelates to a window aggregate: ONE shuffle on o_custkey
    // computes the per-group average alongside the rows — vs the naive
    // aggregate + re-join which shuffles orders twice. The exact decimal
    // sum / count division is evaluated identically in both engines.
    Q("q_correlated_subquery", (s, d) => {
      val byCust = Window.partitionBy(col("o_custkey"))
      orders(s, d)
        .withColumn("cust_avg",
          sum(decM(col("o_totalprice"))).over(byCust).cast("double") /
            count(lit(1)).over(byCust))
        .filter(col("o_totalprice") > col("cust_avg"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("cust_avg"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER (PARTITION BY o_custkey) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
        FROM orders)
      WHERE o_totalprice > cust_avg
      ORDER BY o_orderkey""")),

    // ------------------------------------------------- resample + gap fill
    // Hourly event counts over the full [min, max] hour range with empty
    // hours zero-filled. The hour dimension is generated from a 1-row
    // global aggregate (sequence + explode — never a driver-side loop) and
    // broadcast against the per-hour aggregate; at 100 TB the dimension is
    // still only ~10^4 rows/year while the fact side keeps its single
    // group-by-hour shuffle.
    Q("q_resample_gapfill", (s, d) => {
      val ev = events(s, d)
      val perHour = ev
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      val hours = ev
        .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
        .select(explode(expr(
          "sequence(date_trunc('hour', mn), date_trunc('hour', mx), interval 1 hour)"))
          .as("hr"))
      // broadcast the BUILD side: Spark cannot build the preserved
      // (left) side of a left-outer join — a broadcast(hours) hint
      // there is silently dropped (HintErrorLogger) and plans a
      // shuffle join. The per-hour aggregate is the small side.
      hours
        .join(broadcast(perHour), Seq("hr"), "left")
        .select(col("hr"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("total"), lit(0.0d)).as("total"))
        .orderBy(col("hr"))
    }, Some("""
      WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS mn, date_trunc('hour', MAX(ts)) AS mx
        FROM events),
      hours AS (
        SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr FROM bounds),
      per_hour AS (
        SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total
        FROM events GROUP BY 1)
      SELECT hours.hr AS hr, COALESCE(n, 0) AS n, COALESCE(total, 0.0) AS total
      FROM hours LEFT JOIN per_hour ON hours.hr = per_hour.hr
      ORDER BY hr""")),

    // ------------------------------------- distribution window functions
    // ntile/percent_rank/cume_dist/nth_value over a total per-customer
    // order. The frame for nth_value is pinned to ROWS on both engines;
    // the (o_totalprice DESC, o_orderkey) order is unique, so every rank
    // and quantile bucket is engine-independent.
    Q("q_window_ntile", (s, d) => {
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          ntile(4).over(byPrice).as("quartile"),
          percent_rank().over(byPrice).as("pct_rank"),
          cume_dist().over(byPrice).as("cume"),
          nth_value(col("o_totalprice"), 2)
            .over(byPrice.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("second_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
             NTILE(4) OVER wp AS quartile,
             PERCENT_RANK() OVER wp AS pct_rank,
             CUME_DIST() OVER wp AS cume,
             NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_price
      FROM orders
      WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_custkey, o_orderkey""")),

    // ------------------------------------------------------ ordered funnel
    // Strict sequential funnel view → click → purchase: each stage's first
    // event must be strictly after the previous stage's. Three keyed
    // aggregations + joins all on user_id — AQE co-partitions them on one
    // exchange family, and every stage prunes its input with a pushed
    // event_type filter. min(timestamp) is order-independent →
    // engine-exact. Output: users completing the funnel, with stage times.
    Q("q_funnel", (s, d) => {
      val ev = events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v, "user_id")
        .filter(col("e.ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("t_view")).as("t_view"),
          min(col("e.ts")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c, "user_id")
        .filter(col("e.ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("t_view")).as("t_view"),
          min(col("t_click")).as("t_click"), min(col("e.ts")).as("t_purchase"))
      p.orderBy(col("user_id"))
    }, Some("""
      WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (
        SELECT e.user_id, MIN(v.t_view) AS t_view, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        WHERE e.event_type = 'click' GROUP BY e.user_id),
      p AS (
        SELECT e.user_id, MIN(c.t_view) AS t_view, MIN(c.t_click) AS t_click,
               MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      SELECT user_id, t_view, t_click, t_purchase FROM p ORDER BY user_id""")),

    // ------------------------------------------------- cohort retention
    // The weekly retention matrix: users grouped by their FIRST active
    // week (cohort), counted per week-offset of later activity. Weeks are
    // epoch-second integer buckets (ts div 604800) — no calendar
    // truncation semantics to diverge between engines. Plan: ONE per-user
    // aggregation to the distinct week set (collect_set is bounded by the
    // corpus timespan in weeks, not by event volume — a user has at most
    // ~520 distinct weeks in a decade), cohort = array_min, explode,
    // then one small aggregation: two shuffles total, and the raw event
    // volume crosses neither (map-side partial sets).
    Q("q_retention_cohort", (s, d) => {
      events(s, d)
        .select(col("user_id"),
          expr("unix_timestamp(ts) div 604800L").as("week"))
        .groupBy(col("user_id"))
        .agg(collect_set(col("week")).as("__weeks"))
        .select(explode(col("__weeks")).as("week"),
          array_min(col("__weeks")).as("cohort"))
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort"), col("week_offset"))
    }, Some("""
      WITH wk AS (
        SELECT DISTINCT user_id, CAST(epoch(ts) AS BIGINT) // 604800 AS week
        FROM events),
      c AS (SELECT user_id, week,
                   MIN(week) OVER (PARTITION BY user_id) AS cohort
            FROM wk)
      SELECT cohort, week - cohort AS week_offset,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM c GROUP BY cohort, week - cohort
      ORDER BY cohort, week_offset""")),

    // ------------------------------------------------------ SCD2 intervals
    // Slowly-changing-dimension type-2 build: each event opens a validity
    // interval closed by the user's next event (lead), open-ended on the
    // latest. One shuffle on user_id; (ts, event_id) totally orders ties.
    Q("q_scd2", (s, d) => {
      val byTs = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(byTs).as("valid_to"),
          (lead(col("ts"), 1).over(byTs).isNull).cast("int").as("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    }, Some("""
      SELECT user_id, event_id, event_type,
             ts AS valid_from,
             LEAD(ts) OVER w AS valid_to,
             CAST(LEAD(ts) OVER w IS NULL AS INT) AS is_current
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, valid_from, event_id""")),

    // ----------------------------------------- RANGE frame (time-based)
    // Trailing 1-hour per-user activity via a RANGE frame over epoch
    // seconds — the value-based frame q_window_frames' ROWS variants can't
    // express (equal timestamps share one frame; the bound is wall-clock,
    // not row-count). Integer frame bounds, decimal-exact value sum: both
    // engines agree bitwise. One shuffle on user_id.
    Q("q_window_range_frame", (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
        .rangeBetween(-3600L, 0L)
      events(s, d)
        .withColumn("es", expr("unix_micros(ts) div 1000000"))
        .select(col("user_id"), col("event_id"), col("es"),
          count(lit(1)).over(w).as("n_1h"),
          sum(expr("CAST(value AS DECIMAL(12,4))")).over(w)
            .cast("double").as("val_1h"))
        .orderBy(col("user_id"), col("es"), col("event_id"))
    }, Some("""
      SELECT user_id, event_id, epoch_us(ts) // 1000000 AS es,
             COUNT(*) OVER w AS n_1h,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER w AS DOUBLE) AS val_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, es, event_id"""))
  )
}
