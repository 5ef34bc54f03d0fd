package graft

import graft.queries.Q

/** Smoke + plan-shape checks for every registered query at sf0.001.
  *
  * Value-level correctness is owned by the driver's DuckDB oracle
  * (Verify + CORRECTNESS_r{N}.json); here we assert the *plan* is the one
  * we want at scale: pushed filters, pruned schemas, broadcast joins.
  */
class RegistrySpec extends SparkSpec {

  private def plan(q: Q): String = {
    val df = q.fn(spark, sf("sf0.001"))
    df.queryExecution.executedPlan.toString
  }

  test("every registered query returns rows at sf0.001") {
    SparkEntry.registry.foreach { q =>
      val n = q.fn(spark, sf("sf0.001")).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("registry names are unique and every oracle has a query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Lint the WHOLE registry against the round-2 bug class: DuckDB returns
  // HUGEINT (int128) for SUM over any integer type — the driver's
  // arrow/pandas bridge renders int128 as object/float and hash-mismatches
  // Spark's int64 even when every value is identical. (A bare SUM(DOUBLE)
  // is banned for the same reason: FP addition order is engine-dependent.)
  // The two accepted disciplines, per CLAUDE.md:
  //   CAST(SUM(...) AS BIGINT/DOUBLE)   — wrap the aggregate, or
  //   SUM(CAST(... AS DECIMAL(p,s)))    — exact decimal accumulate.
  test("no oracle emits a bare SUM (DuckDB HUGEINT / double-sum nondeterminism)") {
    val sumRe = "(?i)\\bSUM\\s*\\(".r
    val bad = SparkEntry.oracleSql.toSeq.flatMap { case (name, rawSql) =>
      val sql = rawSql.replaceAll("--[^\\n]*", "") // lint code, not comments
      sumRe.findAllMatchIn(sql).flatMap { m =>
        val before = sql.substring(0, m.start)
        // word-boundary + tolerant spacing: matches `CAST(` and `CAST (`,
        // rejects identifiers that merely end in ...CAST.
        val wrappedInCast =
          "(?is)\\bCAST\\s*\\(\\s*$".r.findFirstIn(before).isDefined
        // Argument must begin with a CAST to DECIMAL (window of 120 chars
        // keeps the regex from wandering past the aggregate's argument).
        val argIsDecimalCast = "(?is)^\\s*CAST\\s*\\(.{0,80}?AS\\s+DECIMAL".r
          .findFirstIn(sql.substring(m.end).take(120)).isDefined
        if (wrappedInCast || argIsDecimalCast) None
        else Some(s"$name @${m.start}: …${sql.slice(math.max(0, m.start - 20), m.end + 50).replaceAll("\\s+", " ")}…")
      }
    }
    assert(bad.isEmpty, s"bare SUMs found:\n${bad.mkString("\n")}")
  }

  // Round-11's bug class, promoted from tribal knowledge to a lint: the
  // driver's correctness comparator row-sorts with pandas, which cannot
  // hash array/map/struct cells (x_distinct_sketch + x_sketch_cms were
  // recorded `err` in CORRECTNESS_r11 for exactly this). Complex values
  // must be serialized to a scalar bijection in BOTH engines (array_join /
  // array_to_string — the q_array_agg discipline) before they leave a
  // registry query.
  test("no registry query emits a top-level array/map/struct column") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val bad = SparkEntry.registry.flatMap { q =>
      q.fn(spark, sf("sf0.001")).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"driver comparator cannot sort complex cells — serialize to string:\n${bad.mkString("\n")}")
  }

  test("p_filter_predicate pushes its predicate into the parquet scan") {
    val q = SparkEntry.registry.find(_.name == "p_filter_predicate").get
    val p = plan(q)
    assert(p.contains("PushedFilters: [IsNotNull(event_type)"), p.take(2000))
  }

  test("p_map_project prunes the scan to referenced columns only") {
    val q = SparkEntry.registry.find(_.name == "p_map_project").get
    val p = plan(q)
    // props/ts not referenced — must not be read.
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props"), readSchema)
  }

  test("q_join_broadcast uses broadcast hash joins (no shuffle join on dims)") {
    val q = SparkEntry.registry.find(_.name == "q_join_broadcast").get
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q1_agg runs a partial (map-side) aggregate before the shuffle") {
    val q = SparkEntry.registry.find(_.name == "q1_agg").get
    val p = plan(q)
    assert(p.contains("partial_"), p.take(2000))
  }

  test("q_topk plans TakeOrderedAndProject, not a global sort") {
    val q = SparkEntry.registry.find(_.name == "q_topk").get
    val p = plan(q)
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q_lateral_topk decorrelates to an equi-join (no per-row subquery loop)") {
    val q = SparkEntry.registry.find(_.name == "q_lateral_topk").get
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"LATERAL must decorrelate, not nested-loop:\n${p.take(2000)}")
  }
}
