package graft

/** Whole-registry plan audit: no query may plan an unexpected cartesian
  * product, and every query must keep its scan columnar (parquet) —
  * the "would this survive 100×" smoke test, automated. */
class PlanSanitySpec extends SparkSpec {

  // pair-generators that intentionally cross small/bounded sides:
  //  - q_join_cross: 5×5 regions by design
  //  - x_dedup_embedding: all-pairs oracle baseline (LSH is the scale path)
  //  - x_ann_brute_topk: broadcast query set × corpus (BroadcastNestedLoop)
  //  - q_subquery_scalar: broadcast 1-row aggregate
  // x_ann_pq broadcast-scans queries × CODES (8 ints/row, the PQ point) —
  // same shape as brute, so it shares the exemption.
  private val allowedCartesian =
    Set("q_join_cross", "x_dedup_embedding", "x_ann_brute_topk",
      "q_subquery_scalar", "x_ann_pq", "x_ann_brute_l2")

  // the only queries that stage an intermediate relation (Tables.stage =
  // localCheckpoint) and therefore legitimately read "Scan ExistingRDD":
  // all three go through TextDedup's staged shingle/band relations.
  private val stagedQueries =
    Set("x_dedup_ngram_jaccard", "x_dedup_minhash_lsh", "x_pipeline_curate",
      "x_dedup_simhash_pairs", "x_dedup_incremental", "x_dedup_containment",
      // read ONLY their staged tf relations since corpus stats moved off
      // the second corpus scan (rescans existed solely to count/sum).
      "x_tfidf_topk", "x_bm25_terms",
      // ImageDedup stages the (id, hash) relation — it feeds both sides
      // of the banded self-join, so the visible plan starts there
      // (x_dedup_audio reuses the same generic pair machinery;
      // x_dedup_image_rot is the same join over canonical D4 hashes).
      "x_dedup_image", "x_dedup_audio", "x_dedup_image_rot",
      // containmentPairs stages the (id, sh) relation itself since r13
      // (it feeds the index AND both verify sides — unstaged, media
      // callers re-decoded 3×), so every containment query's visible
      // plan starts at the staged relation.
      "x_dedup_audio_trim", "x_dedup_audio_resample", "x_dedup_audio_cdc",
      "x_dedup_video", "x_dedup_video_percept", "x_dedup_image_crop",
      "x_dedup_image_keypoint",
      // Ann.lshSelfPairs stages the signature relation for the same
      // one-relation-feeds-both-sides reason.
      "x_dedup_embedding_lsh",
      // TextDedup.repeatedSpans stages the window-hash relation (feeds the
      // duplicate aggregate AND the probe); the visible plan starts there.
      "x_dedup_substring",
      // Ann.semanticDedup stages the assigned relation (feeds both sides
      // of the within-cluster pair join and the final flag join).
      "x_dedup_semantic",
      // Ann.knnGraph stages the signature relation (both self-join sides).
      "x_knn_graph",
      // Graph.triangleCounts stages the canonical edge and oriented
      // relations (each feeds 2-3 join sides) — the visible plan starts
      // at the staged edges.
      "x_graph_triangles",
      // Ranking.importanceScores stages the (doc, bucket, tf) projection
      // (feeds the bucket-weight aggregate AND the scoring probe).
      "x_importance_weights",
      // Subword.docSubwordCounts stages the tf projection (feeds the
      // distinct-word tokenize relation AND the per-doc aggregate);
      // docBpeCounts is the same shape with the BPE token table.
      "x_pack_subword", "x_pack_bpe", "x_pack_unigram",
      // x_token_compression stages the (word, occ) dictionary once — all
      // three tokenizer tables and the weighted totals read it.
      "x_token_compression",
      // Ranking.qualityClassifier stages the feature projection (feeds
      // the weight aggregate AND the scoring probe).
      "x_quality_classifier",
      // Ranking.lmQualityScores stages the bigram tf projection (feeds
      // the LM/context rollups AND the scoring join — one corpus scan).
      "x_quality_lm",
      // Graph.incrementalTriangles reads staged pair/edge/adjacency
      // relations only (no corpus attach in the triangle contract).
      "x_triangles_incremental",
      // Graph.kCore's result is the degree aggregate over the FINAL
      // peel round's staged arc relation — the loop stages per round
      // (the CC discipline), so the visible plan starts there.
      "x_graph_kcore",
      // Graph.labelPropagation's result IS the final staged round's
      // label relation (same per-round staging discipline).
      "x_graph_lpa",
      // x_pipeline_modern stages the cleaned corpus once (the one corpus
      // scan, through the span machinery); every later stage reads it or
      // a staged derivative, so the visible plan starts at staged
      // relations.
      "x_pipeline_modern",
      // x_pipeline_web stages the extracted relation and its bigram tf —
      // every later stage reads one of them.
      "x_pipeline_web",
      // x_pipeline_crawl stages the page relation (the replica-planting
      // prev-join runs once), the domain-cap keep set (feeds the extract
      // join AND the final domain attach), the extracted relation, the
      // PII-redacted relation (feeds the LM tf AND the dedup digest),
      // its bigram tf, and the digest relation — the visible plan is
      // staged-only.
      "x_pipeline_crawl",
      // x_pipeline_warc is the same chain fed from the staged WARC-parsed
      // relation — its ONE data scan is the binaryFile WARC read inside
      // the staging job (WARC is the interchange boundary; the parquet
      // scan lives in the producing write), so the visible plan is
      // staged-only by construction.
      "x_pipeline_warc",
      // x_warc_redirects stages the parsed (uri, status, location)
      // relation — it feeds BOTH the alias extraction and the page
      // map; same WARC-interchange-boundary reasoning as above.
      "x_warc_redirects",
      // x_quality_lm5 is x_quality_lm's staged-tf shape at order 5.
      "x_quality_lm5",
      // Sentences.spanDedup stages the sentence relation (feeds the
      // span keys AND the reassembly aggregate).
      "x_dedup_sentence",
      // x_domain_cap_incremental stages the (id, domain) projection —
      // it feeds the pre-batch counts, the post-fold counts, AND the
      // batch probe (three consumers, one corpus scan).
      "x_domain_cap_incremental",
      // x_trap_incremental stages the (id, host, dg, uh) projection —
      // the same three-consumer shape (pre scores, post scores, batch
      // probe; one corpus scan).
      "x_trap_incremental",
      // x_robots_sitemaps stages the locs⋈store relation — it feeds
      // the fetched-walk branch AND the unfetched-surface branch (two
      // consumers of the whole extraction+canonicalization chain).
      "x_robots_sitemaps",
      // x_heavy_hitters stages the tf projection (feeds the count–min
      // sketch build AND the candidate scan — one corpus scan total), so
      // the visible plan starts there.
      "x_heavy_hitters",
      // x_sketch_kmv stages the 20-row per-source sketch relation (feeds
      // both sides of the overlap pair join — one corpus scan total);
      // the diff variant reads the same staged shape.
      "x_sketch_kmv", "x_sketch_kmv_diff",
      // x_token_bpe_train's audit relation is recomputed from the staged
      // per-round dictionary relations (each round feeds the argmax, the
      // next round, and the audit), so the visible plan starts there.
      "x_token_bpe_train",
      // x_token_unigram_train's trajectory is the union of the staged
      // per-round vocab relations (each feeds the next round's literal,
      // the chars join, and the trajectory) — same discipline.
      "x_token_unigram_train",
      // x_token_wordpiece_train's audit reads the staged per-round
      // segmentations (the trainBpe discipline).
      "x_token_wordpiece_train",
      // x_quality_ccnet stages the (doc_id, lang, score100) LM-scored
      // relation — it feeds the percentile thresholds AND the bucket
      // join (two consumers, one scoring pass).
      "x_quality_ccnet",
      // x_quality_ccnet_derived stages the same scored relation keyed
      // on the DERIVED lang (trained lang-id + LM compose before it).
      "x_quality_ccnet_derived",
      // x_quality_ccnet_perlang stages predictions, keyed reference tf,
      // and the candidate scores — the per-language-LM composition.
      "x_quality_ccnet_perlang",
      // x_graph_walks stages the indexed adjacency + degree relations
      // (one corpus scan in the staging job; every hop joins BOTH), so
      // the visible plan starts there. The biased variant adds the
      // staged edge relation for the distance-1 mark join.
      "x_graph_walks", "x_graph_walks_biased",
      // x_graph_skipgrams pairs walks built from the same staged
      // adjacency/degree relations — the visible plan starts there.
      "x_graph_skipgrams",
      // x_graph_walks_multi reads the staged first-hop + (prev, node)
      // transition tables (built once; every hop equi-joins them).
      "x_graph_walks_multi")

  test("no unexpected CartesianProduct in any registered plan") {
    SparkEntry.registry.foreach { q =>
      val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      assert(!cartesian || allowedCartesian.contains(q.name),
        s"${q.name} plans a CartesianProduct:\n${plan.take(1500)}")
    }
  }

  test("every query reads via the columnar parquet scan") {
    SparkEntry.registry.foreach { q =>
      val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      val scansParquet =
        plan.contains("FileScan parquet") || plan.contains("Scan parquet")
      // Staging truncates lineage: the visible plan reads the checkpointed
      // RDD and the parquet scan lives in the producing job. Only the
      // whitelisted staging queries may rely on that shape — anything else
      // showing ExistingRDD without a parquet scan stopped reading parquet.
      val readsStagedRelation =
        stagedQueries.contains(q.name) && plan.contains("Scan ExistingRDD")
      assert(scansParquet || readsStagedRelation,
        s"${q.name} does not scan parquet:\n${plan.take(800)}")
    }
  }

  // Window functions partitioned ONLY by a low-cardinality key land the
  // whole input on |distinct keys| reducers — fine at sf0.1, a skew killer
  // at 100 TB. Documented exceptions (each names its scale path):
  //  - q_percentile_disc: since round 5 its window runs over the (group,
  //    value) histogram (operators.Quantiles), not the raw rows — the
  //    partition key is still low-cardinality but its input is bounded by
  //    the value domain;
  //  - q_approx_quantile: the window computes the EXACT anchor that
  //    verifies the sketch — at scale only the sketch side runs;
  //  - x_pack_sequences: shards IS the packing parallelism, a parameter of
  //    Curation.packSequences pinned to 8 only for the oracle fixture;
  //  - x_quality_gate: its window runs over the (lang, n_chars) HISTOGRAM
  //    (one row per distinct value — operators.Quantiles), never the
  //    corpus; partition size is bounded by the value domain. This IS the
  //    exact scale path the other exceptions point at.
  //  - q_percentile_bucketed: BOTH its windows run over bounded
  //    aggregates — the coarse one over ≤ `buckets` rows per group, the
  //    refine one over one bucket's distinct values (the two-level path
  //    that exists precisely to keep low-card windows off raw rows).
  private val allowedLowCardWindow =
    Set("q_percentile_disc", "q_approx_quantile", "x_pack_sequences",
      // x_pack_subword: same shard-window shape as x_pack_sequences —
      // shards IS the packing parallelism parameter (8 only for the
      // oracle fixture).
      "x_quality_gate", "q_percentile_bucketed", "x_pack_subword",
      // x_pack_bpe / x_pack_unigram / x_pipeline_modern: the same
      // shard-window pack step (shards = the packing parallelism
      // parameter, 8 for the fixture).
      "x_pack_bpe", "x_pack_unigram", "x_pipeline_modern",
      // x_quality_ccnet: its lang window runs over the (lang, score100)
      // HISTOGRAM (groupPercentilesDisc — one row per distinct integer
      // score, domain bounded by the 100·bits range), never the corpus.
      "x_quality_ccnet")
  private val lowCardKeys = Set("o_orderpriority", "o_orderstatus",
    "event_type", "r_name", "n_name", "c_mktsegment", "l_returnflag",
    "l_linestatus", "shard", "lang", "source")

  test("no new query windows over a low-cardinality partition key") {
    SparkEntry.registry.foreach { q =>
      val logical = q.fn(spark, sf("sf0.001")).queryExecution.optimizedPlan
      val offending = logical.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.nonEmpty &&
              w.partitionSpec.flatMap(_.references.map(_.name))
                .forall(lowCardKeys) => w
      }
      assert(offending.isEmpty || allowedLowCardWindow.contains(q.name),
        s"${q.name} windows over a low-cardinality key (whole input onto " +
          s"|keys| reducers at scale): ${offending.map(_.partitionSpec).mkString("; ")}")
    }
  }

  // Per-row array-expression CPU lints (round-5 verdict): shapes that are
  // hash-correct but quadratic per row, which at 100 TB burn cores and put
  // a single long document's ~10^9 serial comparisons on one task.
  //  - `filter(a, x -> array_contains(b, x))` is an O(|A|·|B|) per-pair
  //    scan; `array_intersect` (hash-based, ≡ for distinct arrays) is the
  //    replacement — TextDedup.verifyJaccard et al.
  //  - `transform(array_distinct(t), u -> … filter(t, …))` is the
  //    O(distinct·len) token count; sort + run-length (Ranking.runEndsSql)
  //    is the one-pass plan. (Staging hides upstream expressions from the
  //    analyzed plan, so unstaged consumers — x_inverted_index,
  //    x_gopher_rules — are the sentinels for shared helpers.)
  test("no per-element array_contains scan in any registered plan") {
    SparkEntry.registry.foreach { q =>
      val plan = q.fn(spark, sf("sf0.001")).queryExecution.analyzed.toString
      assert(!plan.contains("lambdafunction(array_contains("),
        s"${q.name} scans an array per element (O(|A|·|B|)); use " +
          s"array_intersect/array_except:\n${plan.take(1200)}")
    }
  }

  test("no quadratic distinct-x-filter token count in any registered plan") {
    SparkEntry.registry.foreach { q =>
      val plan = q.fn(spark, sf("sf0.001")).queryExecution.analyzed.toString
      val quadratic =
        plan.contains("transform(array_distinct(") && plan.contains("size(filter(")
      assert(!quadratic,
        s"${q.name} counts tokens via distinct×filter (O(distinct·len) per " +
          s"row); use the sorted run-length plan (Ranking.runEndsSql):\n${plan.take(1200)}")
    }
  }

  test("IVF centroid assignment plans zero Exchanges (map-side argmax)") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id").as("id"), col("embedding"))
    val assigned = graft.operators.Ann.assignToCentroids(
      e.filter(col("id") >= 10),
      e.filter(col("id") >= 10 && col("id") < 18))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment should be a shuffle-free projection:\n${plan.take(1500)}")
  }

  test("ANN top-k is two-phase aggregation, not a rank window") {
    Seq("x_ann_brute_topk", "x_ann_lsh", "x_ann_ivf").foreach { name =>
      val q = SparkEntry.registry.find(_.name == name).get
      val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name still ranks via a window (whole score vector on one reducer):\n${plan.take(1500)}")
      assert(plan.contains("partial_"),
        s"$name lost its map-side partial top-k aggregation:\n${plan.take(1500)}")
    }
  }

  test("x_ann_ivfpq probes via broadcast equi-join — no cartesian, codes never shuffle") {
    // the whole point of the composition: the probe LUT broadcasts onto a
    // hash join on cent_id, replacing x_ann_pq's whitelisted crossJoin. A
    // CartesianProduct or a codes-side Exchange here means the pruning
    // regressed to a full-scan ADC.
    val q = SparkEntry.registry.find(_.name == "x_ann_ivfpq").get
    val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"),
      s"x_ann_ivfpq regressed to a cartesian ADC scan:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"codes relation shuffled into an SMJ:\n${plan.take(1500)}")
  }

  test("x_cc_components joins components as broadcast (vertex corpus never shuffles)") {
    val q = SparkEntry.registry.find(_.name == "x_cc_components").get
    val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"componentsForVertices regressed to SMJ (corpus-side Exchange):\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("ranking queries never rescan the corpus for stats (staged tf only)") {
    // tfidf's n_docs and bm25's n_docs/total_len read slices of their
    // staged tf relations; a parquet scan reappearing means a stats
    // aggregate regressed to a second corpus pass.
    Seq("x_tfidf_topk", "x_bm25_terms").foreach { name =>
      val q = SparkEntry.registry.find(_.name == name).get
      val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllMatchIn(plan).length +
        "FileScan parquet".r.findAllMatchIn(plan).length
      assert(scans == 0,
        s"$name re-scans the corpus ($scans parquet scans):\n${plan.take(1200)}")
    }
  }

  test("x_source_mix scans the corpus at most twice (stats pass + gate pass)") {
    val q = SparkEntry.registry.find(_.name == "x_source_mix").get
    val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllMatchIn(plan).length +
      "FileScan parquet".r.findAllMatchIn(plan).length
    assert(scans <= 2,
      s"x_source_mix re-derives its per-source stats per consumer ($scans corpus scans):\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"tiny per-source relations joined via SMJ:\n${plan.take(1500)}")
  }
}
