package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables.stage

/** Reusable text-deduplication operators — the library surface behind the
  * `x_dedup_*` registry queries (graft.queries.Dedup), parameterized so a
  * pipeline can tune shingle width, signature size, similarity threshold,
  * and the document-frequency cap.
  *
  * Scale design:
  *  - candidate generation is always an equi-join on a short key (shared
  *    shingle / LSH band) — no O(n²) pair scan; exact verification runs on
  *    candidates only, against the full shingle sets, so a pruned index can
  *    never distort a reported Jaccard value (only recall, see `dfCap`);
  *  - the shingle / band relations are staged (Tables.stage): they feed
  *    both sides of a self-join and Spark has no automatic subplan reuse
  *    across self-join sides;
  *  - `dfCap` drops shingles shared by more than `cap` documents from the
  *    inverted index — ubiquitous (stopword) shingles create quadratic hot
  *    keys: one shingle in k documents emits k² candidate pairs, so at
  *    100 TB a handful of boilerplate phrases would dominate the whole
  *    join. The cap is computed with a window count over the shingle key,
  *    which the subsequent self-join already partitions by — the guard
  *    costs no additional shuffle. Pairs whose ONLY shared shingles are
  *    ubiquitous are missed: the standard, documented recall tradeoff.
  */
object TextDedup {

  /** Distinct lowercase word `n`-gram shingles: (id, sh: array<string>).
    * Staged — every consumer self-joins or reuses it. */
  def shingleRelation(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame =
    stage(shingleProjection(docs, idCol, textCol, n))

  /** The UNSTAGED shingle projection behind [[shingleRelation]] — for
    * relations that feed exactly one consumer chain and are small (a
    * streaming micro-batch), where staging would pay a parquet write (or
    * checkpoint) per call for no reuse. Anything self-joined or consumed
    * twice at corpus scale should go through [[shingleRelation]]. */
  def shingleProjection(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3): DataFrame =
    docs
      .withColumn("__toks", expr(s"split(lower($textCol), ' ')"))
      .select(col(idCol).as("id"), expr(
        s"""array_distinct(transform(
           |  sequence(1, greatest(size(__toks) - ${n - 1}, 1)),
           |  i -> concat_ws(' ', slice(__toks, i, $n))))""".stripMargin).as("sh"))

  /** Exact-Jaccard near-duplicate pairs via the inverted-index plan:
    * candidates share ≥1 (eligible) shingle, then the TRUE Jaccard over the
    * full shingle sets is computed for candidates only.
    * Output: (da, db, jaccard), da < db. */
  def jaccardPairs(shingled: DataFrame, threshold: Double,
                   dfCap: Option[Int] = None): DataFrame = {
    val ex = stage(shingled.select(col("id"), explode(col("sh")).as("s")))
    val index = dfCap match {
      case Some(cap) =>
        import org.apache.spark.sql.expressions.Window
        ex.withColumn("__df", count(lit(1)).over(Window.partitionBy(col("s"))))
          .filter(col("__df") <= cap)
          .drop("__df")
      case None => ex
    }
    val cand = index.as("a")
      .join(index.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"))
      .distinct()
    verifyJaccard(cand, shingled, threshold)
  }

  /** Staged (id, band_key) relation: `k` min-hashes in `bands` bands of
    * `k / bands` rows, one md5 band key per (id, band). The shared
    * candidate-generation index behind [[minhashLshPairs]] (self-join) and
    * [[minhashLshPairsAgainst]] (incremental new-vs-corpus join); in
    * production the corpus side is persisted once (`graft.stage.dir`) and
    * reused across ingest batches. */
  def minhashBandKeys(shingled: DataFrame, k: Int, bands: Int): DataFrame =
    stage(bandKeyProjection(shingled, k, bands))

  /** The UNSTAGED band-key projection behind [[minhashBandKeys]] — same
    * single-consumer/small-relation contract as [[shingleProjection]]
    * (a streaming micro-batch's band keys feed one join and are gone). */
  def bandKeyProjection(shingled: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    // library contract: register our native functions on whatever session
    // the caller hands us — minhash_sig is a graft extension.
    graft.functions.GraftFunctions.ensureRegistered(shingled.sparkSession)
    val rows = k / bands
    val sig = shingled.withColumn("sig", expr(s"minhash_sig(sh, $k)"))
    val bandCols = (1 to rows).map(r => s"element_at(sig, $rows*b+$r)").mkString(", ")
    sig.select(col("id"),
      explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> md5(concat(CAST(b AS STRING), '|', $bandCols)))""".stripMargin))
        .as("band_key"))
  }

  /** MinHash + banded-LSH near-duplicate pairs: `k` min-hashes in `bands`
    * bands of `k / bands` rows ([[minhashBandKeys]]); candidates share ≥1
    * band key; exact Jaccard over the full shingle sets verifies
    * candidates.
    *
    * `bandCap`: the band-key analogue of [[jaccardPairs]]' `dfCap` — a band
    * shared by m documents emits m² candidate pairs, so one boilerplate
    * cluster (or a pile of exact dups that skipped exact-dedup) can
    * dominate the whole join at 100 TB. The cap drops band keys with more
    * than `cap` members, window-counted on the join's own partitioning
    * (no extra shuffle). Pairs whose ONLY shared bands are capped are
    * missed — the standard recall tradeoff, exact dedup first is the cure.
    * Output: (da, db, jaccard), da < db. */
  def minhashLshPairs(shingled: DataFrame, k: Int = 12, bands: Int = 4,
                      threshold: Double = 0.5,
                      bandCap: Option[Int] = None): DataFrame = {
    val banded = minhashBandKeys(shingled, k, bands)
    val index = bandCap match {
      case Some(cap) =>
        import org.apache.spark.sql.expressions.Window
        banded
          .withColumn("__bf", count(lit(1)).over(Window.partitionBy(col("band_key"))))
          .filter(col("__bf") <= cap)
          .drop("__bf")
      case None => banded
    }
    val cand = index.as("a")
      .join(index.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"))
      .distinct()
    verifyJaccard(cand, shingled, threshold)
  }

  /** CONTAINMENT near-duplicate pairs: directional overlap
    * c(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| — the metric for SUBSET
    * duplication (doc A quoted/embedded inside larger doc B), which
    * symmetric Jaccard misses: a page fully contained in a 10× larger
    * page has Jaccard ≤ 0.1 but containment 1.0.
    *
    * Same inverted-index plan as [[jaccardPairs]] (shared-shingle
    * candidates under the same `dfCap` hot-key guard, exact verification
    * on candidates only); emits both directions so the caller can drop
    * the contained side. Output: (da, db, c_ab, c_ba), da < db, kept when
    * max(c_ab, c_ba) ≥ threshold. */
  def containmentPairs(shingled: DataFrame, threshold: Double,
                       dfCap: Option[Int] = None): DataFrame = {
    // stage the (id, sh) relation FIRST: it feeds the exploded index AND
    // both verify-join sides, so an unstaged payload-derived caller (the
    // media decode chains) would re-execute its decode 3× — the r13 plan
    // audit caught exactly that (only the exploded index was staged
    // before). One decode + two staged writes instead.
    val sh = stage(shingled)
    val ex = stage(sh.select(col("id"), explode(col("sh")).as("s")))
    val index = dfCap match {
      case Some(cap) =>
        import org.apache.spark.sql.expressions.Window
        ex.withColumn("__df", count(lit(1)).over(Window.partitionBy(col("s"))))
          .filter(col("__df") <= cap)
          .drop("__df")
      case None => ex
    }
    val cand = index.as("a")
      .join(index.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"))
      .distinct()
    cand
      .join(sh.as("sa"), col("da") === col("sa.id"))
      .join(sh.as("sb"), col("db") === col("sb.id"))
      // hash-based O(|A|+|B|); ≡ counting A's members in B because shingle
      // arrays are distinct by construction (shingleRelation).
      .withColumn("inter", expr("size(array_intersect(sa.sh, sb.sh))"))
      .withColumn("c_ab", expr("CAST(inter AS DOUBLE) / size(sa.sh)"))
      .withColumn("c_ba", expr("CAST(inter AS DOUBLE) / size(sb.sh)"))
      .filter(greatest(col("c_ab"), col("c_ba")) >= threshold)
      .select(col("da"), col("db"), col("c_ab"), col("c_ba"))
  }

  /** Containment pairs of a (small) batch against a persisted corpus
    * shingle index — the against-index split of [[containmentPairs]] for
    * the streaming ingest gates (audio/video dedup at ingest time).
    * `corpusShingled` is the caller-staged (id, sh) relation and
    * `corpusEx` its caller-staged exploded (id, s) index (df-cap the
    * index at BUILD time if hot shingles need guarding — per-batch
    * re-counting would rescan the corpus). Per batch: the batch explodes
    * unstaged and BROADCASTS onto the index join; the surviving
    * candidate ids + batch shingle arrays broadcast onto one scan of the
    * corpus shingle relation — the corpus never shuffles. Output:
    * (da = batch id, db = corpus id, c_ab = |∩|/|batch sh|,
    * c_ba = |∩|/|corpus sh|), thresholded on the larger containment —
    * identical arithmetic to the batch operator, so per-batch results
    * are bitwise what [[containmentPairs]] would emit for those pairs. */
  def containmentPairsAgainstIndex(batchShingled: DataFrame,
                                   corpusShingled: DataFrame,
                                   corpusEx: DataFrame,
                                   threshold: Double): DataFrame = {
    val bex = batchShingled.select(col("id").as("da"), explode(col("sh")).as("s"))
    val cand = corpusEx.join(broadcast(bex), Seq("s"))
      .select(col("da"), col("id").as("db"))
      .distinct()
    val withB = cand.join(
      broadcast(batchShingled.select(col("id").as("da"), col("sh").as("bsh"))),
      Seq("da"))
    corpusShingled.select(col("id").as("db"), col("sh").as("csh"))
      .join(broadcast(withB), Seq("db"))
      .withColumn("inter", expr("size(array_intersect(bsh, csh))"))
      .withColumn("c_ab", expr("CAST(inter AS DOUBLE) / size(bsh)"))
      .withColumn("c_ba", expr("CAST(inter AS DOUBLE) / size(csh)"))
      .filter(greatest(col("c_ab"), col("c_ba")) >= threshold)
      .select(col("da"), col("db"), col("c_ab"), col("c_ba"))
  }

  /** INCREMENTAL MinHash+LSH dedup: near-duplicate pairs between a small
    * new ingest batch and the existing corpus — the production shape at
    * 100 TB, where re-self-joining the whole corpus per ingest is absurd.
    *
    * THIS overload builds the corpus band index itself (staged once for
    * this call); it does NOT persist it across calls. For the per-batch
    * production loop (N ingest batches against one corpus version), build
    * the index ONCE with [[shingleRelation]] + [[minhashBandKeys]] in
    * `graft.stage.dir` mode and pass it to
    * [[minhashLshPairsAgainstIndex]] — the streaming driver
    * [[graft.streaming.DedupIngest]] wires exactly that shape.
    *
    * Scale contract (and why this is not just a filtered self-join):
    *  - the NEW side (a daily batch ≪ corpus) is BROADCAST onto the
    *    corpus index, so the corpus-sized relation never shuffles — the
    *    per-batch cost is one corpus scan, zero corpus exchanges; the
    *    batch's band keys are a plain unstaged projection (one consumer,
    *    no reuse to buy);
    *  - `bandCap` guards the corpus index's hot bands exactly as in the
    *    self-join case;
    *  - verification joins the (small) candidate set back to the two
    *    shingle relations; the candidate side broadcasts.
    *
    * Output: (da = new id, db = corpus id, jaccard ≥ threshold). */
  def minhashLshPairsAgainst(newShingled: DataFrame, refShingled: DataFrame,
                             k: Int = 12, bands: Int = 4,
                             threshold: Double = 0.5,
                             bandCap: Option[Int] = None): DataFrame =
    minhashLshPairsAgainstIndex(newShingled, refShingled,
      minhashBandKeys(refShingled, k, bands), k, bands, threshold, bandCap)

  /** [[minhashLshPairsAgainst]] with a CALLER-OWNED corpus band index —
    * the reuse overload for per-batch ingest: `refBandKeys` is the output
    * of `minhashBandKeys(refShingled, k, bands)` (in `graft.stage.dir`
    * mode, a persisted parquet staging table), built once per corpus
    * version and handed to every batch. Each call then costs one scan of
    * the persisted index + the batch-sized projections: zero corpus-side
    * recompute, zero corpus shuffles.
    *
    * `k`/`bands` MUST match the values the index was built with (they
    * parameterize the batch side's signatures so its band keys land in the
    * same key space). `bandCap` filters the index's hot bands per call. */
  def minhashLshPairsAgainstIndex(newShingled: DataFrame, refShingled: DataFrame,
                                  refBandKeys: DataFrame,
                                  k: Int = 12, bands: Int = 4,
                                  threshold: Double = 0.5,
                                  bandCap: Option[Int] = None): DataFrame = {
    val nb = bandKeyProjection(newShingled, k, bands)
    val index = bandCap match {
      case Some(cap) =>
        import org.apache.spark.sql.expressions.Window
        refBandKeys
          .withColumn("__bf", count(lit(1)).over(Window.partitionBy(col("band_key"))))
          .filter(col("__bf") <= cap)
          .drop("__bf")
      case None => refBandKeys
    }
    val cand = index.as("b")
      .join(broadcast(nb.as("a")), col("a.band_key") === col("b.band_key"))
      .select(col("a.id").as("da"), col("b.id").as("db"))
      .distinct()
    // the candidate side stays hinted through BOTH verify joins — without
    // the second broadcast, Catalyst's default stats on the staged corpus
    // relation pick a sort-merge join and the corpus shuffles after all.
    broadcast(cand
      .join(broadcast(newShingled.as("sa")), col("da") === col("sa.id")))
      .join(refShingled.as("sb"), col("db") === col("sb.id"))
      .withColumn("inter", expr("size(array_intersect(sa.sh, sb.sh))"))
      .withColumn("jaccard",
        expr("CAST(inter AS DOUBLE) / (size(sa.sh) + size(sb.sh) - inter)"))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** SimHash banded near-duplicate pairs — the scale path for 128-bit
    * fingerprint dedup (the per-row `simhash128` projection is the
    * signature pass; this adds candidate generation + verification).
    *
    * Pigeonhole guarantee: fingerprints within `maxHamming` bits differ in
    * at most `maxHamming` of `maxHamming + 1` equal-width bands, so at
    * least one band matches EXACTLY → candidates come from an equi-join on
    * (band index : band bit-chunk) — a short key, never an O(n²) scan —
    * and the exact 128-bit Hamming distance verifies candidates only
    * (integer-only arithmetic, so no cross-engine FP concerns). The
    * fingerprint relation is staged: it feeds both sides of the self-join.
    *
    * Verification representation: the fingerprint rides the join as TWO
    * 64-bit words (`simhash128_words` — packing ≡ the hex form, see
    * [[graft.functions.SimHash128Words]]), so the exact distance is
    * `bit_count(w0a ^ w0b) + bit_count(w1a ^ w1b)` — two fused ops per
    * pair, not 32 hex-digit parses. Correlated corpora make banding
    * recall-heavy, not precision-heavy (hot bands emit MANY candidates
    * that fail verification — measured 3.3M candidates → tens of true
    * pairs on the synthetic corpus), so the plan verifies FIRST on the
    * raw join output and dedups only the surviving near-dup pairs: the
    * wide-relation `distinct` shuffle disappears from the hot path.
    *
    * `maxHamming + 1` must divide the 32 hex chars: 0/1/3/7/15/31.
    * Output: (da, db, hamming), da < db, hamming ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 7): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val bands = maxHamming + 1
    require(32 % bands == 0,
      s"maxHamming=$maxHamming: need (maxHamming+1) | 32 (0,1,3,7,15,31)")
    val width = 32 / bands          // hex chars per band
    val chunkBits = 4 * width       // 128 / bands
    val fp = stage(docs
      .withColumn("hs",
        expr(s"transform(array_distinct(split(lower($textCol), ' ')), t -> md5(t))"))
      .withColumn("w", expr("simhash128_words(hs)"))
      .select(col(idCol).as("id"),
        expr("w[0]").as("w0"), expr("w[1]").as("w1")))
    // band key: hex chars [width·b, width·(b+1)) ≡ an aligned bit-chunk of
    // one word (bands ≥ 2 never straddle the word boundary since width | 16;
    // bands = 1 means "compare everything" — chunk = w0, verify does the
    // rest). Key = one small struct(band, chunk) instead of a string.
    val chunks = (0 until bands).map { b =>
      val wName = if (b * width < 16) "w0" else "w1"
      val posInWord = (b * width) % 16
      val chunk =
        if (chunkBits >= 64) wName
        else {
          val shift = 64 - chunkBits * (posInWord / width + 1)
          s"shiftrightunsigned($wName, $shift) & ${(1L << chunkBits) - 1}L"
        }
      s"named_struct('b', $b, 'c', $chunk)"
    }
    val banded = fp.select(col("id"), col("w0"), col("w1"),
      explode(expr(s"array(${chunks.mkString(", ")})")).as("bk"))
    val verified = banded.as("a")
      .join(banded.as("b"), col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        expr("bit_count(a.w0 ^ b.w0) + bit_count(a.w1 ^ b.w1)")
          .cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    // a pair within maxHamming can match on SEVERAL bands — dedup the
    // (tiny) verified set, never the candidate fan-out.
    verified.distinct()
  }

  /** Exact verification: true Jaccard over the FULL shingle sets for the
    * candidate pairs only. The intersection is `array_intersect` —
    * hash-based O(|A|+|B|) per pair, and ≡ counting A's members in B
    * because shingle arrays are distinct by construction (the former
    * per-element `array_contains` scan was O(|A|·|B|), the dominant
    * per-pair cost in every dedup verify). */
  private def verifyJaccard(cand: DataFrame, shingled: DataFrame,
                            threshold: Double): DataFrame =
    cand
      .join(shingled.as("sa"), col("da") === col("sa.id"))
      .join(shingled.as("sb"), col("db") === col("sb.id"))
      .withColumn("inter", expr("size(array_intersect(sa.sh, sb.sh))"))
      .withColumn("jaccard",
        expr("CAST(inter AS DOUBLE) / (size(sa.sh) + size(sb.sh) - inter)"))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))

  /** C4-style cross-document line deduplication: remove every "line" that
    * occurs (by content hash) in ≥ `minDocs` distinct documents, keeping
    * surviving lines in document order — the boilerplate-removal step
    * (navigation chrome, cookie banners, license headers) that runs BEFORE
    * document-level dedup in a training-data pipeline.
    *
    * The corpus here has no newlines, so a "line" is a fixed-width run of
    * `width` consecutive tokens (non-overlapping windows) — the same
    * segmentation both engines can reproduce exactly; with real text,
    * pass-through on '\n' segmentation is the one-line variant.
    *
    * Scale shape:
    *  - documents explode to (doc_id, pos, line) — linear, no shuffle;
    *  - the banned-line relation (count distinct docs per line HASH ≥
    *    `minDocs`, only the 16-byte digest aggregates — text stays on the
    *    map side) is tiny (boilerplate is by definition a small fraction
    *    of distinct lines) and BROADCAST back as an anti-join — the
    *    corpus-sized line relation never shuffles to filter;
    *  - the only full shuffle is the per-document reassembly groupBy, on
    *    doc_id (maximum-cardinality key, no skew);
    *  - the line relation feeds both the banned aggregate and the
    *    anti-join probe → staged once (no automatic subplan reuse).
    *
    * Output: (doc_id, n_lines_kept, text_clean) for EVERY input document —
    * a doc whose every line is boilerplate survives with empty text, so a
    * downstream length gate can drop it explicitly.
    *
    * `broadcastBanned`: boilerplate is normally a small fraction of
    * DISTINCT lines, so the banned set broadcasts. For a pathologically
    * boilerplate-heavy corpus (banned set beyond executor memory), set
    * false — the anti-join becomes a shuffle join on the line digest,
    * which is uniform by construction (no skew concern). */
  def stripCommonLines(docs: DataFrame, idCol: String, textCol: String,
                       width: Int, minDocs: Int,
                       broadcastBanned: Boolean = true): DataFrame = {
    require(width > 0 && minDocs > 1, s"width=$width, minDocs=$minDocs")
    val lines = stage(docs
      .withColumn("__toks", expr(s"split(lower($textCol), ' ')"))
      .select(
        col(idCol).as("doc_id"),
        explode(expr(
          s"""transform(sequence(0, (size(__toks) + ${width - 1}) div $width - 1),
             |  i -> named_struct('pos', i,
             |                    'line', concat_ws(' ', slice(__toks, i * $width + 1, $width))))""".stripMargin))
          .as("__l"))
      // the digest is projected INTO the staged relation: both consumers
      // (banned aggregate + anti-join probe) reuse the stored 16-byte
      // hash rather than re-hashing every corpus line a second time.
      .select(col("doc_id"), col("__l.pos").as("pos"), col("__l.line").as("line"),
        md5(col("__l.line")).as("__h")))
    val banned = lines
      .groupBy(col("__h").as("h"))
      .agg(count_distinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("h"))
    val kept = lines
      .join(if (broadcastBanned) broadcast(banned) else banned,
        col("__h") === col("h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines_kept"),
        // deterministic reassembly: sort the (pos, line) structs by pos,
        // then join — collect_list order is partition-dependent otherwise.
        concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(pos, line))), s -> s.line)"))
          .as("text_clean"))
    docs.select(col(idCol).as("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Exact repeated-substring spans, token-granular — the Spark-first
    * re-expression of suffix-array substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": remove any
    * span that appears verbatim more than once in the corpus). A suffix
    * array is a single-machine structure; the distributed equivalent is
    * duplicated fixed-width window detection + per-document interval
    * merging, which finds exactly the maximal duplicated spans of ≥ `k`
    * tokens (every length-≥k duplicated span is a run of duplicated
    * k-windows, and conversely).
    *
    * Plan shape (mirrors [[stripCommonLines]]):
    *  - documents explode to one row per k-token window (doc_id, pos,
    *    md5(window)) — linear in corpus tokens, no shuffle; staged, because
    *    the relation feeds both the duplicate aggregate and the probe;
    *  - duplicated hashes = groupBy the 16-byte digest, count ≥ `minCount`
    *    (total occurrences — within-document repeats count, as in the
    *    paper). Only the digest shuffles, never window text;
    *  - marked positions = semi-join back. Unlike boilerplate lines the
    *    duplicated-hash relation is bounded by duplicated VOLUME, not by a
    *    small banned set — `broadcastDup = false` switches the probe to a
    *    shuffle join on the digest (uniform key, no skew) for corpora whose
    *    duplicated content exceeds executor memory;
    *  - interval merge: lag/running-sum windows partitioned by doc_id (the
    *    max-cardinality key) over marked positions only. Windows at pos p
    *    and q merge iff q ≤ p + k (overlapping or exactly adjacent
    *    coverage).
    *
    * Output: (doc_id, span_start, span_end, n_windows) per maximal
    * duplicated span, token positions 0-based inclusive. Removal/masking is
    * a trivial downstream projection over these intervals. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, minCount: Long = 2L,
                    broadcastDup: Boolean = true): DataFrame = {
    require(minCount > 1, s"minCount=$minCount")
    val wins = stage(windowProjection(docs, idCol, textCol, k))
    val dup = wins
      .groupBy(col("__h").as("h"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(col("h"))
    val marked = wins
      .join(if (broadcastDup) broadcast(dup) else dup,
        col("__h") === col("h"), "left_semi")
      .select(col("doc_id"), col("pos"))
    mergeSpans(marked, k)
  }

  /** One row per k-token window: (doc_id, pos, __h) — UNSTAGED (a batch
    * probing a prebuilt index consumes it once; [[repeatedSpans]] stages
    * it because both the duplicate aggregate and the probe read it). */
  def windowProjection(docs: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    docs
      .withColumn("__toks", expr(s"split(lower($textCol), ' ')"))
      .select(col(idCol).as("doc_id"),
        explode(expr(
          s"""IF(size(__toks) >= $k,
             |  transform(sequence(0, size(__toks) - $k),
             |    i -> named_struct('pos', i,
             |                      'h', md5(concat_ws(' ', slice(__toks, i + 1, $k))))),
             |  array())""".stripMargin)).as("__w"))
      .select(col("doc_id"), col("__w.pos").as("pos"), col("__w.h").as("__h"))
  }

  /** Merge marked window positions into maximal spans (merge iff the next
    * start ≤ prev + k: overlapping or exactly adjacent coverage). The
    * windows partition on doc_id — the max-cardinality key. */
  private def mergeSpans(marked: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(byPos)
    marked
      .withColumn("__new",
        when(prev.isNull.or(col("pos") > prev + k), lit(1)).otherwise(lit(0)))
      .withColumn("__span",
        sum(col("__new")).over(byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__span"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(k - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** The staged distinct-window-digest index of a REFERENCE corpus (an
    * eval benchmark, or yesterday's training set): build once, probe per
    * batch with [[spansAgainstIndex]] — the same caller-owned-index
    * discipline as [[minhashBandKeys]]/[[minhashLshPairsAgainstIndex]].
    * Only 16-byte digests are stored; reference text never leaves the
    * map side. */
  def spanIndex(ref: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame =
    stage(windowProjection(ref, idCol, textCol, k).select(col("__h").as("h")).distinct())

  /** Span-level cross-corpus detection: maximal spans of `docs` whose
    * every k-token window also appears in the reference index — WHERE a
    * document overlaps a benchmark (span-level decontamination, Lee et
    * al.'s cross-set variant) or copies the existing corpus (ingest
    * gating). The batch side stays an unstaged projection (consumed
    * once); the index is the caller-staged [[spanIndex]], broadcast by
    * default (distinct digests of an eval set are small); for a
    * corpus-sized reference set `broadcastIndex = false` degrades to a
    * shuffle join on the uniform digest key. Output is
    * [[repeatedSpans]]-shaped: (doc_id, span_start, span_end,
    * n_windows). */
  def spansAgainstIndex(docs: DataFrame, index: DataFrame, idCol: String,
                        textCol: String, k: Int,
                        broadcastIndex: Boolean = true): DataFrame = {
    val wins = windowProjection(docs, idCol, textCol, k)
    val marked = wins
      .join(if (broadcastIndex) broadcast(index) else index,
        col("__h") === col("h"), "left_semi")
      .select(col("doc_id"), col("pos"))
    mergeSpans(marked, k)
  }

  /** Exact duplicate groups by content digest: only the 16-byte digest
    * shuffles, never the text. Output: (canonical_id, n_copies). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"))

  /** CORPUS-VERSION DIFF by content digest — the ingest-audit primitive
    * ("what changed between yesterday's crawl and today's"): full outer
    * join of the two versions' (id, digest) projections, status per id:
    * 'added' (new only), 'removed' (old only), 'changed' (both, digest
    * differs), 'unchanged'. Only 16-byte digests and ids shuffle — text
    * never leaves the map side (the [[exactGroups]] discipline) — so the
    * diff costs two scans plus one skinny-row join at any corpus size.
    * Output: (idCol, status). */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    def proj(df: DataFrame, dg: String) = df.select(
      col(idCol).cast("long").as(idCol), md5(col(textCol)).as(dg))
    proj(oldDocs, "__do").join(proj(newDocs, "__dn"), Seq(idCol), "full_outer")
      .select(col(idCol), expr(
        """CASE WHEN __do IS NULL THEN 'added'
          |     WHEN __dn IS NULL THEN 'removed'
          |     WHEN __do = __dn THEN 'unchanged'
          |     ELSE 'changed' END""".stripMargin).as("status"))
  }

  /** SOFT exact dedup — SAMPLE duplicates instead of dropping them: every
    * member of an exact-duplicate cluster of size n keeps with
    * probability 1/n via a deterministic hash threshold (floor(2^32/n)
    * as an 8-hex bound on md5 of the salted id — exact integer
    * arithmetic both engines; the 'g' sentinel is [[graft.operators
    * .Sampling.hexThreshold]]'s n = 1 full-keep trick), so the EXPECTED
    * survivor count per cluster is 1 but the surviving copy is a uniform
    * pseudo-random pick rather than always the min-id canonical — no
    * first-crawled/lowest-id bias in what survives. Survivors carry
    * `n_copies` (the exact cluster size) so a consumer can re-weight
    * (duplication frequency is signal a hard canonical keep discards).
    * Expectation, not guarantee: a cluster can keep 0 or ≥ 2 copies —
    * the standard soft-dedup trade vs [[exactGroups]]' exactly-one.
    *
    * The salt ('soft:') keeps the keep-decision independent of
    * [[graft.operators.Sampling.hashSample]]'s unsalted ladder and
    * `assignSplits`' 'split:' ladder — sampling rate and split
    * assignment never correlate with survivorship.
    *
    * Scale shape: one scan; the cluster-size window partitions by the
    * 16-byte digest (high-cardinality — that IS the dedup shuffle), and
    * only (id, digest) rows ride it — text never shuffles (the
    * [[exactGroups]] discipline). Output: (idCol, n_copies, kept 1/0). */
  def softDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(col(idCol).cast("long").as(idCol), md5(col(textCol)).as("__dg"))
      .withColumn("n_copies",
        count(lit(1)).over(Window.partitionBy(col("__dg"))))
      .withColumn("kept", expr(
        s"""CAST(substring(md5(concat('soft:', CAST($idCol AS STRING))), 1, 8) <
           |  CASE WHEN n_copies = 1 THEN 'g'
           |       ELSE lower(lpad(hex(4294967296 div n_copies), 8, '0')) END
           |AS BIGINT)""".stripMargin))
      .drop("__dg")
  }

  /** Drop every row of a (blockCols, length-bucket) cell whose occupancy
    * exceeds `cap` — the shared hot-cell guard of [[editDistancePairs]]
    * and [[editIndex]]. The HOT CELLS enumerate via a partial-aggregated
    * count (only distinct cell keys shuffle) and come back as a broadcast
    * LEFT ANTI join, so the corpus side keeps its exact uncapped plan
    * shape — no new exchange before the candidate join. A window count
    * over the cell key was measured 3.5-9× slower end-to-end here: its
    * exchange re-partitions the corpus and the tiny post-window stats
    * flip the candidate join to a broadcast whose stream side has lost
    * its parallelism for the levenshtein stage. The broadcast is bounded
    * by construction: a cell must hold MORE than `cap` rows to be hot,
    * so there are at most N/cap hot cells — with any useful cap, far
    * fewer (heavy-hitter tail). */
  private def capCells(base: DataFrame, blockCols: Seq[String],
                       cap: Option[Int], bucketCol: String = "__bk"): DataFrame =
    cap match {
      case Some(c) =>
        val key = blockCols :+ bucketCol
        val hot = base.groupBy(key.map(col): _*)
          .agg(count(lit(1)).as("__cf"))
          .filter(col("__cf") > c)
          .drop("__cf")
        base.join(broadcast(hot), key, "left_anti")
      case None => base
    }

  /** Character-level near-duplicate pairs by EDIT DISTANCE with lossless
    * length blocking — the entity-resolution verify for SHORT text fields
    * (titles, names, addresses, product descriptions); the token-level
    * families above own long documents (a |a|·|b| DP per candidate pair
    * is the deliberate trade for exact character semantics, and is why
    * this operator's contract is short fields).
    *
    * The blocking is LOSSLESS by the metric's length lower bound:
    * levenshtein(a, b) ≥ |len(a) − len(b)|, so with bucket width
    * `bucketWidth` > `maxDist` every qualifying pair lands in the same or
    * an adjacent length bucket. One side explodes to {b−1, b, b+1}, the
    * other keeps b; the equi-join on (block attributes, bucket) then sees
    * every true pair EXACTLY once (the pair's two buckets differ by at
    * most 1, so exactly one probe offset matches). Verification is one
    * codegen'd `levenshtein` per candidate — never an all-pairs scan; at
    * 100 TB the block sizes are what bound candidate volume, so compose
    * `blockCols` (exact-match attributes — the ER convention: a pair
    * differing there is a different entity) until blocks are small.
    *
    * `cellCap`: the hot-cell analogue of [[minhashLshPairs]]' `bandCap` —
    * a (blockCols, length-bucket) CELL with m members emits O(m²)
    * candidates, each paying the |a|·|b| levenshtein DP, so one popular
    * cell (same-language same-length boilerplate titles) can straggler
    * the whole verify join. The cap drops ALL rows of cells with more
    * than `cap` members via a broadcast anti-join against the (tiny,
    * ≤ N/cap by construction) hot-cell list — the corpus plan shape is
    * untouched. Pairs with an endpoint in a capped cell
    * are missed — the bandCap recall trade; exact dedup first and more
    * `blockCols` are the cures (the measured block-attr scale law: one
    * extra attr cut a hot probe 9.8 s → 1.15 s at equal recall).
    * Measured (Scratch, 95k cold corpus): a single 5000-row hot cell
    * took the uncapped wall 7.4 → 15.4 s; cap=256 restored 7.3 s.
    *
    * Character-unit contract: the blocking bound is stated in whatever
    * unit `length`/`levenshtein` count, and Spark counts Unicode CODE
    * POINTS in both, so the theorem holds for any Unicode text. The
    * registry corpus and fixtures are ASCII (where every unit convention
    * coincides); a cross-engine oracle over non-ASCII text must first
    * verify the twin engine's `levenshtein` counts code points too — do
    * not assume it.
    * Output: (id_a, id_b, dist), id_a < id_b. */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDist: Int, blockCols: Seq[String] = Nil,
                        bucketWidth: Int = 64,
                        cellCap: Option[Int] = None): DataFrame = {
    require(maxDist >= 0 && bucketWidth > maxDist,
      s"bucketWidth=$bucketWidth must exceed maxDist=$maxDist (lossless blocking)")
    val base = capCells(
      docs
        .filter(col(textCol).isNotNull)
        .select(Seq(col(idCol).cast("long").as("__id"), col(textCol).as("__t")) ++
          blockCols.map(col): _*)
        .withColumn("__bk", expr(s"length(__t) div $bucketWidth")),
      blockCols, cellCap)
    val probe = base.select(
      Seq(col("__id").as("id_a"), col("__t").as("__ta"),
        explode(expr("array(__bk - 1, __bk, __bk + 1)")).as("__bka")) ++
        blockCols.map(c => col(c).as(s"__a_$c")): _*)
    val idx = base.select(
      Seq(col("__id").as("id_b"), col("__t").as("__tb"),
        col("__bk").as("__bkb")) ++
        blockCols.map(c => col(c).as(s"__b_$c")): _*)
    val blockEq = blockCols
      .map(c => col(s"__a_$c") === col(s"__b_$c"))
      .foldLeft(lit(true))(_ && _)
    probe
      .join(idx, col("__bka") === col("__bkb") &&
        col("id_a") < col("id_b") && blockEq)
      .withColumn("dist", expr("CAST(levenshtein(__ta, __tb) AS BIGINT)"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** The persisted-corpus half of [[editDistancePairs]]: the (id, txt,
    * bk, block attrs) relation a caller stages/persists once per corpus
    * version and probes per batch with [[editPairsAgainstIndex]].
    *
    * `cellCap` applies [[editDistancePairs]]' hot-cell guard AT BUILD
    * TIME (the one place the corpus shuffles anyway — per-batch probes
    * then inherit the bound for free): probes into a capped cell find
    * nothing, the same pairs-with-a-capped-endpoint-are-missed contract,
    * amortized over every batch of the corpus version. */
  def editIndex(docs: DataFrame, idCol: String, textCol: String,
                blockCols: Seq[String] = Nil,
                bucketWidth: Int = 16,
                cellCap: Option[Int] = None): DataFrame =
    capCells(
      docs
        .filter(col(textCol).isNotNull)
        .select(Seq(col(idCol).cast("long").as("id"),
          col(textCol).as("txt")) ++ blockCols.map(col): _*)
        .withColumn("bk", expr(s"length(txt) div $bucketWidth")),
      blockCols, cellCap, bucketCol = "bk")

  /** INCREMENTAL edit-distance near-dup: pairs between a small new batch
    * and the existing corpus — the per-batch production shape (the ER
    * twin of [[minhashLshPairsAgainstIndex]]). The BATCH side explodes
    * the {b−1, b, b+1} length-bucket probes and BROADCASTS onto ONE scan
    * of the persisted [[editIndex]] relation — the corpus never shuffles,
    * and the lossless-blocking theorem carries over verbatim (a
    * qualifying pair's buckets differ by at most 1, so exactly one probe
    * offset matches — each pair surfaces once). Identical verify
    * arithmetic to the batch operator, so per-batch results are bitwise
    * what [[editDistancePairs]] would emit for those pairs.
    * Output: (id_batch, id_corpus, dist). */
  def editPairsAgainstIndex(batch: DataFrame, idCol: String,
                            textCol: String, index: DataFrame,
                            maxDist: Int, blockCols: Seq[String] = Nil,
                            bucketWidth: Int = 16,
                            batchBlockCols: Option[Seq[String]] = None): DataFrame = {
    require(maxDist >= 0 && bucketWidth > maxDist,
      s"bucketWidth=$bucketWidth must exceed maxDist=$maxDist (lossless blocking)")
    // batch-side paths for the block attributes may differ from the
    // index's column names (a streamed batch addresses them as
    // `value.<c>`); they align positionally with `blockCols`.
    val batchBlk = batchBlockCols.getOrElse(blockCols)
    require(batchBlk.size == blockCols.size,
      "batchBlockCols must align with blockCols")
    val probe = batch
      .filter(col(textCol).isNotNull)
      .select(Seq(col(idCol).cast("long").as("__idb"),
        col(textCol).as("__tb")) ++
        batchBlk.zip(blockCols).map { case (bc, ic) =>
          col(bc).as(s"__b_$ic")
        }: _*)
      .withColumn("__bkp", explode(expr(
        s"""array((length(__tb) div $bucketWidth) - 1,
           |      length(__tb) div $bucketWidth,
           |      (length(__tb) div $bucketWidth) + 1)""".stripMargin)))
    val blockEq = blockCols
      .map(c => col(s"__b_$c") === col(c))
      .foldLeft(lit(true))(_ && _)
    index
      .join(broadcast(probe), col("__bkp") === col("bk") && blockEq)
      .withColumn("dist", expr("CAST(levenshtein(__tb, txt) AS BIGINT)"))
      .filter(col("dist") <= maxDist)
      .select(col("__idb").as("id_batch"), col("id").as("id_corpus"),
        col("dist"))
  }

  // ------------------------------------------------ LSH parameter planning

  /** Probability a (bands × rowsPerBand) MinHash LSH scheme CANDIDATES a
    * pair of Jaccard similarity `s`: 1 − (1 − s^r)^b (Leskovec/Rajaraman/
    * Ullman, Mining of Massive Datasets ch. 3). Driver-side planning math
    * — floats never enter an oracle-checked plan (verification is exact
    * regardless: banding only proposes candidates). */
  def lshCandidateProb(s: Double, bands: Int, rowsPerBand: Int): Double = {
    require(s >= 0 && s <= 1 && bands >= 1 && rowsPerBand >= 1,
      s"s=$s bands=$bands rowsPerBand=$rowsPerBand")
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand.toDouble), bands.toDouble)
  }

  /** One candidate LSH geometry and its operating curve. `threshold` is
    * the S-curve inflection (1/b)^(1/r) — pairs above it are mostly
    * candidated, below mostly not; `recallAtTarget`/`fpAtDistant` are
    * the candidate probabilities at the caller's target similarity and
    * at target − 0.2 (the "clearly different" proxy). */
  final case class LshPlan(numHashes: Int, bands: Int, rowsPerBand: Int,
                           threshold: Double, recallAtTarget: Double,
                           fpAtDistant: Double)

  /** Pick the banding for a fixed signature length `numHashes` whose
    * implicit threshold sits closest BELOW-or-at the target Jaccard
    * (below ⇒ recall errs high; verification removes the extra
    * candidates exactly, so the cost of aiming low is compute, never
    * correctness — the right bias for a dedup gate). Falls back to the
    * closest divisor overall when none sits below. Returns every
    * divisor's plan too, so a deployment can trade recall against the
    * fpAtDistant candidate cost explicitly. */
  def lshPlan(numHashes: Int, targetJaccard: Double): (LshPlan, Seq[LshPlan]) = {
    require(numHashes >= 2 && numHashes <= 4096, s"numHashes=$numHashes")
    require(targetJaccard > 0 && targetJaccard < 1,
      s"targetJaccard=$targetJaccard must be in (0, 1)")
    val all = (1 to numHashes)
      .filter(b => numHashes % b == 0)
      .map { b =>
        val r = numHashes / b
        val t = math.pow(1.0 / b, 1.0 / r)
        LshPlan(numHashes, b, r, t,
          lshCandidateProb(targetJaccard, b, r),
          lshCandidateProb(math.max(0.0, targetJaccard - 0.2), b, r))
      }
    val below = all.filter(_.threshold <= targetJaccard)
    val pick =
      if (below.nonEmpty) below.maxBy(_.threshold)
      else all.minBy(p => math.abs(p.threshold - targetJaccard))
    (pick, all)
  }
}
