package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomDedup
import graft.sources.Tables

/** Bloom pre-gate for incremental exact dedup (BloomDedup): the no-false-
  * negative guarantee, the fpp pruning claim, end-to-end agreement with
  * the exact join it accelerates, and the no-shuffle plan shape. */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  test("probe keeps EVERY true member (no false negatives), prunes most others") {
    val corpus = spark.range(0, 500).select(md5(col("id").cast("string")).as("k"))
    val filter = BloomDedup.buildFilter(corpus, "k", expectedItems = 500, fpp = 0.01)
    // batch: 500 members + 5000 non-members.
    val batch = spark.range(0, 5500).select(col("id"),
      md5(col("id").cast("string")).as("k"))
    val kept = BloomDedup.probe(batch, "k", filter).select("id").as[Long].collect().toSet
    assert((0L until 500L).forall(kept), "bloom dropped a true member")
    // fpp=1% over 5000 non-members ⇒ ~50 false positives; 10× slack.
    assert(kept.size <= 500 + 500, s"pruning too weak: ${kept.size} kept of 5500")
    // keepNew is the exact complement of probe.
    val newIds = BloomDedup.keepNew(batch, "k", filter).select("id").as[Long].collect().toSet
    assert(newIds == (0L until 5500L).toSet -- kept)
  }

  test("prefilter + exact check ≡ plain exact semi-join (documents digests)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      .select(md5(col("text")).as("k"))
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), md5(col("text")).as("k"))
    val filter = BloomDedup.buildFilter(corpus, "k", expectedItems = 1000)
    val viaBloom = BloomDedup.probe(batch, "k", filter)
      .join(corpus, Seq("k"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    val exact = batch.join(corpus, Seq("k"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(viaBloom == exact)
  }

  test("the probe is a scan-fused Filter: no join, no Exchange") {
    val corpus = spark.range(0, 100).select(md5(col("id").cast("string")).as("k"))
    val filter = BloomDedup.buildFilter(corpus, "k", expectedItems = 100)
    val batch = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), md5(col("text")).as("k"))
    val plan = BloomDedup.probe(batch, "k", filter)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500))
  }

  test("builds beyond Spark's 4M-item runtime-bloom cap, restores the confs") {
    // BloomFilterAggregate require()s items/bits under the session confs
    // spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits}
    // (defaults 4M / 8 MiB) — buildFilter must raise them for the build
    // (else the advertised 128 MiB envelope is unreachable: corpora past
    // ~4M digests die with an opaque Spark error) and put them back after.
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val before = (spark.conf.getOption(itemsKey), spark.conf.getOption(bitsKey))
    val corpus = spark.range(0, 1000).select(md5(col("id").cast("string")).as("k"))
    val filter = BloomDedup.buildFilter(corpus, "k", expectedItems = 5_000_000L)
    assert(filter.nonEmpty)
    assert((spark.conf.getOption(itemsKey), spark.conf.getOption(bitsKey)) == before,
      "runtime-bloom-filter confs not restored after the build")
    // the oversized filter still answers membership for the actual corpus.
    val kept = BloomDedup.probe(corpus, "k", filter).count()
    assert(kept == 1000L)
  }

  test("oversized filters are refused with the escalation path named") {
    val corpus = spark.range(1).select(col("id").cast("string").as("k"))
    val e = intercept[IllegalArgumentException] {
      BloomDedup.buildFilter(corpus, "k", expectedItems = 10_000_000_000L)
    }
    assert(e.getMessage.contains("anti-join"))
  }

  test("empty-relation filter is the all-zero shape; merge is fold-exact") {
    val corpus = spark.range(0, 500).select(md5(col("id").cast("string")).as("k"))
    val empty = corpus.filter(col("k") === "never")
    // bloom_agg over zero rows is NULL — buildFilter substitutes the
    // all-zero filter at the SAME shape, so an all-duplicate micro-batch
    // folds as the merge identity (the growing gate's edge case).
    val ef = BloomDedup.buildFilter(empty, "k", expectedItems = 10000L)
    assert(BloomDedup.probe(corpus, "k", ef).count() == 0L,
      "empty filter must match nothing")
    val full = BloomDedup.buildFilter(corpus, "k", expectedItems = 10000L)
    assert(java.util.Arrays.equals(BloomDedup.mergeFilters(full, ef), full),
      "merging the empty filter must be a byte-identity")
    // fold-exactness: merging two half filters ≡ one build over the union.
    val loF = BloomDedup.buildFilter(
      corpus.filter(substring(col("k"), 1, 1) < "8"), "k", expectedItems = 10000L)
    val hiF = BloomDedup.buildFilter(
      corpus.filter(substring(col("k"), 1, 1) >= "8"), "k", expectedItems = 10000L)
    assert(java.util.Arrays.equals(BloomDedup.mergeFilters(loF, hiF), full),
      "merged per-part filters must be byte-identical to the union build")
  }
}
