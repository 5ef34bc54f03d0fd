package graft

import org.apache.spark.sql.functions._

import graft.operators.{ImageDedup, MediaRecord, Media}

/** Operator-level perceptual-dedup specs (the registry query
  * `x_dedup_image` oracle-checks values; these pin the library claims):
  * banding finds exactly the ground-truth pair set, and — the reason
  * dHash exists — RESIZED re-published copies of an image land within
  * the Hamming budget of their original. */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic coarse-block test image: an 8×8 grid of pseudo-random
    * bytes (seeded by `base`), pixel-expanded to 32×32. Coarse structure
    * is what perceptual hashing keys on; it survives resampling, unlike
    * per-pixel noise. */
  private def blockImage(base: Long, w: Int = 32, h: Int = 32): Array[Byte] =
    Media.encodePng(w, h, (x, y) => {
      val bx = x * 8 / w; val by = y * 8 / h
      val v = scala.util.hashing.MurmurHash3
        .productHash((base, bx, by)).abs % 256
      (v << 16) | (v << 8) | v
    })

  test("dhashPairs ≡ quadratic ground truth (banding lossless at the budget)") {
    // hand-built hash relation: a base word, variants flipping 1–3 bits,
    // spread across different bands, plus unrelated words.
    val base = 0x0123456789abcdefL
    val hashes = Seq(
      1L -> base,
      2L -> (base ^ 1L),                      // 1 bit, band 3
      3L -> (base ^ (1L << 63)),              // 1 bit, band 0
      4L -> (base ^ 7L),                      // 3 bits, one band
      5L -> (base ^ (1L << 50) ^ (1L << 30) ^ (1L << 10)), // 3 bits, 3 bands
      6L -> (base ^ 0xffL),                   // 8 bits — outside budget
      7L -> 0x5555555555555555L,
      8L -> ~base).toDF("id", "h")
    val got = ImageDedup.dhashPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val rows = Seq(1L -> base, 2L -> (base ^ 1L), 3L -> (base ^ (1L << 63)),
      4L -> (base ^ 7L), 5L -> (base ^ (1L << 50) ^ (1L << 30) ^ (1L << 10)),
      6L -> (base ^ 0xffL), 7L -> 0x5555555555555555L, 8L -> ~base)
    val want = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == want, s"\n got=$got\n want=$want")
    assert(want.exists(_._3 == 3L), "fixture must include a budget-edge pair")
  }

  test("resized + re-encoded copies are found; unrelated images are not") {
    // measured geometry (deterministic fixture): NN resampling moves the
    // dHash by ≤ 7 bits on these images, while distinct coarse-random
    // images sit ≥ 17 bits apart — so the Hamming-7 budget (8 bands,
    // still pigeonhole-lossless) recovers EVERY republished copy with
    // ZERO cross-image noise. Hamming 3 is the re-encode-only budget;
    // resize robustness needs the wider one.
    val bases = (0 until 24).map(_.toLong)
    val originals = bases.map(b => MediaRecord(b, "png", blockImage(b)))
    // each "republished" copy: NN-resized 32×32 → 48×32 under id+1000.
    val ds = spark.createDataset(originals)(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val copies = Media.resize(ds, 48, 32)
      .map(r => r.copy(id = r.id + 1000L))(
        org.apache.spark.sql.Encoders.product[MediaRecord])
    val all = ds.unionByName(copies)
    val pairs = ImageDedup.pairs(all, maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSet
    // every original must pair with its own resized copy...
    val missing = bases.filterNot(b => pairs.exists(p => p._1 == b && p._2 == b + 1000L))
    assert(missing.isEmpty, s"resized copies not recovered for bases: $missing")
    // ...and no two DIFFERENT bases may collide (coarse random grids are
    // far apart in dHash space).
    val cross = pairs.filter(p => p._1 % 1000L != p._2 % 1000L)
    assert(cross.isEmpty, s"unrelated images paired: $cross")
  }
}
