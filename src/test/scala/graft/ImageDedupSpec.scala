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

  // ---- crop-robust tiled shingles (x_dedup_image_crop's construction):
  // 2×2-px flat cells with md5-derived grays; v0 = 26×24 original,
  // v1 = hop-aligned crop (left 8 px removed), v2 = hop-aligned pad
  // (8 px of new content prepended). PNG is lossless, so every tile
  // hash is exact integer arithmetic over the stated cells.
  private def cellGray(tag: String, base: Long, cx: Int, cy: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$tag:$base:$cx:$cy".getBytes("US-ASCII"))(0) & 0xff
  }
  private def cropPng(base: Long, v: Int): Array[Byte] = {
    val w = v match { case 0 => 26; case 1 => 18; case _ => 34 }
    Media.encodePng(w, 24, (x, y) => {
      val (cx, cy) = (x / 2, y / 2)
      val g =
        if (v == 2 && cx < 4) cellGray("p", base, cx, cy)
        else if (v == 1) cellGray("i", base, cx + 4, cy)
        else if (v == 2) cellGray("i", base, cx - 4, cy)
        else cellGray("i", base, cx, cy)
      (g << 16) | (g << 8) | g
    })
  }

  test("dhashShingles: hop-aligned crops/pads caught where whole-image dHash provably loses them") {
    val recs = spark.createDataset(for {
      base <- 0L until 20L; v <- 0 until 3
    } yield MediaRecord(base * 3 + v, "png", cropPng(base, v)))(
      org.apache.spark.sql.Encoders.product[MediaRecord])

    // whole-image dHash at the shipped budget: the crop re-frames the
    // 9×8 grid — NO within-group pair survives Hamming ≤ 3.
    val whole = ImageDedup.pairs(recs, maxHamming = 3)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(whole.forall { case (a, b) => a / 3 != b / 3 } || whole.isEmpty,
      s"whole-image dHash unexpectedly caught a crop: $whole")

    // tiled shingles: every within-group pair flagged at containment 0.9.
    val got = ImageDedup.shinglePairs(recs, threshold = 0.9)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 20L).flatMap(b =>
      Seq((b * 3, b * 3 + 1), (b * 3, b * 3 + 2), (b * 3 + 1, b * 3 + 2))).toSet
    assert(got == want,
      s"extra=${got -- want} missing=${want -- got}")

    // shingle-set structure: crop ⊂ original ⊂ pad's shared region.
    val sets = ImageDedup.dhashShingles(recs).collect()
      .map(r => r.id -> r.sh.toSet).toMap
    assert(sets(1L).subsetOf(sets(0L)) && sets(1L).size == 2 && sets(0L).size == 4,
      "crop tiles must be a subset of the original's")
    assert(sets(0L).subsetOf(sets(2L)) && sets(2L).size == 6,
      "pad must contain every original tile")
  }

  // ---- arbitrary-offset crop robustness (x_dedup_image_keypoint's
  // construction): per-pixel md5-derived grays; v1 = crop at offsets
  // (3, 2) — deliberately NOT multiples of the tile hop — v2 = pad with
  // fresh content at offsets (3, 1).
  private def kpPng(base: Long, v: Int): Array[Byte] = {
    def cell(tag: String, cx: Int, cy: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"$tag:$base:$cx:$cy".getBytes("US-ASCII"))(0) & 0xff
    }
    val (w, h) = v match {
      case 0 => (48, 40); case 1 => (43, 37); case _ => (51, 41)
    }
    Media.encodePng(w, h, (x, y) => {
      val g =
        if (v == 1) cell("i", x + 3, y + 2)
        else if (v == 2 && (x < 3 || y < 1)) cell("p", x, y)
        else if (v == 2) cell("i", x - 3, y - 1)
        else cell("i", x, y)
      (g << 16) | (g << 8) | g
    })
  }

  test("keypoints: ARBITRARY-offset crops caught where tile shingles provably lose them") {
    val recs = spark.createDataset(for {
      base <- 0L until 12L; v <- 0 until 3
    } yield MediaRecord(base * 3 + v, "png", kpPng(base, v)))(
      org.apache.spark.sql.Encoders.product[MediaRecord])

    // hop-aligned tile shingles: the (3, 2) offset shifts every tile
    // window — no within-group pair survives at the shipped threshold.
    val tiles = ImageDedup.shinglePairs(recs, threshold = 0.9)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiles.forall { case (a, b) => a / 3 != b / 3 },
      s"tile shingles unexpectedly caught an arbitrary-offset crop: $tiles")

    // content-defined keypoints: every within-group pair flagged, no
    // cross-group noise (a cross pair would need 90% descriptor
    // collisions over md5-derived pixels).
    val got = ImageDedup.keypointPairs(recs, threshold = 0.9)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 12L).flatMap(b =>
      Seq((b * 3, b * 3 + 1), (b * 3, b * 3 + 2), (b * 3 + 1, b * 3 + 2))).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")

    // key-set structure: interior keypoints survive BOTH transforms
    // verbatim (crop ⊆ original ⊆ pad) — the content-locality claim.
    val sets = ImageDedup.keypointSets(recs).collect()
      .map(r => r.id -> r.sh.toSet).toMap
    assert(sets(1L).nonEmpty && sets(1L).subsetOf(sets(0L)),
      "cropped keypoints must be a subset of the original's")
    assert(sets(0L).subsetOf(sets(2L)),
      "pad must preserve every original keypoint")

    // contract edges: undecodable and sub-5×5 payloads refuse cleanly.
    assert(ImageDedup.keypointHashes(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageDedup.keypointHashes(
      Media.encodePng(4, 4, (_, _) => 0x808080)).isEmpty)
  }

  // ---- rotation/flip robustness (x_dedup_image_rot's construction):
  // 32×32 gray squares of 4×4-px coarse-random blocks; `map` re-frames
  // the payload's pixel lookup so rotated/mirrored COPIES are encoded as
  // their own lossless PNGs (what a republished rotated image is).
  private def sqImage(base: Long, map: (Int, Int) => (Int, Int) = (x, y) => (x, y),
                      perturb: Option[(Int, Int)] = None): Array[Byte] =
    Media.encodePng(32, 32, (x, y) => {
      val (sx, sy) = map(x, y)
      val (bx, by) = (sx / 4, sy / 4)
      val v0 = scala.util.hashing.MurmurHash3
        .productHash((base, bx, by)).abs % 256
      val v = if (perturb.contains((bx, by))) (v0 + 128) % 256 else v0
      (v << 16) | (v << 8) | v
    })

  test("d4Hashes is a D4-orbit invariant; whole-image dHash provably loses rotations") {
    val orig = sqImage(7L)
    val rot = sqImage(7L, (x, y) => (y, 31 - x)) // payload rotated 90°
    val mir = sqImage(7L, (x, y) => (31 - x, y))
    // the rotation scrambles the whole-image hash far past any budget...
    val d = java.lang.Long.bitCount(Media.dhash64(orig).get ^ Media.dhash64(rot).get)
    assert(d > 7, s"rotation moved the whole-image dHash only $d bits")
    // ...but the 8-hash orbit (hence the canonical min) is identical.
    assert(ImageDedup.d4Hashes(rot).get.toSet == ImageDedup.d4Hashes(orig).get.toSet)
    assert(ImageDedup.d4Hashes(mir).get.toSet == ImageDedup.d4Hashes(orig).get.toSet)
    assert(ImageDedup.dhashCanonical(rot) == ImageDedup.dhashCanonical(orig))
  }

  test("rotationRobustPairs: rotated/flipped republications caught at Hamming 0, zero cross-noise") {
    val recs = spark.createDataset(for {
      base <- 0L until 12L
      (mapped, v) <- Seq[((Int, Int) => (Int, Int), Long)](
        ((x, y) => (x, y), 0L), ((x, y) => (y, 31 - x), 1L),
        ((x, y) => (31 - x, y), 2L), ((x, y) => (31 - x, 31 - y), 3L))
    } yield MediaRecord(base * 4 + v, "png", sqImage(base, mapped)))(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val got = ImageDedup.rotationRobustPairs(recs, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      b <- 0L until 12L; i <- 0L until 4L; j <- (i + 1) until 4L
    } yield (b * 4 + i, b * 4 + j, 0L)).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
  }

  test("d4Pairs: rotation PLUS perturbation caught at the exact orbit-minimum Hamming") {
    // copy = rotated AND one block re-valued — the case the canonical
    // hash only catches while its argmin stays put; the exploded orbit
    // compares every orientation combination. Whether a given block's
    // shift flips a gradient comparison depends on the neighboring cell
    // values, so the fixture SEARCHES for a block whose perturbation
    // lands in 1..7 flipped bits (deterministic: fixed seed, first hit).
    def orbitMin(ia: Array[Byte], ib: Array[Byte]): Long = (for {
      ha <- ImageDedup.d4Hashes(ia).get; hb <- ImageDedup.d4Hashes(ib).get
    } yield java.lang.Long.bitCount(ha ^ hb).toLong).min
    val a = sqImage(3L)
    val rotated = (for {
      bx <- 0 until 8; by <- 0 until 8
      img = sqImage(3L, (x, y) => (y, 31 - x), perturb = Some((bx, by)))
      m = orbitMin(a, img) if m > 0 && m <= 7
    } yield img).headOption.getOrElse(
      fail("no single-block perturbation lands in the 1..7 bit range"))
    val b = rotated
    val expected = orbitMin(a, b)
    val recs = spark.createDataset(Seq(
      MediaRecord(1L, "png", a), MediaRecord(2L, "png", b),
      MediaRecord(3L, "png", sqImage(99L))))(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val got = ImageDedup.d4Pairs(recs, maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, expected)), s"got=$got want min=$expected")
  }
}
