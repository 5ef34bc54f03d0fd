package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Operator-level ANN specs (the registry queries oracle-check results;
  * these pin library behaviors with no SQL twin). */
class AnnSpec extends SparkSpec {

  import spark.implicits._

  // 3 well-separated clusters around axis directions in 8-d, 20 points
  // each, ids interleaved so the k-smallest-id init spans clusters.
  private lazy val clustered = {
    val rnd = new Random(7)
    val pts = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val base = Array.fill(8)(0.02f * (rnd.nextFloat() - 0.5f))
      base(c) = 1.0f + 0.05f * rnd.nextFloat()
      (c + 3L * i, base.toSeq) // ids 0,1,2,3,4,5,... interleave clusters
    }
    pts.toDF("id", "embedding")
  }

  test("trainCentroids recovers well-separated clusters (Lloyd, argmax assignment)") {
    val cents = Ann.trainCentroids(clustered, k = 3, iters = 4)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(cents.length == 3)
    // each trained centroid aligns with exactly one axis direction.
    val axes = cents.map { case (_, e) =>
      val m = e.map(math.abs).max
      e.indexWhere(v => math.abs(v) == m)
    }.toSet
    assert(axes == Set(0, 1, 2), s"centroids collapsed: ${cents.toSeq}")
    cents.foreach { case (_, e) =>
      val nrm = math.sqrt(e.map(v => v.toDouble * v).sum)
      val peak = e.map(math.abs).max / nrm
      assert(peak > 0.99, s"centroid not axis-aligned: $e")
    }
  }

  test("ivfTopK with trained centroids returns each query's own cluster") {
    val queries = clustered.filter(col("id") < 3) // one per cluster
    val corpus = clustered.filter(col("id") >= 3)
    val cents = Ann.trainCentroids(corpus, k = 3, iters = 4)
    val out = Ann.ivfTopK(queries, corpus, cents, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.length == 15, s"expected 3 queries × 5: ${out.length}")
    // neighbor ids ≡ query id (mod 3) ⇔ same cluster.
    assert(out.forall { case (q, n) => n % 3 == q % 3 },
      s"cross-cluster neighbor: ${out.toSeq}")
  }

  test("lshSelfPairs finds exactly the within-cluster pairs, no cartesian") {
    // well-separated clusters: within-cluster cosine ≈ 1 (caught), cross ≈ 0
    // (scored out even when a band collides). 3 clusters × C(20,2) pairs.
    val pairs = Ann.lshSelfPairs(clustered, threshold = 0.9, dim = 8)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"self-dedup must stay a banded equi-join:\n${plan.take(1500)}")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 3 * 190, s"expected 570 within-cluster pairs: ${got.length}")
    assert(got.forall { case (va, vb, _) => va % 3 == vb % 3 },
      "cross-cluster pair survived the cosine verify")
    assert(got.forall { case (va, vb, c) => va < vb && c >= 0.9 })
  }

  test("semanticDedup keeps exactly one representative per semantic cluster") {
    val cents = Ann.trainCentroids(clustered, k = 3, iters = 4)
    val out = Ann.semanticDedup(clustered, cents, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 60) // every corpus vector is flagged, none vanish
    // within-cluster cosine ≈ 1 ≫ 0.9, cross ≈ 0: the min id of each of
    // the three clusters (ids ≡ c mod 3 → mins 0, 1, 2) survives, all
    // other members are dropped by a smaller-id similar neighbor.
    val kept = out.filter(_._3 == 1L).map(_._1).toSet
    assert(kept == Set(0L, 1L, 2L), s"kept: $kept")
    // assignment is cluster-faithful: each mod-3 family lands on one
    // centroid, three distinct centroids overall.
    val byFamily = out.groupBy(_._1 % 3).map { case (f, rows) => f -> rows.map(_._2).toSet }
    assert(byFamily.values.forall(_.size == 1), s"family split across centroids: $byFamily")
    assert(byFamily.values.flatten.toSet.size == 3)
  }

  test("semanticFlagAgainst flags corpus-redundant vectors, passes novel ones") {
    import spark.implicits._
    val corpus = clustered.filter(col("id") >= 3)
    val cents = Ann.trainCentroids(corpus, k = 3, iters = 4)
    val idx = Ann.assignToCentroids(corpus, cents)
    // a vector on an axis no cluster occupies — semantically novel.
    val novel = Seq((100L, Seq.fill(8)(0.0f).updated(5, 1.0f)))
      .toDF("id", "embedding")
    val batch = clustered.filter(col("id") < 3).unionByName(novel)
    val out = Ann.semanticFlagAgainst(batch, idx, cents, threshold = 0.9)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L, 100L)) // every batch vector reported
    (0 to 2).foreach { c =>
      val (n, w) = out(c.toLong)
      assert(n == 19L, s"cluster $c: expected all 19 corpus twins, got $n")
      assert(w.contains(c + 3L), s"cluster $c: witness should be min id ${c + 3}, got $w")
    }
    assert(out(100L) == ((0L, None)), s"novel vector flagged: ${out(100L)}")
  }

  test("knnGraph links every vector to its own cluster") {
    val out = Ann.knnGraph(clustered, k = 3, bits = 16, bands = 4, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // well-separated clusters: within-cluster cosine ≈ 1 — every reported
    // edge stays inside the source's cluster (ids ≡ c mod 3), and every
    // vector appears as a source (its 19 same-cluster twins collide in
    // at least one band at these widths on this fixture).
    assert(out.forall { case (q, n) => q % 3 == n % 3 },
      s"cross-cluster edge: ${out.toSeq.filter { case (q, n) => q % 3 != n % 3 }}")
    assert(out.map(_._1).distinct.length == 60, s"sources: ${out.map(_._1).distinct.length}")
    assert(out.groupBy(_._1).values.forall(_.length == 3))
  }

  test("bruteTopK two-phase aggregation matches a driver-side exact ranking") {
    val rnd = new Random(11)
    val vecs = (0L until 50L).map(i => (i, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("id", "embedding")
    val got = Ann.bruteTopK(df.filter(col("id") < 5), df.filter(col("id") >= 5), k = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (a.indices).foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = for {
      (q, qe) <- vecs.take(5)
      (((c, _), _), rank) <- vecs.drop(5)
        .map { case (cid, ce) => ((cid, ce), cos(qe, ce)) }
        .sortBy { case ((cid, _), s) => (-s, cid) }
        .take(7).zipWithIndex
    } yield (q, rank + 1, c)
    assert(got.sortBy(t => (t._1, t._2)).toSeq == expected.sortBy(t => (t._1, t._2)))
  }

  test("pqCodes recovers the assembling codebook positions exactly") {
    // 4-entry codebook over 8 dims, m = 4 subspaces of width 2, with
    // well-separated per-slice values; corpus vectors are ASSEMBLED from
    // codebook slices, so the nearest-slice argmin must return exactly
    // the assembling positions (distance 0 beats every other entry).
    val cb = (0 until 4).map(c => (c.toLong, Seq.fill(8)((10f * c) + 1f)))
    val pick = Seq(Seq(0, 1, 2, 3), Seq(3, 3, 0, 0), Seq(2, 0, 2, 1))
    val corpus = pick.zipWithIndex.map { case (ps, i) =>
      ((i + 100).toLong, ps.zipWithIndex.flatMap { case (p, j) =>
        cb(p)._2.slice(j * 2, j * 2 + 2) })
    }
    val got = Ann.pqCodes(corpus.toDF("id", "embedding"),
      cb.toDF("id", "embedding"), m = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    pick.zipWithIndex.foreach { case (ps, i) =>
      assert(got((i + 100).toLong) == ps, s"codes of vec ${i + 100}")
    }
  }

  test("pqTopK: ADC retrieval stays within the query's cluster") {
    // 10 well-separated centers (the AnnRecallSpec geometry), codebook =
    // the pure centers: every subspace code lands on the vector's own
    // cluster, so ADC ≈ 0 within the cluster and ≈ the center separation
    // across — top-10 must be dominated by same-cluster neighbors.
    val centers = Array.tabulate(10) { c =>
      val r = new Random(1000 + c)
      Array.fill(64)((r.nextDouble() * 2 - 1).toFloat)
    }
    val rows = (0 until 320).map { i =>
      val r = new Random(i)
      (i.toLong, centers(i % 10).map(x =>
        (x + 0.35 * (r.nextDouble() * 2 - 1)).toFloat).toSeq)
    }
    val e = rows.toDF("id", "embedding")
    val cbDf = centers.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toSeq.toDF("id", "embedding")
    val res = Ann.pqTopK(e.filter(col("id") < 16), e.filter(col("id") >= 16),
      cbDf, k = 10, m = 8).collect()
    assert(res.length == 160, s"16 queries × 10 = ${res.length}")
    val same = res.count(r => r.getLong(2) % 10 == r.getLong(0) % 10)
    assert(same >= (res.length * 0.9).toInt,
      s"same-cluster fraction ${same.toDouble / res.length}")
  }
}
