package graft

import org.apache.spark.sql.functions._

/** The CDX-style WARC record index (sources/Warc sidecars): offsets
  * written at member-emission time plan RANGED single-record reads —
  * the takedown/audit path that otherwise pays a whole-file parse per
  * record (gzip members are unseekable without an index). Pins:
  * index completeness, ranged ≡ full-parse content, and the byte
  * bound (bytes read = Σ selected member lengths ≪ archive bytes —
  * the LayoutSpec scan-metric discipline, here over the exact spans
  * readRanged seeks). */
class WarcCdxSpec extends SparkSpec {
  import spark.implicits._

  test("CDX sidecar: complete index, ranged reads ≡ full parse, selected bytes ≪ archive bytes") {
    val rows = (1 to 50).map(i =>
      (s"https://cdx.example/r/$i", s"body of record $i " + ("x" * 200)))
    val dir = java.nio.file.Files.createTempDirectory("graft-cdx").toString
    graft.sources.Warc.write(rows.toDF("url", "body"), "url", "body", dir,
      files = 2)

    // 1. completeness: one index row per response record, ids/uris match
    // the parsed archive exactly.
    val cdx = graft.sources.Warc.readCdx(spark, dir)
    val full = graft.sources.Warc.read(spark, dir)
    assert(cdx.count() == 50)
    assert(cdx.select(col("record_id"), col("target_uri"))
      .as[(String, String)].collect().toSet ==
      full.select(col("record_id"), col("target_uri"))
        .as[(String, String)].collect().toSet)

    // 2. ranged reads of EVERY record reproduce the full parse bitwise.
    val ranged = graft.sources.Warc.readRanged(spark, dir,
      cdx.select(col("file"), col("offset"), col("length")))
    def rel(df: org.apache.spark.sql.DataFrame) = df
      .select(col("target_uri"), expr("decode(body, 'UTF-8')"),
        col("http_status"), col("http_content_type"))
      .as[(String, String, Int, String)].collect().toSet
    assert(rel(ranged) == rel(full))

    // 3. the byte bound: a 2-record audit fetch reads Σ its member
    // lengths — a small fraction of the archive bytes a reparse pays.
    val sel = cdx.filter(col("target_uri")
      .isin("https://cdx.example/r/7", "https://cdx.example/r/31"))
    assert(sel.count() == 2)
    val selBytes = sel.agg(sum(col("length"))).collect()(0).getLong(0)
    val archiveBytes = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".warc.gz")).map(_.length).sum
    assert(selBytes * 4 < archiveBytes,
      s"selected $selBytes vs archive $archiveBytes — ranged read must be ≪ reparse")
    assert(rel(graft.sources.Warc.readRanged(spark, dir,
      sel.select(col("file"), col("offset"), col("length")))) ==
      rel(full.filter(col("target_uri")
        .isin("https://cdx.example/r/7", "https://cdx.example/r/31"))))

    // 4. the sidecar never leaks into the archive reader's glob.
    assert(full.count() == 50)
  }
}
