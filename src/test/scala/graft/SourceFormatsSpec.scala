package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** File-format source coverage beyond parquet (the reference reads Kafka
  * only — §2.3; Spark's readers make csv/json extension surface free).
  * Round-trips the events table through each format and checks parity. */
class SourceFormatsSpec extends SparkSpec {

  private lazy val events =
    Tables.events(spark, sf("sf0.001")).select("event_id", "event_type", "value")

  test("json round-trip preserves rows and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    events.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == events.count())
    val a = events.agg(sum(col("value")).cast("decimal(20,2)")).collect()(0).getDecimal(0)
    val b = back.agg(sum(col("value")).cast("decimal(20,2)")).collect()(0).getDecimal(0)
    assert(a == b)
  }

  test("csv round-trip with header + explicit schema preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    events.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(events.schema).csv(dir)
    assert(back.count() == events.count())
    assert(back.filter(col("event_type") === "click").count() ==
      events.filter(col("event_type") === "click").count())
  }

  test("orc round-trip preserves rows, schema, and pushes filters down") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val back = graft.sources.Orc.roundTrip(events, dir, files = 2)
    assert(back.schema == events.schema)
    assert(back.count() == events.count())
    // ORC scans participate in predicate pushdown like parquet.
    val plan = back.filter(col("event_id") < 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,100)]")
      || plan.contains("LessThan(event_id,100)"), plan.take(600))
  }

  test("Jsonl.roundTrip: gzip JSONL is lossless on hostile text") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "line\nbreak\ttab\rcr"),
      (2L, "quote\"back\\slash/fwd"),
      (3L, "caf\u00e9 \u65e5\u672c\u8a9e non-BMP \ud83d\ude00 \u2028ls\u2029ps"),
      (4L, "ctrl\u0001\u0002 nul\u0000 bell\u0007"),
      (5L, null.asInstanceOf[String]),
      (6L, "")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val back = graft.sources.Jsonl.roundTrip(nasty, dir, files = 2)
    // the files on disk really are gzip members.
    val gz = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".json.gz"))
    assert(gz.nonEmpty, new java.io.File(dir).listFiles.map(_.getName).mkString(","))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows(back) == rows(nasty))
    // JSON scans surface every field nullable (a row may omit any key) —
    // names and types survive, nullability intentionally does not.
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      nasty.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    intercept[IllegalArgumentException] {
      graft.sources.Jsonl.roundTrip(nasty, dir, files = 0)
    }
  }

  test("Csv.roundTrip: RFC-4180 CSV is lossless on hostile text") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "comma, separated, values"),
      (2L, "embedded \"quotes\" and \"\"doubled\"\""),
      (3L, "line\nbreak and\r\ncrlf"),
      (4L, "café 日本語 non-BMP 😀"),
      (5L, null.asInstanceOf[String]),
      (6L, ""),
      (7L, "trailing space  "),
      (8L, "\"leading quote")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-csvrt").toString
    val back = graft.sources.Csv.roundTrip(nasty, dir, files = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    // exact, INCLUDING null vs empty string staying distinct.
    assert(rows(back) == rows(nasty))
    // the quote dialect on disk is doubled quotes (RFC 4180), not
    // Spark's default backslash escaping — what external readers parse.
    val text = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".csv"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
      .mkString("\n")
    assert(text.contains("\"\"quotes\"\""), text.take(400))
    assert(!text.contains("\\\""), text.take(400))
    intercept[IllegalArgumentException] {
      graft.sources.Csv.roundTrip(nasty, dir, files = 0)
    }
  }
}
