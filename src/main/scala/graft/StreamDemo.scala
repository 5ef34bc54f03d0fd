package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Stream

/** Example: the streaming façade end-to-end over a file stream of the
  * driver's `events` table — filter → keyed tumbling window → memory sink.
  * Usage: runMain graft.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // sort-based shuffle writer everywhere — see Bench for the rationale.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      // must be set before ANY read of events.parquet (TIMESTAMP(NANOS))
      // or Spark 4 throws ILLEGAL_PARQUET_TYPE at schema inference.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // File-streaming source with the events schema; shape it like a
    // (value, metadata) stream for the façade.
    val schema = Tables.events(spark, sfDir).schema
    // the file stream source takes a directory; select just events.parquet.
    val raw = spark.readStream.schema(
      spark.read.parquet(s"$sfDir/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val _ = schema // events schema documented above; raw carries it

    val s = Stream.fromDataFrame(spark,
        raw.select(
          struct(col("event_id"), col("event_type"), col("value")).as("value"),
          struct(lit("events").as("topic"), lit(0).as("partition"),
            col("event_id").as("offset"), col("ts").as("timestamp"),
            lit(null).cast("binary").as("key")).as("metadata")))
      .filter(col("value.event_type") === "click")
      .window("6 hours", "1 hour",
        Seq(count(lit(1)).as("n"), sum(col("value.value")).as("total")))

    val q = s.toMemory("demo_windows", outputMode = "update")
    q.processAllAvailable()
    val out = spark.table("demo_windows")
      .orderBy(col("metadata.window_start"))
    out.show(10, truncate = false)
    println(s"[demo] windows=${out.count()} stats=${s.flushStatistics()}")
    q.stop()
    spark.stop()
  }
}
