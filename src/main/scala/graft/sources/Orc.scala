package graft.sources

import org.apache.spark.sql.DataFrame

/** ORC interchange — the COLUMNAR egress/ingest twin of [[Jsonl]]/[[Csv]]
  * for pipelines whose neighbors speak the Hive/Trino stack rather than
  * parquet.
  *
  * Scale contract (and where it differs from the text formats):
  *  - ORC is typed and SPLITTABLE (stripe-level splits), so unlike the
  *    gzip-JSONL contract the output file count does NOT bound re-ingest
  *    parallelism — `files` only shapes object sizes;
  *  - predicate pushdown and column pruning work on re-ingest exactly as
  *    on parquet (stripe/row-group statistics; `SourceFormatsSpec` pins
  *    the pushed filter), so an ORC handoff does not forfeit the scan
  *    optimizations the 100 TB plans rely on;
  *  - values round-trip exactly for every Spark SQL type (no text
  *    escaping layer at all) — `x_source_orc` pins the trip against the
  *    parquet original via the same null-safe flag join as the text
  *    formats. Still pass the writer's schema on read: it skips footer
  *    schema merging across many files.
  */
object Orc {

  /** Write `df` as ORC under `path` in `files` files, then read it back
    * with `df`'s own schema. The write is eager (same discipline as
    * [[Tables.stage]]); the returned frame scans the ORC copy. */
  def roundTrip(df: DataFrame, path: String, files: Int): DataFrame = {
    require(files > 0, s"files=$files must be positive")
    df.repartition(files).write.mode("overwrite").orc(path)
    df.sparkSession.read.schema(df.schema).orc(path)
  }
}
