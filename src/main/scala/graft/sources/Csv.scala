package graft.sources

import org.apache.spark.sql.DataFrame

/** CSV egress + ingest — the interchange format legacy producers actually
  * emit. Parquet remains the at-rest format; CSV exists for boundaries
  * where the other side cannot read parquet or JSONL.
  *
  * Dialect: RFC 4180. Spark's CSV writer defaults to BACKSLASH escaping
  * (`"a \"b\""`), which most non-Spark consumers (DuckDB, Excel, Python's
  * csv module) reject or misparse — [[roundTrip]] pins `escape = "` so
  * quotes double (`"a ""b"""`) and the files interchange cleanly.
  *
  * Scale contract:
  *  - ALWAYS pass an explicit schema on read ([[roundTrip]] reuses the
  *    writer's); inference is a full extra pass over the corpus.
  *  - Free-text columns force `multiLine = true` on read (embedded
  *    newlines make line-splitting ambiguous) — and multiLine CSV is NOT
  *    splittable: one scan task per file, so the output file count IS the
  *    downstream ingest parallelism, exactly like gzip JSONL. A corpus
  *    with no embedded newlines can skip multiLine and split freely.
  *  - Null vs empty string survive distinctly: Spark writes null as the
  *    bare empty field and the empty string as `""`; the reader maps them
  *    back asymmetrically only if `emptyValue` stays at its default.
  *    `x_source_csv` pins all of this against the parquet original.
  */
object Csv {

  /** Write `df` as headered RFC-4180 CSV under `path` in `files` files,
    * then read it back with `df`'s own schema. The write is eager (same
    * discipline as [[Tables.stage]]); the returned frame scans the CSV
    * copy with `multiLine` on, so free-text columns round-trip. */
  def roundTrip(df: DataFrame, path: String, files: Int): DataFrame = {
    require(files > 0, s"files=$files must be positive")
    df.repartition(files).write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      // Spark's CSV WRITER trims cell whitespace by default (the reader
      // does not) — loses "trailing space  " silently. Keep cells verbatim.
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
    df.sparkSession.read.schema(df.schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      // The writer emits null as the bare empty field and "" as a quoted
      // empty — distinct on disk. The reader's nullValue check runs AFTER
      // unquoting (default nullValue = ""), so both would collapse to
      // null; only the parser-level distinction survives: a bare empty
      // field parses to null BEFORE the nullValue comparison, a quoted
      // empty parses to "". Pointing nullValue at NUL disables the
      // post-unquote collapse and keeps null vs empty string distinct.
      // EXCLUSION: a cell whose actual value is the lone string NUL (U+0000)
      // is written unquoted (NUL is not a quote-trigger char) and reads
      // back as null — that one value is outside the losslessness
      // contract. Callers with adversarial binary-ish text should route
      // through Jsonl (base64-exact) instead.
      .option("nullValue", "\u0000")
      .csv(path)
  }
}
