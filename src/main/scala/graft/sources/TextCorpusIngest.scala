package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Wire-format ingest for text corpora and stage files — the two
  * formats a real pipeline actually receives: JSONL (how LLM corpora
  * ship — one document object per line, usually gzipped, which Spark
  * decompresses by extension) and CSV (the reference pipeline's
  * inter-stage format: every bin stage script writes/reads CSVs).
  *
  * Policy, identical for both:
  *  - EXPLICIT schema, never inference — schema inference is a full
  *    extra pass over the data before the real one (2x the corpus read
  *    at 100 TB) and silently widens types on dirty rows;
  *  - PERMISSIVE parse with the corrupt raw line CAPTURED, then a
  *    (clean, quarantine) SPLIT — a malformed line in a 100 TB crawl
  *    is data (you want to count, sample and re-parse it), never a
  *    silent drop (DROPMALFORMED) and never a job kill (FAILFAST).
  *
  * The split must materialize the parse once: Spark refuses a filter
  * on the corrupt-record column directly over a file scan (the parser
  * would have to re-run with different required columns — see
  * SPARK-21610), so the parsed frame is persisted and BOTH halves read
  * the one parse. The quarantine half carries the raw line for
  * re-processing.
  */
object TextCorpusIngest {

  private val CorruptCol = "_corrupt"

  /** JSONL corpus read → (clean, quarantine). `clean` has exactly the
    * schema's columns; `quarantine` is (raw_line string). */
  def jsonl(spark: SparkSession, path: String,
            schema: StructType): (DataFrame, DataFrame) =
    split(spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path), schema)

  /** CSV stage-file read → (clean, quarantine); `header` matches the
    * reference stage files. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): (DataFrame, DataFrame) =
    split(spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .csv(path), schema)

  private def split(parsed: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val once = parsed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clean = once.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val quarantine = once.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    // the caller writes clean and quarantine as two actions off the
    // one cached parse: release after the second (best-effort cleanup)
    graft.functions.CacheRelease.afterNextExecution(once, uses = 2)
    (clean, quarantine)
  }
}
