package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * JSONL corpus ingest with a PINNED schema and corrupt-record
 * ROUTING — the standard shape for reading a web-scale text corpus
 * (jsonl / jsonl.gz shards) where malformed lines are a fact of life:
 *
 *  - the schema is supplied, never inferred (inference is a full
 *    extra pass over 100 TB and can silently widen types between
 *    runs);
 *  - malformed lines neither kill the job (FAILFAST) nor silently
 *    become all-null rows (plain PERMISSIVE): they are returned as a
 *    SECOND DataFrame carrying the raw line and its file, so ingest
 *    can quantify and quarantine them;
 *  - `addSourceFile = true` stamps each record with its shard file
 *    (`input_file_name`), the usual provenance column for per-source
 *    mixing and dedup planning.
 *
 * Scale shape: one pass, no shuffle — the corpus is scanned as TEXT
 * (line-splittable for plain shards, per-file for gzip) and parsed
 * with `from_json` (the same Jackson parser the JSON file source
 * uses). Reading as text sidesteps Spark's corrupt-only-projection
 * restriction on raw JSON file relations
 * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the
 * corrupt side stays a lazy view — no cache of a 100 TB scan.
 */
object CorpusReader {

  val CorruptCol = "_graft_corrupt_record"

  /**
   * @param schema pinned record schema (without the corrupt column).
   * @return (records, corrupt): `records` has exactly `schema`'s
   *         columns (plus `source_file` when requested) for lines
   *         that parsed; `corrupt` has (raw_line, source_file) for
   *         lines that did not.
   */
  def jsonl(spark: SparkSession, path: String, schema: StructType,
      addSourceFile: Boolean = false): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not contain the reserved column $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, "string")
    val parsed = spark.read.textFile(path).toDF("__line")
      .withColumn("__file", input_file_name())
      .where(length(trim(col("__line"))) > 0)   // blank lines are not records
      .withColumn("__rec", from_json(col("__line"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
    // from_json returns null (rather than a corrupt-marked struct) for
    // lines that are not JSON at all — both shapes are corrupt here
    val bad = col("__rec").isNull || col(s"__rec.$CorruptCol").isNotNull
    val records0 = parsed
      .where(!bad)
      .select(schema.fieldNames.map(f => col(s"__rec.$f")).toSeq :+ col("__file"): _*)
    val records =
      if (addSourceFile) records0.withColumnRenamed("__file", "source_file")
      else records0.drop("__file")
    val corrupt = parsed
      .where(bad)
      .select(col("__line").as("raw_line"), col("__file").as("source_file"))
    (records, corrupt)
  }
}
