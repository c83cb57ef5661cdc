package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed parquet storage for co-located joins: write a table hashed
 * into `numBuckets` files per partition on `bucketCols` (and sorted
 * within buckets), and every later equi-join or aggregation on those
 * columns reads pre-shuffled data — Catalyst drops the Exchange (and
 * with a matching sort order, the Sort) entirely. THE storage-layout
 * lever for a 100 TB corpus that is joined on the same key every day
 * (doc_id joins against per-doc feature tables, user_id joins against
 * behavior aggregates): the shuffle is paid ONCE at ingest instead of
 * per query.
 *
 * Facts the spec pins (BucketedStoreSpec):
 *  - bucketed ⋈ bucketed on the bucket key: zero Exchange in the plan;
 *  - bucketed groupBy(bucket key): zero Exchange;
 *  - bucketed ⋈ unbucketed: only the unbucketed side shuffles.
 *
 * Spark requires a catalog table for bucketing metadata (plain
 * `.parquet(path)` writes lose it), so tables are registered in the
 * session catalog with an explicit external `path` — drop the table,
 * keep the files.
 */
object BucketedStore {

  /** Write `df` as an external bucketed table at `path`. Buckets and
    * sorts by `bucketCols` (sorted buckets additionally remove the
    * per-side Sort under sort-merge join). */
  def write(
      df: DataFrame,
      table: String,
      path: String,
      numBuckets: Int,
      bucketCols: Seq[String],
      mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(numBuckets > 0, "numBuckets must be positive")
    df.write
      .mode(mode)
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** The bucketed table as a DataFrame (bucket metadata attached). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Drop the catalog entry; the parquet files at `path` survive. */
  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
}
