package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one implemented operator from
  * SURVEY.md §2 against the driver testdata; `oracleSql` holds the
  * DuckDB-equivalent SQL for the hash-compare correctness gate.
  * Column names/aliases are kept identical on both sides.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = t(spark, dir, "lineitem")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_extendedprice", "l_discount")
      .setOutputCol("features").setInputSizes(1, 1, 1)
      .transform(li).head
    new graft.feature.SQLTransformer()
      .setStatement("""SELECT l_returnflag, COUNT(*) AS n, ROUND(AVG(l_quantity), 4) AS avg_qty
                       FROM __THIS__ GROUP BY l_returnflag""")
      .transform(assembled).head
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- SQLTransformer (full Spark SQL surface through one operator) ---
    "q_sql_pricing" -> ((s, dir) => {
      new graft.feature.SQLTransformer().setStatement(
        """SELECT l_returnflag, l_linestatus,
                  ROUND(SUM(l_quantity), 2) AS sum_qty,
                  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                  COUNT(*) AS count_order
           FROM __THIS__
           GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""")
        .transform(t(s, dir, "lineitem")).head
    }),

    // --- Tokenizer ---
    "q_tokenizer" -> ((s, dir) => {
      val out = new graft.feature.Tokenizer()
        .setInputCol("text").setOutputCol("tokens")
        .transform(t(s, dir, "documents")).head
      out.select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"))
    }),

    // --- RegexTokenizer ---
    "q_regex_tokenizer" -> ((s, dir) => {
      val out = new graft.feature.RegexTokenizer()
        .setInputCol("text").setOutputCol("tokens")
        .setPattern("\\W+").setMinTokenLength(3)
        .transform(t(s, dir, "documents")).head
      out.select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"))
    }),

    // --- NGram ---
    "q_ngram" -> ((s, dir) => {
      val toks = new graft.feature.RegexTokenizer()
        .setInputCol("text").setOutputCol("tokens").setPattern("\\W+")
        .transform(t(s, dir, "documents")).head
      val grams = new graft.feature.NGram()
        .setInputCol("tokens").setOutputCol("grams").setN(2)
        .transform(toks).head
      grams.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
    }),

    // --- Binarizer ---
    "q_binarizer" -> ((s, dir) => {
      val out = new graft.feature.Binarizer()
        .setInputCols("l_discount").setOutputCols("high_discount")
        .setThresholds(0.05)
        .transform(t(s, dir, "lineitem")).head
      out.groupBy("high_discount")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
    }),

    // --- Bucketizer ---
    "q_bucketizer" -> ((s, dir) => {
      val out = new graft.feature.Bucketizer()
        .setInputCols("l_quantity").setOutputCols("qty_bucket")
        .setSplitsArray(Array(Array(0.0, 10.0, 20.0, 30.0, 40.0, 51.0)))
        .setHandleInvalid("keep")
        .transform(t(s, dir, "lineitem")).head
      out.groupBy("qty_bucket").agg(count(lit(1)).as("n")).orderBy("qty_bucket")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_sql_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                ROUND(SUM(l_quantity), 2) AS sum_qty,
                ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                COUNT(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q_tokenizer" ->
      """SELECT doc_id, len(string_split_regex(rtrim(lower(text)), '\s')) AS n_tokens
         FROM documents""",

    "q_regex_tokenizer" ->
      """SELECT doc_id,
                len(list_filter(string_split_regex(lower(text), '\W+'),
                    t -> len(t) >= 3)) AS n_tokens
         FROM documents""",

    "q_ngram" ->
      """SELECT doc_id,
                greatest(len(list_filter(string_split_regex(lower(text), '\W+'),
                    t -> len(t) >= 1)) - 1, 0) AS n_grams
         FROM documents""",

    "q_binarizer" ->
      """SELECT CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END AS high_discount,
                COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS sum_price
         FROM lineitem GROUP BY 1""",

    "q_bucketizer" ->
      """SELECT CASE
                  WHEN l_quantity >= 0 AND l_quantity < 10 THEN 0.0
                  WHEN l_quantity >= 10 AND l_quantity < 20 THEN 1.0
                  WHEN l_quantity >= 20 AND l_quantity < 30 THEN 2.0
                  WHEN l_quantity >= 30 AND l_quantity < 40 THEN 3.0
                  WHEN l_quantity >= 40 AND l_quantity <= 51 THEN 4.0
                  ELSE 5.0 END AS qty_bucket,
                COUNT(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY 1"""
  )
}
