package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Greedy sequential packing of documents into fixed token-budget bins
 * — the "sequence packing" step that turns a filtered corpus into
 * training examples of at most `tokenBudget` tokens each. Within every
 * group (e.g. `source`), documents are visited in ascending id order
 * and appended to the current bin; a document that would overflow a
 * bin already holding tokens starts a new one. A single document
 * larger than the budget gets a bin of its own (zero-token documents
 * may share it — they add nothing). Appended columns: `n_tokens`,
 * `bin_index` (0-based within the group).
 *
 * Determinism: bin assignment is a pure function of the (group, id,
 * n_tokens) triples — independent of input partitioning or row order.
 *
 * Scale shape: packing is inherently sequential *within* a group (bin
 * i+1 depends on everything before it) and embarrassingly parallel
 * *across* groups, so the plan is exactly one shuffle: repartition by
 * group, sort each partition by (group, id), and run a streaming O(1)-
 * state scan per partition — groups are contiguous after the sort, so
 * state resets at each group boundary and NO group is ever
 * materialized in memory. A pathologically hot group costs time on
 * one task, never memory; pre-split such groups (salt the group col)
 * if that matters.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class SequencePacker extends AlgoOperator[SequencePacker]
    with HasInputCol[SequencePacker] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique document id column; packing order within a group.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): SequencePacker = set(idCol, v)

  final val groupCol: Param[String] =
    param[String]("groupCol", "Grouping column; packing runs independently per group.", "source")
  def getGroupCol: String = get(groupCol)
  def setGroupCol(v: String): SequencePacker = set(groupCol, v)

  final val tokenBudget: Param[Int] =
    param[Int]("tokenBudget", "Maximum tokens per bin.", 2048, ParamValidators.gt(0))
  def getTokenBudget: Int = get(tokenBudget)
  def setTokenBudget(v: Int): SequencePacker = set(tokenBudget, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val budget = getTokenBudget
    val text = col(getInputCol)
    // coalesce: null text must count as 0 tokens, not propagate null
    // into the packing scan's getInt
    val nTokens = coalesce(
      when(length(trim(text)) === 0, 0)
        .otherwise(size(split(trim(text), "\\s+"))),
      lit(0))

    val slim = df.select(
      col(getGroupCol).cast("string").as("__g"),
      col(getIdCol).as("__id"),
      nTokens.as("n_tokens"))
    val parts = slim.sparkSession.sessionState.conf.numShufflePartitions
    val packed = slim
      .repartition(parts, col("__g"))
      .sortWithinPartitions("__g", "__id")
      .mapPartitions { it =>
        // groups are contiguous post-sort: O(1) running state, reset
        // at each group boundary — never a whole group in memory
        var curGroup: String = null
        var running = 0L
        var bin = -1L
        it.map { r =>
          val g = r.getString(0)
          val n = r.getInt(2).toLong
          if (g != curGroup) { curGroup = g; running = 0L; bin = -1L }
          if (bin < 0 || (running > 0 && running + n > budget)) { bin += 1; running = 0L }
          running += n
          Row(g, r.get(1), n, bin)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(StructType(Seq(
        StructField("__g", StringType),
        StructField("__id", slim.schema("__id").dataType),
        StructField("n_tokens", LongType),
        StructField("bin_index", LongType)))))
    Array(df.join(packed.drop("__g"), df(getIdCol) === packed("__id"))
      .drop("__id"))
  }
}
object SequencePacker extends StageLoader[SequencePacker] {
  def load(spark: SparkSession, path: String): SequencePacker =
    ReadWrite.applyParams(new SequencePacker, path)
}
