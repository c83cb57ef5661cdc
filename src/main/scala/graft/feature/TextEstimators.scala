package graft.feature

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.param._
import graft.util.ReadWrite

// ---------------------------------------------------------------------------
// CountVectorizer
// ---------------------------------------------------------------------------

/**
 * CountVectorizer: learn a vocabulary from a corpus of string arrays
 * (bounded by vocabularySize, filtered by document frequency minDF /
 * maxDF), transform to term-count sparse vectors (minTF, binary).
 * Reference: feature/countvectorizer/CountVectorizer.java:63.
 * Ordering: term count descending (ties broken by term ascending for
 * determinism; the reference's tie order is hash-map arbitrary).
 */
class CountVectorizer extends Estimator[CountVectorizer, CountVectorizerModel]
    with HasInputCol[CountVectorizer] with HasOutputCol[CountVectorizer] {

  final val vocabularySize: Param[Int] =
    param[Int]("vocabularySize", "Max vocabulary size", 1 << 18, ParamValidators.gt(0))
  final val minDF: Param[Double] =
    param[Double]("minDF", "Min number/fraction of documents a term must appear in", 1.0, ParamValidators.gtEq(0))
  final val maxDF: Param[Double] =
    param[Double]("maxDF", "Max number/fraction of documents a term may appear in", Long.MaxValue.toDouble, ParamValidators.gtEq(0))
  final val minTF: Param[Double] =
    param[Double]("minTF", "Min term count/fraction within a document (transform-time)", 1.0, ParamValidators.gtEq(0))
  final val binary: Param[Boolean] =
    param[Boolean]("binary", "If all non-zero counts are set to 1", false)

  def setVocabularySize(v: Int): CountVectorizer = set(vocabularySize, v)
  def setMinDF(v: Double): CountVectorizer = set(minDF, v)
  def setMaxDF(v: Double): CountVectorizer = set(maxDF, v)
  def setMinTF(v: Double): CountVectorizer = set(minTF, v)
  def setBinary(v: Boolean): CountVectorizer = set(binary, v)
  def getVocabularySize: Int = get(vocabularySize)
  def getMinDF: Double = get(minDF)
  def getMaxDF: Double = get(maxDF)
  def getMinTF: Double = get(minTF)
  def getBinary: Boolean = get(binary)

  override def fit(inputs: DataFrame*): CountVectorizerModel = {
    require(inputs.size == 1)
    val df = inputs.head
    // numDocs is only needed to resolve FRACTIONAL minDF/maxDF; with the
    // default integer thresholds, skip the extra full pass over the
    // (often UDF-heavy) upstream pipeline entirely
    lazy val numDocs = df.count()
    val minDfCount = if (getMinDF >= 1.0) getMinDF else getMinDF * numDocs
    val maxDfCount = if (getMaxDF >= 1.0) getMaxDF else getMaxDF * numDocs
    // reference CountVectorizer rejects maxDF < minDF at fit (the
    // resolved counts make mixed int/fraction settings comparable)
    require(maxDfCount >= minDfCount,
      s"maxDF must be >= minDF but got minDF=$getMinDF, maxDF=$getMaxDF.")

    // single pass: pre-aggregate term counts inside each document, then
    // one shuffle gets both the corpus term count (sum of local counts)
    // and the document frequency (rows = docs containing the term) —
    // no second explode, no tf⋈df join, and the explode emits one row
    // per DISTINCT term per doc rather than one per occurrence.
    // Measured (round 5, 500k docs × 100 tokens × 1k terms, local[32],
    // min of 2 warm runs): this UDF-map shape 1.5 s vs the older
    // codegen dual-explode (per-occurrence explode → groupBy(doc,term)
    // → groupBy(term)) 6.1 s — the in-row map keeps the 50M occurrence
    // rows out of the first shuffle, which dominates the UDF cost
    val localCounts = udf { terms: Seq[String] =>
      if (terms == null) null
      else {
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        terms.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
        m
      }
    }
    val termStats = df
      .select(explode(localCounts(col(getInputCol))).as(Seq("term", "cnt")))
      .groupBy("term")
      .agg(sum("cnt").as("tf"), count(lit(1)).as("df_"))
      .where(col("df_") >= minDfCount && col("df_") <= maxDfCount)
      .orderBy(desc("tf"), asc("term"))
      .limit(getVocabularySize)

    val vocab = termStats.select("term").collect().map(_.getString(0))
    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = Seq(Tuple1(vocab)).toDF("vocabulary")
    val m = new CountVectorizerModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object CountVectorizer extends StageLoader[CountVectorizer] {
  def load(spark: SparkSession, path: String): CountVectorizer =
    ReadWrite.applyParams(new CountVectorizer, path)
}

class CountVectorizerModel extends Model[CountVectorizerModel]
    with HasInputCol[CountVectorizerModel] with HasOutputCol[CountVectorizerModel] {

  final val minTF: Param[Double] =
    param[Double]("minTF", "Min term count/fraction within a document (transform-time)", 1.0, ParamValidators.gtEq(0))
  final val binary: Param[Boolean] =
    param[Boolean]("binary", "If all non-zero counts are set to 1", false)
  def getMinTF: Double = get(minTF)
  def getBinary: Boolean = get(binary)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): CountVectorizerModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val vocab = modelData.select("vocabulary").head().getSeq[String](0).toArray
    val bcVocab = df.sparkSession.sparkContext.broadcast(vocab.zipWithIndex.toMap)
    val (minTf, bin) = (getMinTF, getBinary)
    val encode = udf { terms: Seq[String] =>
      if (terms == null) null
      else {
        val index = bcVocab.value
        val counts = scala.collection.mutable.HashMap.empty[Int, Double]
        terms.foreach { t =>
          index.get(t).foreach(i => counts(i) = counts.getOrElse(i, 0.0) + 1.0)
        }
        val threshold = if (minTf >= 1.0) minTf else minTf * terms.length
        val kept = counts.toArray.filter(_._2 >= threshold).sortBy(_._1)
        Vectors.sparse(index.size, kept.map(_._1), kept.map(p => if (bin) 1.0 else p._2))
      }
    }
    Array(df.withColumn(getOutputCol, encode(col(getInputCol))))
  }
}
object CountVectorizerModel extends StageLoader[CountVectorizerModel] {
  def load(spark: SparkSession, path: String): CountVectorizerModel = {
    val m = ReadWrite.applyParams(new CountVectorizerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

// ---------------------------------------------------------------------------
// IDF
// ---------------------------------------------------------------------------

/**
 * IDF: inverse document frequency model over a vector column (term
 * counts), idf = log((numDocs + 1) / (docFreq + 1)); dims with
 * docFreq < minDocFreq get idf 0.
 * Reference: feature/idf/IDF.java:64.
 */
class IDF extends Estimator[IDF, IDFModel]
    with HasInputCol[IDF] with HasOutputCol[IDF] {

  final val minDocFreq: Param[Int] =
    param[Int]("minDocFreq", "Min number of documents a term must appear in", 0, ParamValidators.gtEq(0))
  def setMinDocFreq(v: Int): IDF = set(minDocFreq, v)
  def getMinDocFreq: Int = get(minDocFreq)

  override def fit(inputs: DataFrame*): IDFModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val minDf = getMinDocFreq
    // one pass: per-dim docFreq + total docs, partial-agg + tree merge
    val (docFreq, numDocs) = df.select(col(getInputCol)).rdd
      .map(_.getAs[Vector](0))
      .filter(_ != null)
      .treeAggregate((Array.empty[Long], 0L))(
        seqOp = { case ((freq, n), v) =>
          val f = if (freq.isEmpty) new Array[Long](v.size) else freq
          v.foreachActive { (i, x) => if (x != 0.0) f(i) += 1 }
          (f, n + 1)
        },
        combOp = { case ((f1, n1), (f2, n2)) =>
          if (f1.isEmpty) (f2, n1 + n2)
          else if (f2.isEmpty) (f1, n1 + n2)
          else { var i = 0; while (i < f1.length) { f1(i) += f2(i); i += 1 }; (f1, n1 + n2) }
        })
    val idf = docFreq.map(d =>
      if (d < minDf) 0.0 else math.log((numDocs + 1.0) / (d + 1.0)))
    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = Seq((idf, docFreq, numDocs)).toDF("idf", "docFreq", "numDocs")
      .select(org.apache.spark.ml.functions.array_to_vector(col("idf")).as("idf"),
        col("docFreq"), col("numDocs"))
    val m = new IDFModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object IDF extends StageLoader[IDF] {
  def load(spark: SparkSession, path: String): IDF = ReadWrite.applyParams(new IDF, path)
}

class IDFModel extends Model[IDFModel]
    with HasInputCol[IDFModel] with HasOutputCol[IDFModel] {

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): IDFModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val idf = modelData.select("idf").head().getAs[Vector](0).toArray
    val f = udf { v: Vector =>
      v match {
        case null => null
        case d: org.apache.spark.ml.linalg.DenseVector =>
          Vectors.dense(Array.tabulate(d.size)(i => d.values(i) * idf(i)))
        case s: org.apache.spark.ml.linalg.SparseVector =>
          Vectors.sparse(s.size, s.indices, s.indices.zip(s.values).map { case (i, x) => x * idf(i) })
      }
    }
    Array(inputs.head.withColumn(getOutputCol, f(col(getInputCol))))
  }
}
object IDFModel extends StageLoader[IDFModel] {
  def load(spark: SparkSession, path: String): IDFModel = {
    val m = ReadWrite.applyParams(new IDFModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

// ---------------------------------------------------------------------------
// StringIndexer / IndexToString
// ---------------------------------------------------------------------------

object StringOrderType {
  val ARBITRARY = "arbitrary"
  val FREQUENCY_DESC = "frequencyDesc"
  val FREQUENCY_ASC = "frequencyAsc"
  val ALPHABET_DESC = "alphabetDesc"
  val ALPHABET_ASC = "alphabetAsc"
  val all: Seq[String] = Seq(ARBITRARY, FREQUENCY_DESC, FREQUENCY_ASC, ALPHABET_DESC, ALPHABET_ASC)
}

/**
 * StringIndexer: map string/numeric columns to indices ordered by
 * frequency/alphabet (multi-column); maxIndexNum caps the vocabulary
 * (frequencyDesc only); handleInvalid keep (index = #distinct) /
 * skip / error. Reference: feature/stringindexer/StringIndexer.java:98
 * (count agg :119-145).
 */
class StringIndexer extends Estimator[StringIndexer, StringIndexerModel]
    with HasInputCols[StringIndexer] with HasOutputCols[StringIndexer]
    with HasHandleInvalid[StringIndexer] {

  final val stringOrderType: Param[String] =
    param[String]("stringOrderType", "How to order strings before assigning indices",
      StringOrderType.ARBITRARY, ParamValidators.inArray(StringOrderType.all: _*))
  final val maxIndexNum: Param[Int] =
    param[Int]("maxIndexNum", "Max number of indices per column (frequencyDesc only)",
      Int.MaxValue, ParamValidators.gt(1))
  def setStringOrderType(v: String): StringIndexer = set(stringOrderType, v)
  def setMaxIndexNum(v: Int): StringIndexer = set(maxIndexNum, v)
  def getStringOrderType: String = get(stringOrderType)
  def getMaxIndexNum: Int = get(maxIndexNum)

  override def fit(inputs: DataFrame*): StringIndexerModel = {
    require(inputs.size == 1)
    if (getMaxIndexNum < Int.MaxValue)
      require(getStringOrderType == StringOrderType.FREQUENCY_DESC,
        "maxIndexNum < Int.MaxValue only works with stringOrderType=frequencyDesc")
    val df = inputs.head
    val order = getStringOrderType

    // one shuffle for all columns: (colIdx, value) → count. Ordering and
    // the maxIndexNum cap both stay distributed: a capped column becomes
    // orderBy+limit (TakeOrdered — per-partition bounded heaps, driver
    // receives only `cap` rows), an uncapped one a range-partitioned sort
    // whose collect is O(vocabulary) — the size the model must hold anyway.
    val cols = getInputCols
    val counted = df.select(posexplode(array(
      cols.map(c => col(c).cast("string")).toIndexedSeq: _*)).as(Seq("colIdx", "value")))
      .where(col("value").isNotNull)
      .groupBy("colIdx", "value").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val sortExprs: Seq[org.apache.spark.sql.Column] = order match {
      case StringOrderType.FREQUENCY_DESC => Seq(col("cnt").desc, col("value").asc)
      case StringOrderType.FREQUENCY_ASC  => Seq(col("cnt").asc, col("value").asc)
      case StringOrderType.ALPHABET_DESC  => Seq(col("value").desc)
      case _                              => Seq(col("value").asc) // alphabetAsc + arbitrary
    }
    val cap = getMaxIndexNum
    val arrays: Array[Array[String]] = cols.indices.map { i =>
      val sorted = counted.where(col("colIdx") === i).orderBy(sortExprs: _*)
      val capped = if (cap < Int.MaxValue) sorted.limit(cap) else sorted
      capped.select("value").collect().map(_.getString(0))
    }.toArray
    counted.unpersist(blocking = false)

    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = arrays.zipWithIndex
      .map { case (terms, i) => (i, terms) }.toSeq.toDF("colIdx", "terms")
    val m = new StringIndexerModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object StringIndexer extends StageLoader[StringIndexer] {
  def load(spark: SparkSession, path: String): StringIndexer =
    ReadWrite.applyParams(new StringIndexer, path)
}

class StringIndexerModel extends Model[StringIndexerModel]
    with HasInputCols[StringIndexerModel] with HasOutputCols[StringIndexerModel]
    with HasHandleInvalid[StringIndexerModel] {

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): StringIndexerModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val arrays = modelData.select("colIdx", "terms").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[String](1).zipWithIndex.toMap)
    val invalid = getHandleInvalid
    val cols = getInputCols
    val outs = getOutputCols
    val bc = df.sparkSession.sparkContext.broadcast(arrays)

    var out = df
    cols.zip(outs).zipWithIndex.foreach { case ((in, o), i) =>
      val lookup = udf { s: String =>
        val m = bc.value(i)
        if (s == null) {
          if (invalid == HandleInvalid.KEEP) Some(m.size.toDouble) else None
        } else m.get(s) match {
          case Some(idx) => Some(idx.toDouble)
          case None => if (invalid == HandleInvalid.KEEP) Some(m.size.toDouble) else None
        }
      }
      out = out.withColumn(o, lookup(col(in).cast("string")))
    }
    invalid match {
      case HandleInvalid.SKIP =>
        outs.foreach(o => out = out.filter(col(o).isNotNull))
      case HandleInvalid.ERROR =>
        outs.foreach { o =>
          out = out.withColumn(o, when(col(o).isNull,
            raise_error(lit("The input contains unseen string values. See handleInvalid parameter for more options."))
              .cast("double")).otherwise(col(o)))
        }
      case _ =>
    }
    Array(out)
  }
}
object StringIndexerModel extends StageLoader[StringIndexerModel] {
  def load(spark: SparkSession, path: String): StringIndexerModel = {
    val m = ReadWrite.applyParams(new StringIndexerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

/**
 * IndexToStringModel: inverse mapping of StringIndexerModel (index
 * column → original string). Reference:
 * feature/stringindexer/IndexToStringModel.java.
 */
class IndexToStringModel extends Model[IndexToStringModel]
    with HasInputCols[IndexToStringModel] with HasOutputCols[IndexToStringModel] {

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): IndexToStringModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val arrays = modelData.select("colIdx", "terms").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[String](1).toArray)
    val bc = df.sparkSession.sparkContext.broadcast(arrays)
    var out = df
    getInputCols.zip(getOutputCols).zipWithIndex.foreach { case ((in, o), i) =>
      val lookup = udf { idx: java.lang.Double =>
        if (idx == null) null
        else {
          val terms = bc.value(i)
          val j = idx.intValue()
          if (j >= 0 && j < terms.length) terms(j)
          else throw new RuntimeException(
            // reference IndexToStringModel.java unseen-index error text
            s"The input contains unseen index: $j.")
        }
      }
      out = out.withColumn(o, lookup(col(in).cast("double")))
    }
    Array(out)
  }
}
object IndexToStringModel extends StageLoader[IndexToStringModel] {
  def load(spark: SparkSession, path: String): IndexToStringModel = {
    val m = ReadWrite.applyParams(new IndexToStringModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
