package graft.feature

import com.google.common.hash.Hashing
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{OneToOne, StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

private[feature] object Murmur {
  // murmur3_32 seed 0, matching the reference's guava HASH_FUNC
  // (feature/hashingtf/HashingTF.java, feature/featurehasher/FeatureHasher.java)
  @transient lazy val h = Hashing.murmur3_32_fixed(0)
  def hashUnencodedChars(s: CharSequence): Int = h.hashUnencodedChars(s).asInt()
  def hashInt(i: Int): Int = h.hashInt(i).asInt()
  def hashLong(l: Long): Int = h.hashLong(l).asInt()

  /** Reference HashingTF.hash(Object): type-directed murmur3. */
  def hashAny(obj: Any): Int = obj match {
    case null       => 0
    case b: Boolean => hashInt(if (b) 1 else 0)
    case b: Byte    => hashInt(b.toInt)
    case s: Short   => hashInt(s.toInt)
    case i: Int     => hashInt(i)
    case l: Long    => hashLong(l)
    case f: Float   => hashInt(java.lang.Float.floatToIntBits(f))
    case d: Double  => hashLong(java.lang.Double.doubleToLongBits(d))
    case s: String  => hashUnencodedChars(s)
    case o          => hashUnencodedChars(o.toString)
  }

  def nonNegativeMod(x: Int, mod: Int): Int = { val r = x % mod; if (r < 0) r + mod else r }
}

/**
 * HashingTF: term frequencies by hashing terms into numFeatures buckets
 * (murmur3_32 seed 0, same as the reference).
 * Reference: feature/hashingtf/HashingTF.java:69.
 */
class HashingTF extends Transformer[HashingTF] with OneToOne[HashingTF]
    with HasInputCol[HashingTF] with HasOutputCol[HashingTF]
    with HasNumFeatures[HashingTF] {

  final val binary: Param[Boolean] =
    param[Boolean]("binary", "If all term counts are set to 1", false)
  def setBinary(v: Boolean): HashingTF = set(binary, v)
  def getBinary: Boolean = get(binary)

  override protected def transformOne(df: DataFrame): DataFrame = {
    val (bin, nf) = (getBinary, getNumFeatures)
    val tf = udf { terms: Seq[String] =>
      if (terms == null) null
      else {
        val map = scala.collection.mutable.HashMap.empty[Int, Double]
        terms.foreach { t =>
          val idx = Murmur.nonNegativeMod(Murmur.hashAny(t), nf)
          if (bin) map(idx) = 1.0
          else map(idx) = map.getOrElse(idx, 0.0) + 1.0
        }
        val sorted = map.toArray.sortBy(_._1)
        Vectors.sparse(nf, sorted.map(_._1), sorted.map(_._2))
      }
    }
    df.withColumn(getOutputCol, tf(col(getInputCol)))
  }
}
object HashingTF extends StageLoader[HashingTF] {
  def load(spark: SparkSession, path: String): HashingTF =
    ReadWrite.applyParams(new HashingTF, path)
}

/**
 * FeatureHasher: hash numeric + categorical columns into one sparse
 * vector of fixed dimension. Numeric col: index = hash(colName),
 * value += x. Categorical: index = hash(colName + "=" + value), +1.
 * Reference: feature/featurehasher/FeatureHasher.java:79 (updateMap:
 * `Math.abs(hash) floorMod numFeatures`).
 */
class FeatureHasher extends Transformer[FeatureHasher] with OneToOne[FeatureHasher]
    with HasInputCols[FeatureHasher] with HasOutputCol[FeatureHasher]
    with HasNumFeatures[FeatureHasher] {

  final val categoricalCols: Param[Array[String]] =
    param[Array[String]]("categoricalCols", "Columns to force-treat as categorical", Array.empty[String])
  def setCategoricalCols(v: String*): FeatureHasher = set(categoricalCols, v.toArray)
  def getCategoricalCols: Array[String] = get(categoricalCols)

  override protected def transformOne(df: DataFrame): DataFrame = {
    val nf = getNumFeatures
    val inCols = getInputCols
    val schema = df.schema
    val explicitCat = getCategoricalCols
    require(explicitCat.forall(inCols.contains), "CategoricalCols must be included in inputCols!")
    // string/bool columns are implicitly categorical (reference
    // generateCategoricalCols)
    val catSet = inCols.filter { c =>
      explicitCat.contains(c) || (schema(c).dataType match {
        case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.BooleanType => true
        case _ => false
      })
    }.toSet
    val numericCols = inCols.filterNot(catSet.contains)
    val catCols = inCols.filter(catSet.contains)

    val hashNumeric = udf { (name: String, value: java.lang.Double) =>
      if (value == null) null
      else {
        val idx = Math.floorMod(Math.abs(Murmur.hashUnencodedChars(name)), nf)
        Array(idx.toDouble, value.doubleValue())
      }
    }
    val hashCat = udf { (name: String, value: String) =>
      if (value == null) null
      else {
        val idx = Math.floorMod(Math.abs(Murmur.hashUnencodedChars(name + "=" + value)), nf)
        Array(idx.toDouble, 1.0)
      }
    }
    val combine = udf { pairs: Seq[Seq[Double]] =>
      val m = new java.util.TreeMap[Int, Double]()
      pairs.foreach { p =>
        if (p != null) {
          val i = p(0).toInt
          m.merge(i, p(1), (a, b) => a + b)
        }
      }
      val idx = new Array[Int](m.size); val vals = new Array[Double](m.size)
      var k = 0
      m.forEach { (i, v) => idx(k) = i; vals(k) = v; k += 1 }
      Vectors.sparse(nf, idx, vals)
    }

    val parts =
      numericCols.map(c => hashNumeric(lit(c), col(c).cast("double"))) ++
      catCols.map(c => hashCat(lit(c), col(c).cast("string")))
    df.withColumn(getOutputCol, combine(array(parts.toIndexedSeq: _*)))
  }
}
object FeatureHasher extends StageLoader[FeatureHasher] {
  def load(spark: SparkSession, path: String): FeatureHasher =
    ReadWrite.applyParams(new FeatureHasher, path)
}
