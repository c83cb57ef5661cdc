package graft.param

/**
 * Shared param mixins, mirroring the reference's Has* interfaces
 * (flink-ml-servable-lib org/apache/flink/ml/common/param/Has*.java).
 * Default column names match the reference's conventions
 * (features/prediction/rawPrediction/label/input/output).
 */
trait HasInputCol[T] extends WithParams[T] {
  final val inputCol: Param[String] =
    param[String]("inputCol", "Input column name", "input", ParamValidators.notNull)
  def getInputCol: String = get(inputCol)
  def setInputCol(v: String): T = set(inputCol, v)
}

trait HasOutputCol[T] extends WithParams[T] {
  final val outputCol: Param[String] =
    param[String]("outputCol", "Output column name", "output", ParamValidators.notNull)
  def getOutputCol: String = get(outputCol)
  def setOutputCol(v: String): T = set(outputCol, v)
}

trait HasInputCols[T] extends WithParams[T] {
  final val inputCols: Param[Array[String]] =
    paramNoDefault[Array[String]]("inputCols", "Input column names", ParamValidators.nonEmptyArray)
  def getInputCols: Array[String] = get(inputCols)
  def setInputCols(v: String*): T = set(inputCols, v.toArray)
}

trait HasOutputCols[T] extends WithParams[T] {
  final val outputCols: Param[Array[String]] =
    paramNoDefault[Array[String]]("outputCols", "Output column names", ParamValidators.nonEmptyArray)
  def getOutputCols: Array[String] = get(outputCols)
  def setOutputCols(v: String*): T = set(outputCols, v.toArray)
}

trait HasFeaturesCol[T] extends WithParams[T] {
  final val featuresCol: Param[String] =
    param[String]("featuresCol", "Features column name", "features", ParamValidators.notNull)
  def getFeaturesCol: String = get(featuresCol)
  def setFeaturesCol(v: String): T = set(featuresCol, v)
}

trait HasLabelCol[T] extends WithParams[T] {
  final val labelCol: Param[String] =
    param[String]("labelCol", "Label column name", "label", ParamValidators.notNull)
  def getLabelCol: String = get(labelCol)
  def setLabelCol(v: String): T = set(labelCol, v)
}

trait HasPredictionCol[T] extends WithParams[T] {
  final val predictionCol: Param[String] =
    param[String]("predictionCol", "Prediction column name", "prediction", ParamValidators.notNull)
  def getPredictionCol: String = get(predictionCol)
  def setPredictionCol(v: String): T = set(predictionCol, v)
}

trait HasRawPredictionCol[T] extends WithParams[T] {
  final val rawPredictionCol: Param[String] =
    param[String]("rawPredictionCol", "Raw prediction column name", "rawPrediction", ParamValidators.notNull)
  def getRawPredictionCol: String = get(rawPredictionCol)
  def setRawPredictionCol(v: String): T = set(rawPredictionCol, v)
}

trait HasWeightCol[T] extends WithParams[T] {
  final val weightCol: Param[String] =
    param[String]("weightCol", "Weight column name (null = unweighted)", null.asInstanceOf[String])
  def getWeightCol: String = get(weightCol)
  def setWeightCol(v: String): T = set(weightCol, v)
}

trait HasSeed[T] extends WithParams[T] {
  /** Reference convention: default seed = class name hashCode (HasSeed.java). */
  final val seed: Param[Long] =
    param[Long]("seed", "The random seed", this.getClass.getName.hashCode.toLong)
  def getSeed: Long = get(seed)
  def setSeed(v: Long): T = set(seed, v)
}

trait HasMaxIter[T] extends WithParams[T] {
  final val maxIter: Param[Int] =
    param[Int]("maxIter", "Maximum number of iterations", 20, ParamValidators.gt(0))
  def getMaxIter: Int = get(maxIter)
  def setMaxIter(v: Int): T = set(maxIter, v)
}

trait HasTol[T] extends WithParams[T] {
  final val tol: Param[Double] =
    param[Double]("tol", "Convergence tolerance", 1e-6, ParamValidators.gtEq(0))
  def getTol: Double = get(tol)
  def setTol(v: Double): T = set(tol, v)
}

trait HasLearningRate[T] extends WithParams[T] {
  final val learningRate: Param[Double] =
    param[Double]("learningRate", "Learning rate of optimization", 0.1, ParamValidators.gt(0))
  def getLearningRate: Double = get(learningRate)
  def setLearningRate(v: Double): T = set(learningRate, v)
}

trait HasGlobalBatchSize[T] extends WithParams[T] {
  final val globalBatchSize: Param[Int] =
    param[Int]("globalBatchSize", "Global batch size of training algorithms", 32, ParamValidators.gt(0))
  def getGlobalBatchSize: Int = get(globalBatchSize)
  def setGlobalBatchSize(v: Int): T = set(globalBatchSize, v)
}

/** Classification type selector (reference common/param/HasMultiClass.java:39-42). */
trait HasMultiClass[T] extends WithParams[T] {
  final val multiClass: Param[String] =
    param[String]("multiClass", "Classification type.", "auto",
      ParamValidators.inArray("auto", "binomial", "multinomial"))
  def getMultiClass: String = get(multiClass)
  def setMultiClass(v: String): T = set(multiClass, v)
}

trait HasReg[T] extends WithParams[T] {
  final val reg: Param[Double] =
    param[Double]("reg", "Regularization parameter", 0.0, ParamValidators.gtEq(0))
  def getReg: Double = get(reg)
  def setReg(v: Double): T = set(reg, v)
}

trait HasElasticNet[T] extends WithParams[T] {
  final val elasticNet: Param[Double] =
    param[Double]("elasticNet", "ElasticNet parameter (0=L2, 1=L1)", 0.0, ParamValidators.inRange(0, 1))
  def getElasticNet: Double = get(elasticNet)
  def setElasticNet(v: Double): T = set(elasticNet, v)
}

object HandleInvalid {
  val ERROR = "error"
  val SKIP = "skip"
  val KEEP = "keep"
}

trait HasHandleInvalid[T] extends WithParams[T] {
  final val handleInvalid: Param[String] =
    param[String]("handleInvalid", "Strategy to handle invalid entries: error|skip|keep",
      HandleInvalid.ERROR,
      ParamValidators.inArray(HandleInvalid.ERROR, HandleInvalid.SKIP, HandleInvalid.KEEP))
  def getHandleInvalid: String = get(handleInvalid)
  def setHandleInvalid(v: String): T = set(handleInvalid, v)
}

trait HasRelativeError[T] extends WithParams[T] {
  final val relativeError: Param[Double] =
    param[Double]("relativeError", "Relative target precision for approximate quantiles",
      0.001, ParamValidators.inRange(0, 1))
  def getRelativeError: Double = get(relativeError)
  def setRelativeError(v: Double): T = set(relativeError, v)
}

object DistanceMeasureNames {
  val EUCLIDEAN = "euclidean"
  val MANHATTAN = "manhattan"
  val COSINE = "cosine"
}

trait HasDistanceMeasure[T] extends WithParams[T] {
  final val distanceMeasure: Param[String] =
    param[String]("distanceMeasure", "Distance measure: euclidean|manhattan|cosine",
      DistanceMeasureNames.EUCLIDEAN,
      ParamValidators.inArray(DistanceMeasureNames.EUCLIDEAN,
        DistanceMeasureNames.MANHATTAN, DistanceMeasureNames.COSINE))
  def getDistanceMeasure: String = get(distanceMeasure)
  def setDistanceMeasure(v: String): T = set(distanceMeasure, v)
}

trait HasNumFeatures[T] extends WithParams[T] {
  final val numFeatures: Param[Int] =
    param[Int]("numFeatures", "Number of features", 1 << 18, ParamValidators.gt(0))
  def getNumFeatures: Int = get(numFeatures)
  def setNumFeatures(v: Int): T = set(numFeatures, v)
}

trait HasFlatten[T] extends WithParams[T] {
  final val flatten: Param[Boolean] =
    param[Boolean]("flatten", "If output is flattened (one row per feature)", false)
  def getFlatten: Boolean = get(flatten)
  def setFlatten(v: Boolean): T = set(flatten, v)
}
