package graft.api

import org.apache.spark.sql.DataFrame

/**
 * DAG composition of stages — the generalization of [[Pipeline]] to
 * non-linear topologies, mirroring the reference builder API
 * (flink-ml-core builder/GraphBuilder.java:73-398, Graph.java,
 * GraphModel.java, TableId.java).
 *
 * Tables are wired by [[TableId]] placeholders: stages declare which
 * ids they consume and produce, and execution resolves ids to
 * DataFrames lazily, so the composed graph is still one Catalyst plan
 * per output — composition adds no materialization barriers.
 */
final case class TableId(id: Int)

private[api] object StageType extends Enumeration {
  val EstimatorStage, AlgoOperatorStage = Value
}

private[api] final case class GraphNode(
    nodeId: Int,
    stage: Stage[_],
    stageType: StageType.Value,
    estimatorInputs: Seq[TableId],
    modelInputs: Seq[TableId],
    outputs: Seq[TableId],
    var inputModelDataIds: Option[Seq[TableId]] = None,
    var outputModelDataIds: Option[Seq[TableId]] = None)

class GraphBuilder {
  private var maxOutputLength = 20
  private var nextTableId = 0
  private val nodes = scala.collection.mutable.ArrayBuffer.empty[GraphNode]
  private val existing = new java.util.IdentityHashMap[Stage[_], GraphNode]()

  /** Loose upper bound on tables returned by transform()/getModelData(). */
  def setMaxOutputTableNum(n: Int): GraphBuilder = { maxOutputLength = n; this }

  def createTableId(): TableId = { val t = TableId(nextTableId); nextTableId += 1; t }

  private def createTableIds(n: Int): Seq[TableId] = Seq.fill(n)(createTableId())

  def addAlgoOperator(algoOp: AlgoOperator[_], inputs: TableId*): Seq[TableId] = {
    val outputs = createTableIds(maxOutputLength)
    val node = GraphNode(nodes.size, algoOp, StageType.AlgoOperatorStage,
      inputs, inputs, outputs)
    nodes += node
    existing.put(algoOp, node)
    outputs
  }

  def addEstimator(estimator: Estimator[_, _], inputs: TableId*): Seq[TableId] =
    addEstimator(estimator, inputs, inputs)

  /** Estimator with distinct fit-time and transform-time inputs. */
  def addEstimator(estimator: Estimator[_, _], estimatorInputs: Seq[TableId],
      modelInputs: Seq[TableId]): Seq[TableId] = {
    val outputs = createTableIds(maxOutputLength)
    val node = GraphNode(nodes.size, estimator, StageType.EstimatorStage,
      estimatorInputs, modelInputs, outputs)
    nodes += node
    existing.put(estimator, node)
    outputs
  }

  private def nodeOf(stage: Stage[_], expected: StageType.Value, what: String): GraphNode = {
    val node = existing.get(stage)
    require(node != null, s"the $what has not been added to the graph")
    require(node.stageType == expected, s"the $what was added with a different stage type")
    node
  }

  /** Feed the fitted Model's setModelData() from graph tables. */
  def setModelDataOnEstimator(estimator: Estimator[_, _], inputs: TableId*): Unit = {
    val node = nodeOf(estimator, StageType.EstimatorStage, "Estimator")
    require(node.inputModelDataIds.isEmpty, "the model data of this Estimator has already been set")
    node.inputModelDataIds = Some(inputs)
  }

  def setModelDataOnModel(model: Model[_], inputs: TableId*): Unit = {
    val node = nodeOf(model, StageType.AlgoOperatorStage, "Model")
    require(node.inputModelDataIds.isEmpty, "the model data of this Model has already been set")
    node.inputModelDataIds = Some(inputs)
  }

  /** Expose the fitted Model's getModelData() as graph tables. */
  def getModelDataFromEstimator(estimator: Estimator[_, _]): Seq[TableId] = {
    val node = nodeOf(estimator, StageType.EstimatorStage, "Estimator")
    require(node.outputModelDataIds.isEmpty, "the model data of this Estimator has already been fetched")
    val ids = createTableIds(maxOutputLength)
    node.outputModelDataIds = Some(ids)
    ids
  }

  def getModelDataFromModel(model: Model[_]): Seq[TableId] = {
    val node = nodeOf(model, StageType.AlgoOperatorStage, "Model")
    require(node.outputModelDataIds.isEmpty, "the model data of this Model has already been fetched")
    val ids = createTableIds(maxOutputLength)
    node.outputModelDataIds = Some(ids)
    ids
  }

  def buildEstimator(inputs: Seq[TableId], outputs: Seq[TableId]): Graph =
    new Graph(nodes.toSeq, inputs, outputs)

  /** The graph as a transform-only operator: estimators are fit and
    * immediately applied during transform (reference buildAlgoOperator). */
  def buildAlgoOperator(inputs: Seq[TableId], outputs: Seq[TableId]): GraphModel =
    new GraphModel(nodes.toSeq.map(n => (n, n.stage)), inputs, outputs)
}

/**
 * Executable DAG acting as one Estimator: fit() runs every node in
 * dependency order (estimators fit then their models transform; algo
 * operators transform) and returns a [[GraphModel]] wired with the
 * fitted stages.
 */
class Graph(
    private[api] val nodes: Seq[GraphNode],
    private[api] val inputIds: Seq[TableId],
    private[api] val outputIds: Seq[TableId]) extends Estimator[Graph, GraphModel] {

  override def fit(inputs: DataFrame*): GraphModel = {
    require(inputs.size == inputIds.size,
      s"Graph.fit expects ${inputIds.size} input tables, got ${inputs.size}")
    val env = scala.collection.mutable.Map[TableId, DataFrame](inputIds.zip(inputs): _*)
    val fitted = GraphExecution.run(nodes, env, fitEstimators = true)
    new GraphModel(nodes.zip(fitted), inputIds, outputIds)
  }

  override def save(path: String): Unit =
    GraphPersist.save(this, nodes, nodes.map(_.stage), inputIds, outputIds, path)
}

/**
 * Fitted/transform-only DAG: transform() resolves the same wiring with
 * each node's runtime stage (the fitted Model for estimator nodes).
 */
class GraphModel(
    private[api] val nodeStages: Seq[(GraphNode, Stage[_])],
    private[api] val inputIds: Seq[TableId],
    private[api] val outputIds: Seq[TableId]) extends Model[GraphModel] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == inputIds.size,
      s"GraphModel.transform expects ${inputIds.size} input tables, got ${inputs.size}")
    val env = scala.collection.mutable.Map[TableId, DataFrame](inputIds.zip(inputs): _*)
    GraphExecution.runModel(nodeStages, env)
    outputIds.map(id => env.getOrElse(id,
      sys.error(s"graph output $id was never produced"))).toArray
  }

  override def setModelData(data: DataFrame*): GraphModel =
    sys.error("GraphModel does not accept direct model data; wire it with GraphBuilder.setModelDataOnModel")

  override def getModelData: Array[DataFrame] =
    nodeStages.collect { case (_, m: Model[_]) => m.getModelData }.flatten.toArray

  override def save(path: String): Unit =
    GraphPersist.save(this, nodeStages.map(_._1), nodeStages.map(_._2), inputIds, outputIds, path)
}

object GraphModel extends StageLoader[GraphModel] {
  def load(spark: org.apache.spark.sql.SparkSession, path: String): GraphModel = {
    val (nodes, stages, in, out) = GraphPersist.load(spark, path)
    new GraphModel(nodes.zip(stages), in, out)
  }
}

object Graph extends StageLoader[Graph] {
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Graph = {
    val (nodes, stages, in, out) = GraphPersist.load(spark, path)
    new Graph(nodes.zip(stages).map { case (n, s) => n.copy(stage = s) }, in, out)
  }
}

/**
 * DAG persistence: the wiring (node ids, table ids, model-data ids)
 * goes into the graph metadata JSON; each stage saves itself under
 * stages/NNN like Pipeline (reference Graph.java/GraphModel.java
 * save/load via GraphData).
 */
private[api] object GraphPersist {
  import org.json4s._
  import graft.util.ReadWrite

  private def ids(v: Seq[TableId]): JValue = JArray(v.map(t => JInt(t.id)).toList)
  private def idsOpt(v: Option[Seq[TableId]]): JValue = v.map(ids).getOrElse(JNull)
  private def readIds(j: JValue): Seq[TableId] = j match {
    case JArray(xs) => xs.map { case JInt(i) => TableId(i.toInt); case x => sys.error(s"bad id $x") }
    case x => sys.error(s"bad id list $x")
  }
  private def readIdsOpt(j: JValue): Option[Seq[TableId]] = j match {
    case JNull | JNothing => None
    case x => Some(readIds(x))
  }

  def save(self: Stage[_], nodes: Seq[GraphNode], stages: Seq[Stage[_]],
      inputIds: Seq[TableId], outputIds: Seq[TableId], path: String): Unit = {
    val graphJson = JObject(
      "nodes" -> JArray(nodes.map { n =>
        JObject(
          "nodeId" -> JInt(n.nodeId),
          "stageType" -> JString(n.stageType.toString),
          "estimatorInputs" -> ids(n.estimatorInputs),
          "modelInputs" -> ids(n.modelInputs),
          "outputs" -> ids(n.outputs),
          "inputModelDataIds" -> idsOpt(n.inputModelDataIds),
          "outputModelDataIds" -> idsOpt(n.outputModelDataIds))
      }.toList),
      "inputIds" -> ids(inputIds),
      "outputIds" -> ids(outputIds))
    ReadWrite.saveMetadata(self, path, Map("graph" -> graphJson))
    stages.zipWithIndex.foreach { case (s, i) => s.save(ReadWrite.stagePath(path, i)) }
  }

  /** Returns (nodes with placeholder stages, loaded stages, inputIds, outputIds). */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[GraphNode], Seq[Stage[_]], Seq[TableId], Seq[TableId]) = {
    val meta = ReadWrite.loadMetadata(path)
    val g = meta \ "graph"
    val nodeJsons = (g \ "nodes") match {
      case JArray(xs) => xs
      case x => sys.error(s"bad graph nodes $x")
    }
    val stages = nodeJsons.indices.map(i => ReadWrite.loadStage(spark, ReadWrite.stagePath(path, i)))
    val nodes = nodeJsons.zip(stages).map { case (j, s) =>
      val JInt(nodeId) = (j \ "nodeId"): @unchecked
      val JString(st) = (j \ "stageType"): @unchecked
      GraphNode(
        nodeId.toInt, s, StageType.withName(st),
        readIds(j \ "estimatorInputs"),
        readIds(j \ "modelInputs"),
        readIds(j \ "outputs"),
        readIdsOpt(j \ "inputModelDataIds"),
        readIdsOpt(j \ "outputModelDataIds"))
    }
    (nodes, stages, readIds(g \ "inputIds"), readIds(g \ "outputIds"))
  }
}

private[api] object GraphExecution {

  /** Runs nodes as soon as their inputs are available; returns the
    * runtime stage per node (fitted Model for estimator nodes). */
  def run(nodes: Seq[GraphNode], env: scala.collection.mutable.Map[TableId, DataFrame],
      fitEstimators: Boolean): Seq[Stage[_]] = {
    val runtimeStages = new Array[Stage[_]](nodes.size)
    val pending = scala.collection.mutable.Queue(nodes: _*)
    var progressed = true
    while (pending.nonEmpty && progressed) {
      progressed = false
      val stillPending = scala.collection.mutable.Queue.empty[GraphNode]
      while (pending.nonEmpty) {
        val node = pending.dequeue()
        val needed = node.estimatorInputs ++ node.modelInputs ++
          node.inputModelDataIds.getOrElse(Nil)
        if (needed.forall(env.contains)) {
          runtimeStages(node.nodeId) = execute(node, node.stage, env)
          progressed = true
        } else stillPending += node
      }
      pending ++= stillPending
    }
    require(pending.isEmpty,
      s"graph has unresolvable inputs for nodes ${pending.map(_.nodeId).mkString(", ")}")
    runtimeStages.toSeq
  }

  def runModel(nodeStages: Seq[(GraphNode, Stage[_])],
      env: scala.collection.mutable.Map[TableId, DataFrame]): Unit = {
    val pending = scala.collection.mutable.Queue(nodeStages: _*)
    var progressed = true
    while (pending.nonEmpty && progressed) {
      progressed = false
      val stillPending = scala.collection.mutable.Queue.empty[(GraphNode, Stage[_])]
      while (pending.nonEmpty) {
        val (node, stage) = pending.dequeue()
        val needed = node.modelInputs ++ node.inputModelDataIds.getOrElse(Nil)
        if (needed.forall(env.contains)) {
          execute(node, stage, env)
          progressed = true
        } else stillPending += ((node, stage))
      }
      pending ++= stillPending
    }
    require(pending.isEmpty,
      s"graph has unresolvable inputs for nodes ${pending.map(_._1.nodeId).mkString(", ")}")
  }

  /** Fit/transform one node, binding its outputs (and model data
    * tables) into the environment; returns the runtime stage. */
  private def execute(node: GraphNode, stage: Stage[_],
      env: scala.collection.mutable.Map[TableId, DataFrame]): Stage[_] = {
    val runtime: AlgoOperator[_] = stage match {
      case e: Estimator[_, _] =>
        val model = e.fit(node.estimatorInputs.map(env): _*)
        node.inputModelDataIds.foreach(ids => model.setModelData(ids.map(env): _*))
        model
      case m: Model[_] =>
        node.inputModelDataIds.foreach(ids => m.setModelData(ids.map(env): _*))
        m
      case a: AlgoOperator[_] => a
      case other => sys.error(s"unsupported stage $other")
    }
    val produced = runtime.transform(node.modelInputs.map(env): _*)
    node.outputs.zip(produced.toIndexedSeq).foreach { case (id, df) => env(id) = df }
    node.outputModelDataIds.foreach { ids =>
      runtime match {
        case m: Model[_] => ids.zip(m.getModelData.toIndexedSeq)
          .foreach { case (id, df) => env(id) = df }
        case _ => sys.error("getModelData is only available on Model stages")
      }
    }
    runtime
  }
}
