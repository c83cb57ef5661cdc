package graft.param

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Typed parameter with name, description, default and validator.
 *
 * Mirrors the reference's param system (flink-ml-servable-core
 * org/apache/flink/ml/param/Param.java) re-expressed as plain Scala:
 * a `Param[T]` knows how to JSON-encode/decode its value so stage
 * persistence (metadata JSON) is uniform across types.
 */
class Param[T](
    val name: String,
    val description: String,
    val defaultValue: Option[T],
    val validator: T => Boolean)(implicit val codec: ParamCodec[T])
    extends Serializable {

  def jsonEncode(value: T): JValue = codec.encode(value)
  def jsonDecode(json: JValue): T = codec.decode(json)

  override def toString: String = s"Param($name)"
  override def hashCode(): Int = name.hashCode
  override def equals(o: Any): Boolean = o match {
    case p: Param[_] => p.name == name
    case _           => false
  }
}

/** JSON encode/decode for a param value type. */
trait ParamCodec[T] extends Serializable {
  def encode(v: T): JValue
  def decode(j: JValue): T
}

object ParamCodec {
  implicit val boolCodec: ParamCodec[Boolean] = new ParamCodec[Boolean] {
    def encode(v: Boolean): JValue = JBool(v)
    def decode(j: JValue): Boolean = j match { case JBool(b) => b; case x => sys.error(s"bad bool $x") }
  }
  implicit val intCodec: ParamCodec[Int] = new ParamCodec[Int] {
    def encode(v: Int): JValue = JInt(v)
    def decode(j: JValue): Int = j match {
      case JInt(i) => i.toInt; case JLong(l) => l.toInt; case x => sys.error(s"bad int $x")
    }
  }
  implicit val longCodec: ParamCodec[Long] = new ParamCodec[Long] {
    def encode(v: Long): JValue = JLong(v)
    def decode(j: JValue): Long = j match {
      case JInt(i) => i.toLong; case JLong(l) => l; case x => sys.error(s"bad long $x")
    }
  }
  implicit val doubleCodec: ParamCodec[Double] = new ParamCodec[Double] {
    def encode(v: Double): JValue =
      if (v.isNaN) JString("NaN")
      else if (v.isPosInfinity) JString("Infinity")
      else if (v.isNegInfinity) JString("-Infinity")
      else JDouble(v)
    def decode(j: JValue): Double = j match {
      case JDouble(d)          => d
      case JDecimal(d)         => d.toDouble
      case JInt(i)             => i.toDouble
      case JLong(l)            => l.toDouble
      case JString("NaN")      => Double.NaN
      case JString("Infinity") => Double.PositiveInfinity
      case JString("-Infinity") => Double.NegativeInfinity
      case x                   => sys.error(s"bad double $x")
    }
  }
  implicit val floatCodec: ParamCodec[Float] = new ParamCodec[Float] {
    def encode(v: Float): JValue = doubleCodec.encode(v.toDouble)
    def decode(j: JValue): Float = doubleCodec.decode(j).toFloat
  }
  implicit val stringCodec: ParamCodec[String] = new ParamCodec[String] {
    def encode(v: String): JValue = if (v == null) JNull else JString(v)
    def decode(j: JValue): String = j match {
      case JString(s) => s; case JNull => null; case x => sys.error(s"bad string $x")
    }
  }
  implicit def arrayCodec[T: ParamCodec](implicit ct: scala.reflect.ClassTag[T]): ParamCodec[Array[T]] =
    new ParamCodec[Array[T]] {
      private val inner = implicitly[ParamCodec[T]]
      def encode(v: Array[T]): JValue = if (v == null) JNull else JArray(v.toList.map(inner.encode))
      def decode(j: JValue): Array[T] = j match {
        case JArray(xs) => xs.map(inner.decode).toArray
        case JNull      => null
        case x          => sys.error(s"bad array $x")
      }
    }

  def toJsonString(j: JValue): String = JsonMethods.compact(JsonMethods.render(j))
  def parse(s: String): JValue = JsonMethods.parse(s)
}

/** Common validators (reference: org/apache/flink/ml/param/ParamValidators.java). */
object ParamValidators {
  def alwaysTrue[T]: T => Boolean = _ => true
  def gt[T](lower: Double)(implicit n: Numeric[T]): T => Boolean = v => n.toDouble(v) > lower
  def gtEq[T](lower: Double)(implicit n: Numeric[T]): T => Boolean = v => n.toDouble(v) >= lower
  def lt[T](upper: Double)(implicit n: Numeric[T]): T => Boolean = v => n.toDouble(v) < upper
  def ltEq[T](upper: Double)(implicit n: Numeric[T]): T => Boolean = v => n.toDouble(v) <= upper
  def inRange[T](lower: Double, upper: Double)(implicit n: Numeric[T]): T => Boolean =
    v => n.toDouble(v) >= lower && n.toDouble(v) <= upper
  def inArray[T](allowed: T*): T => Boolean = v => allowed.contains(v)
  def notNull[T]: T => Boolean = _ != null
  def nonEmptyArray[T]: Array[T] => Boolean = a => a != null && a.nonEmpty
  def isSubSet[T](allowed: T*): Array[T] => Boolean =
    a => a != null && a.forall(allowed.contains)
}

/**
 * Trait carried by every Stage: a mutable param map with typed get/set,
 * fluent `set` returning the concrete type.
 */
trait WithParams[T] extends Serializable { self =>

  private val paramMap = scala.collection.mutable.LinkedHashMap[Param[_], Any]()
  private val registered = scala.collection.mutable.LinkedHashMap[String, Param[_]]()

  protected def param[V: ParamCodec](
      name: String,
      description: String,
      default: V,
      validator: V => Boolean = ParamValidators.alwaysTrue[V]): Param[V] = {
    val p = new Param[V](name, description, Some(default), validator)
    registered(name) = p
    p
  }

  protected def paramNoDefault[V: ParamCodec](
      name: String,
      description: String,
      validator: V => Boolean = ParamValidators.alwaysTrue[V]): Param[V] = {
    val p = new Param[V](name, description, None, validator)
    registered(name) = p
    p
  }

  def set[V](p: Param[V], value: V): T = {
    require(p.validator(value), s"Parameter ${p.name} is given an invalid value $value")
    paramMap(p) = value
    self.asInstanceOf[T]
  }

  def get[V](p: Param[V]): V =
    paramMap.get(p).orElse(p.defaultValue).getOrElse(
      sys.error(s"Parameter ${p.name} has no value")).asInstanceOf[V]

  def isSet(p: Param[_]): Boolean = paramMap.contains(p)

  def params: Seq[Param[_]] = registered.values.toSeq

  def getParam(name: String): Option[Param[_]] = registered.get(name)

  /** Explicitly-set params as a JSON object (for persistence). */
  def paramMapJson: JObject = JObject(
    paramMap.toList.map { case (p, v) =>
      p.name -> p.asInstanceOf[Param[Any]].jsonEncode(v)
    })

  /** Restore explicitly-set params from persisted JSON. */
  def setParamsFromJson(j: JValue): T = {
    j match {
      case JObject(fields) =>
        fields.foreach { case (name, value) =>
          registered.get(name).foreach { p =>
            paramMap(p) = p.jsonDecode(value)
          }
        }
      case _ =>
    }
    self.asInstanceOf[T]
  }

  /** Copy explicitly-set params onto another WithParams with same param names. */
  def copyParamsTo[U](other: WithParams[U]): Unit =
    other.setParamsFromJson(paramMapJson)
}
