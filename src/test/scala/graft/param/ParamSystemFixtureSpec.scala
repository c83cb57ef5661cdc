package graft.param

import org.scalatest.funsuite.AnyFunSuite

/**
 * Param-system semantics ported from api/StageTest.java:260-475 —
 * set-by-name, invalid-value rejection, undefined-param behavior,
 * special float/double values (NaN, ±Infinity) surviving the JSON
 * round trip, long values past Int.MaxValue, and nested array params.
 */
class ParamSystemFixtureSpec extends AnyFunSuite {

  private class MyStage extends WithParams[MyStage] {
    val intP: Param[Int] = param[Int]("intP", "int", 1, ParamValidators.gt(0))
    val longP: Param[Long] = param[Long]("longP", "long", 1L)
    val doubleP: Param[Double] = param[Double]("doubleP", "double", 0.5)
    val floatP: Param[Float] = param[Float]("floatP", "float", 0.5f)
    val stringP: Param[String] = param[String]("stringP", "string", "s")
    val arrP: Param[Array[Int]] = param[Array[Int]]("arrP", "arr", Array(1, 2))
    val arrArrP: Param[Array[Array[String]]] =
      param[Array[Array[String]]]("arrArrP", "arrArr", Array(Array("a"), Array("b", "c")))
    val noDefaultP: Param[Int] = paramNoDefault[Int]("noDefaultP", "no default")
  }

  private def roundTrip(s: MyStage): MyStage = {
    val json = ParamCodec.parse(ParamCodec.toJsonString(s.paramMapJson))
    (new MyStage).setParamsFromJson(json)
  }

  test("set by name via getParam (StageTest testParamSetValueWithName)") {
    val s = new MyStage
    val p = s.getParam("intP").get.asInstanceOf[Param[Int]]
    s.set(p, 50)
    assert(s.get(s.intP) == 50)
  }

  test("invalid value is rejected with the param name in the message") {
    val s = new MyStage
    val e = intercept[IllegalArgumentException] { s.set(s.intP, -1) }
    assert(e.getMessage.contains("intP"))
  }

  test("unset no-default param fails on get, succeeds after set") {
    val s = new MyStage
    intercept[RuntimeException] { s.get(s.noDefaultP) }
    s.set(s.noDefaultP, 3)
    assert(s.get(s.noDefaultP) == 3)
  }

  test("NaN and infinities survive the JSON round trip (testSaveLoadWithSpecialParams)") {
    val s = new MyStage
    s.set(s.doubleP, Double.NaN)
    s.set(s.floatP, Float.NegativeInfinity)
    val loaded = roundTrip(s)
    assert(loaded.get(loaded.doubleP).isNaN)
    assert(loaded.get(loaded.floatP).isNegInfinity)

    val s2 = new MyStage
    s2.set(s2.doubleP, Double.PositiveInfinity)
    val loaded2 = roundTrip(s2)
    assert(loaded2.get(loaded2.doubleP).isPosInfinity)
  }

  test("long past Int.MaxValue survives the round trip (LONG_PARAM2)") {
    val s = new MyStage
    s.set(s.longP, Int.MaxValue + 50L)
    assert(roundTrip(s).get(s.longP) == Int.MaxValue + 50L)
  }

  test("array and array-of-array params survive the round trip") {
    val s = new MyStage
    s.set(s.arrP, Array(30, 50))
    s.set(s.arrArrP, Array(Array("50", "51"), Array("52")))
    val loaded = roundTrip(s)
    assert(loaded.get(loaded.arrP).toSeq == Seq(30, 50))
    assert(loaded.get(loaded.arrArrP).map(_.toSeq).toSeq == Seq(Seq("50", "51"), Seq("52")))
  }

  test("unknown names in persisted JSON are ignored (forward compatibility)") {
    val s = new MyStage
    s.set(s.intP, 7)
    val json = ParamCodec.parse(
      """{"intP": 7, "ghostParam": "whatever"}""")
    val loaded = (new MyStage).setParamsFromJson(json)
    assert(loaded.get(loaded.intP) == 7)
  }
}
