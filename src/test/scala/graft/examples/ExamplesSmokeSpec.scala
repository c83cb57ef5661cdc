package graft.examples

import org.scalatest.funsuite.AnyFunSuite

/**
 * Runs every example main (the analog of the reference's ExamplesTest,
 * which executes each flink-ml-examples program). Examples are
 * discovered from the compiled classes directory so a new example is
 * covered automatically; each builds its session via getOrCreate and
 * stops it, so they run sequentially in one JVM.
 */
class ExamplesSmokeSpec extends AnyFunSuite {

  private def exampleObjects: Seq[String] = {
    import scala.jdk.CollectionConverters._
    // the package exists under both main classes and test-classes;
    // merge every classpath entry that carries it
    val urls = getClass.getClassLoader.getResources("graft/examples").asScala.toSeq
    assert(urls.nonEmpty, "examples package not on classpath")
    urls.flatMap { url =>
      val dir = new java.io.File(url.toURI)
      Option(dir.listFiles()).toSeq.flatten.map(_.getName)
    }
      .filter(n => n.endsWith("$.class") && !n.contains("$$"))
      .map(n => n.stripSuffix("$.class"))
      .filter(n => n != "ExampleSession" && !n.contains("Spec"))
      .distinct.sorted
  }

  private def hasMain(objName: String): Boolean = {
    val clazz = Class.forName(s"graft.examples.$objName")
    clazz.getMethods.exists(m =>
      m.getName == "main" &&
        m.getParameterTypes.toSeq == Seq(classOf[Array[String]]))
  }

  test("every example main runs to completion") {
    val names = exampleObjects.filter(hasMain)
    assert(names.size >= 50, s"expected >=50 examples, found ${names.size}")
    // capture the examples' show() output; print only on failure
    val sink = new java.io.ByteArrayOutputStream()
    names.foreach { name =>
      sink.reset()
      val clazz = Class.forName(s"graft.examples.$name")
      val main = clazz.getMethod("main", classOf[Array[String]])
      try Console.withOut(new java.io.PrintStream(sink)) {
        main.invoke(null, Array.empty[String])
      } catch {
        case e: java.lang.reflect.InvocationTargetException =>
          info(sink.toString)
          fail(s"example $name failed: ${e.getCause}", e.getCause)
      }
    }
  }
}
