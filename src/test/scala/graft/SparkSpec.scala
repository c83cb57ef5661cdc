package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, forked by sbt).
  * Self-healing: if a suite (e.g. ExamplesSmokeSpec running example
  * mains that stop their session) stopped the context, the next suite
  * gets a fresh one — suites run sequentially, so nothing is mid-query
  * when that happens. */
object SparkSpec {
  private var current: SparkSession = _
  def spark: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) {
      current = SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      current.sparkContext.setLogLevel("WARN")
    }
    current
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-test").toString
}
