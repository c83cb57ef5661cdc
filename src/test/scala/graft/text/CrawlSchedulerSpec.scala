package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrawlSchedulerSpec extends SparkSpec {

  private def frontier() = {
    import spark.implicits._
    // h1: 4 urls with distinct priorities; h2: a priority tie broken
    // by url; h3: a single url
    Seq(
      ("https://h1/a", "h1", 5.0, "pa"),
      ("https://h1/b", "h1", 9.0, "pb"),
      ("https://h1/c", "h1", 7.0, "pc"),
      ("https://h1/d", "h1", 1.0, "pd"),
      ("https://h2/x", "h2", 3.0, "px"),
      ("https://h2/y", "h2", 3.0, "py"),
      ("https://h3/z", "h3", 8.0, "pz")
    ).toDF("url", "host", "priority", "payload")
  }

  private def got(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
    df.collect().map(r => r.getAs[String]("url") -> r.getAs[Int]("cs_rank")).toMap

  test("per-host top-k: priority desc, url-asc tie-break, deterministic ranks") {
    val out = new CrawlScheduler().setOutputCol("cs").setBudgetPerHost(2)
      .transform(frontier()).head
    assert(got(out) == Map(
      "https://h1/b" -> 1, "https://h1/c" -> 2, // 9.0, 7.0 win; 5.0/1.0 drop
      "https://h2/x" -> 1, "https://h2/y" -> 2, // tie -> /x first
      "https://h3/z" -> 1))
    // payload columns carried through
    assert(out.columns.contains("payload"))
  }

  test("delays tighten budgets: floor(horizon/delay), never below 1, absent hosts flat") {
    import spark.implicits._
    val delays = Seq(
      ("h1", java.lang.Double.valueOf(50.0)),  // floor(90/50)=1
      ("h2", java.lang.Double.valueOf(1000.0)),// floor -> 0 -> clamps to 1
      ("h4", java.lang.Double.valueOf(1.0))    // host absent from frontier
    ).toDF("host", "delay")
    val out = new CrawlScheduler().setOutputCol("cs").setBudgetPerHost(3)
      .setHorizonSec(90.0)
      .transform(frontier(), delays).head
    assert(got(out) == Map(
      "https://h1/b" -> 1,                      // budget 1
      "https://h2/x" -> 1,                      // clamp to 1
      "https://h3/z" -> 1))                     // no delay row -> flat 3, has 1 url
    // horizon 0 ignores the delays table entirely
    val flat = new CrawlScheduler().setOutputCol("cs").setBudgetPerHost(3)
      .transform(frontier(), delays).head
    assert(flat.count() == 6) // h1 keeps 3 of 4, h2 both, h3 one
  }

  test("saltBuckets pre-pass yields the identical schedule") {
    val plain = new CrawlScheduler().setOutputCol("cs").setBudgetPerHost(2)
      .transform(frontier()).head
    val salted = new CrawlScheduler().setOutputCol("cs").setBudgetPerHost(2)
      .setSaltBuckets(4).transform(frontier()).head
    assert(got(plain) == got(salted))
  }

  test("maxUrls caps the round globally by (priority desc, url asc)") {
    val out = new CrawlScheduler().setOutputCol("cs").setBudgetPerHost(2)
      .setMaxUrls(3).transform(frontier()).head
    // selected pool: h1/b(9) h3/z(8) h1/c(7) h2/x(3) h2/y(3) -> top 3
    assert(got(out).keySet == Set("https://h1/b", "https://h1/c", "https://h3/z"))
  }

  test("param save/load round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("crawlsched").toString
    new CrawlScheduler().setUrlCol("u").setHostCol("h").setPriorityCol("p")
      .setBudgetPerHost(7).setHorizonSec(60.0).setDelayCol("d")
      .setMaxUrls(99L).setSaltBuckets(8).setOutputCol("o").save(dir)
    val s = CrawlScheduler.load(spark, dir)
    assert(s.getUrlCol == "u" && s.getHostCol == "h" && s.getPriorityCol == "p" &&
      s.getBudgetPerHost == 7 && s.getHorizonSec == 60.0 && s.getDelayCol == "d" &&
      s.getMaxUrls == 99L && s.getSaltBuckets == 8 && s.getOutputCol == "o")
  }
}
