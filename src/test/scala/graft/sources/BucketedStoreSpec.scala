package graft.sources

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The shuffle-once-at-ingest contract: joins and aggregations on the
  * bucket key never exchange. */
class BucketedStoreSpec extends SparkSpec {

  private def countExchanges(plan: String): Int =
    "(?m)^.*Exchange (hashpartitioning|rangepartitioning)".r.findAllIn(plan).size

  private def withForcedSmj(body: => Unit): Unit = {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("bucketed x bucketed join and groupBy on the bucket key: zero exchanges") {
    import spark.implicits._
    val base = tmpDir()
    val docs = (0L until 5000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val feats = (0L until 5000L).map(i => (i, i * 0.5)).toDF("doc_id", "score")
    BucketedStore.write(docs, "bs_docs", s"$base/docs", 8, Seq("doc_id"), SaveMode.Overwrite)
    BucketedStore.write(feats, "bs_feats", s"$base/feats", 8, Seq("doc_id"), SaveMode.Overwrite)
    try withForcedSmj {
      val joined = BucketedStore.read(spark, "bs_docs")
        .join(BucketedStore.read(spark, "bs_feats"), "doc_id")
      val jplan = joined.queryExecution.executedPlan.toString
      assert(countExchanges(jplan) == 0, jplan) // both sides pre-shuffled at write
      assert(joined.count() == 5000)

      val agg = BucketedStore.read(spark, "bs_docs").groupBy("doc_id").count()
      val aplan = agg.queryExecution.executedPlan.toString
      assert(countExchanges(aplan) == 0, aplan)

      // control: the same join over plain parquet exchanges BOTH sides
      val p1 = tmpDir(); val p2 = tmpDir()
      docs.write.mode("overwrite").parquet(p1)
      feats.write.mode("overwrite").parquet(p2)
      val plain = spark.read.parquet(p1).join(spark.read.parquet(p2), "doc_id")
      assert(countExchanges(plain.queryExecution.executedPlan.toString) == 2)
    } finally {
      BucketedStore.drop(spark, "bs_docs")
      BucketedStore.drop(spark, "bs_feats")
    }
  }

  test("bucketed x unbucketed join: only the unbucketed side shuffles") {
    import spark.implicits._
    val base = tmpDir()
    val docs = (0L until 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    BucketedStore.write(docs, "bs_side", s"$base/docs", 4, Seq("doc_id"), SaveMode.Overwrite)
    try withForcedSmj {
      val other = (0L until 2000L).map(i => (i, i % 7)).toDF("doc_id", "tag")
      val joined = BucketedStore.read(spark, "bs_side").join(other, "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(countExchanges(plan) == 1, plan)
      assert(joined.count() == 2000)
    } finally BucketedStore.drop(spark, "bs_side")
  }

  test("operators compose with the layout: Sessionizer over a user-bucketed event table is exchange-free") {
    import spark.implicits._
    val base = tmpDir()
    val events = (0L until 3000L).map(i => (i % 50, i * 1000L)).toDF("user_id", "ts")
    BucketedStore.write(events, "bs_events", s"$base/ev", 8, Seq("user_id"), SaveMode.Overwrite)
    try {
      val sessions = new graft.streaming.Sessionizer()
        .setKeyCols("user_id").setTimeCol("ts").setGapMs(60000L)
        .transform(BucketedStore.read(spark, "bs_events")).head
      val plan = sessions.queryExecution.executedPlan.toString
      assert(countExchanges(plan) == 0, plan) // the window's distribution comes from the buckets
      assert(sessions.count() == 3000)
    } finally BucketedStore.drop(spark, "bs_events")
  }

  test("drop removes the catalog entry but keeps the files") {
    import spark.implicits._
    val base = tmpDir()
    val df = (0L until 100L).map(i => (i, i)).toDF("doc_id", "v")
    BucketedStore.write(df, "bs_drop", s"$base/t", 2, Seq("doc_id"), SaveMode.Overwrite)
    BucketedStore.drop(spark, "bs_drop")
    assert(!spark.catalog.tableExists("bs_drop"))
    assert(spark.read.parquet(s"$base/t").count() == 100) // files survive
  }
}
