package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.SparkSpec

/** Pinned-schema JSONL ingest with corrupt-line routing. */
class CorpusReaderSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", "long").add("text", "string").add("source", "string")

  private def writeShard(dir: String, name: String, lines: String*): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, name), lines.mkString("", "\n", "\n"))

  test("parses good lines, routes malformed ones to the corrupt side") {
    val dir = tmpDir()
    writeShard(dir, "shard0.jsonl",
      """{"doc_id": 1, "text": "hello world", "source": "web"}""",
      """{not valid json at all""",
      """{"doc_id": 2, "text": "tschüß — ünïcode", "source": "books"}""")
    writeShard(dir, "shard1.jsonl",
      """{"doc_id": 3, "text": "third", "source": "web"}""",
      """also broken""")
    val (records, corrupt) = CorpusReader.jsonl(spark, dir, schema)
    val got = records.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "hello world", "web"),
      (2L, "tschüß — ünïcode", "books"), (3L, "third", "web")))
    assert(records.columns.toSeq === Seq("doc_id", "text", "source"))
    val bad = corrupt.collect().map(r => (r.getString(0), r.getString(1)))
    assert(bad.length == 2)
    assert(bad.map(_._1).toSet === Set("{not valid json at all", "also broken"))
    assert(bad.forall(_._2.contains("shard")))
  }

  test("source_file provenance column when requested") {
    val dir = tmpDir()
    writeShard(dir, "a.jsonl", """{"doc_id": 1, "text": "x", "source": "s"}""")
    writeShard(dir, "b.jsonl", """{"doc_id": 2, "text": "y", "source": "s"}""")
    val (records, _) = CorpusReader.jsonl(spark, dir, schema, addSourceFile = true)
    val byId = records.collect()
      .map(r => r.getLong(0) -> r.getAs[String]("source_file")).toMap
    assert(byId(1L).endsWith("a.jsonl") && byId(2L).endsWith("b.jsonl"))
  }

  test("gzip shards read transparently") {
    val dir = tmpDir()
    val line = """{"doc_id": 7, "text": "compressed", "source": "gz"}""" + "\n"
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/c.jsonl.gz"))
    out.write(line.getBytes("UTF-8")); out.close()
    val (records, corrupt) = CorpusReader.jsonl(spark, dir, schema)
    assert(records.collect().map(_.getLong(0)).toSeq === Seq(7L))
    assert(corrupt.isEmpty)
  }

  test("reserved corrupt column name rejected") {
    val ex = intercept[IllegalArgumentException] {
      CorpusReader.jsonl(spark, "/tmp/nowhere",
        schema.add(CorpusReader.CorruptCol, "string"))
    }
    assert(ex.getMessage.contains(CorpusReader.CorruptCol))
  }
}
