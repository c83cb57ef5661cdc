package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * WARC record extraction — the INGEST format of the crawl tier: web
 * archives (Common Crawl's WARC/1.x files) arrive as one string
 * column of concatenated records, and everything downstream
 * ([[HtmlExtractor]], [[LinkGraphExtractor]], [[UrlParser]],
 * [[UrlCanonicalizer]], the dedup tier) consumes per-record rows.
 * One output row per WARC record, in file order:
 *
 *  - `<o>_type`: the WARC-Type header (warcinfo / request / response /
 *    resource / metadata / ...), lowercased; null when absent;
 *  - `<o>_uri`: WARC-Target-URI as written (angle-bracket wrapping
 *    `<...>`, produced by some writers, is stripped); null when absent;
 *  - `<o>_date`: WARC-Date as written (W3C datetime string);
 *  - `<o>_payload`: everything after the WARC header block up to the
 *    next record marker, record-separator CRLFs trimmed;
 *  - `<o>_body`: for HTTP response/request payloads (an HTTP status
 *    or request line followed by HTTP headers), the entity body after
 *    the first blank line — i.e. the HTML a response carried; equal to
 *    the payload when no HTTP header block is present;
 *  - `<o>_status`: the HTTP status code off a response payload's
 *    status line (200, 301, 404, ...); null for non-HTTP payloads —
 *    with `<o>_mime` this is the keep-200s/keep-text-html gate a
 *    crawl pipeline applies before anything downstream decodes;
 *  - `<o>_mime`: the Content-Type header's media type, lowercased,
 *    parameters after ';' dropped (`text/html; charset=utf-8` →
 *    `text/html`), scoped to the payload's HTTP header block so a
 *    body mentioning "Content-Type:" cannot shadow it; null when
 *    absent.
 *
 * Scope (documented trades, same stance as the other regex
 * extractors): a REGEX record walk, not a spec-complete WARC reader —
 * records are delimited by `WARC/1.x` marker lines rather than
 * measured by Content-Length (a payload containing a literal line
 * starting `WARC/1.` would split early; Common Crawl response bodies
 * are HTML, where that sequence at line start is vanishingly rare —
 * at 100 TB this is the trade between a scan-shaped zero-UDF column
 * walk and a stateful byte parser), gzip member boundaries are the
 * reader's job (payloads here are already-decompressed text), and
 * binary payloads belong in the multimodal binary tier, not a string
 * column. All patterns RE2-compatible ((?s)/(?m) flags, non-greedy
 * capture, no backreferences) so the DuckDB oracle replays planted
 * constructions exactly. Scan-shaped: split + posexplode + in-row
 * regexp math, zero shuffle, zero UDF.
 */
class WarcParser extends Transformer[WarcParser]
    with HasInputCol[WarcParser] with HasOutputCol[WarcParser] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val o = getOutputCol
    val x = coalesce(col(getInputCol), lit(""))

    // records: split on WARC version marker lines; element 0 (text
    // before the first marker — empty for a well-formed file) drops,
    // and the position index numbers records in file order from 1
    val recs = split(x, "(?m)^WARC/1\\.[0-9]+\\r?\\n")
    // a truncated archive ending on a bare marker line leaves a
    // trailing EMPTY element (split keeps it) — drop it alongside
    // the pre-marker preamble so no phantom record row is emitted
    val out = inputs.head
      .select(col("*"), posexplode(recs).as(Seq(s"${o}_pos", "__rec")))
      .where(col(s"${o}_pos") > 0 && col("__rec") =!= "")

    // WARC headers live strictly before the record's first blank line
    // — extraction scopes there so a payload embedding "WARC-Type:"
    // text (an archive of an archive) cannot shadow the real headers
    val hb = regexp_extract(col("__rec"), "(?s)^(.*?)\\r?\\n\\r?\\n", 1)
    val headerBlock = when(hb === "", col("__rec")).otherwise(hb)
    def header(name: String) = {
      val v = trim(regexp_extract(col("__hdr"), s"(?mi)^$name:[ \\t]*(.*?)\\r?$$", 1))
      when(v === "", lit(null).cast("string")).otherwise(v)
    }
    val payloadRaw = regexp_extract(col("__rec"), "(?s)\\r?\\n\\r?\\n(.*)$", 1)
    val payload = regexp_replace(payloadRaw, "(\\r?\\n)+$", "")
    val headered = out
      .withColumn("__hdr", headerBlock)
      .withColumn(s"${o}_type", lower(header("WARC-Type")))
      .withColumn(s"${o}_uri",
        regexp_replace(header("WARC-Target-URI"), "^<|>$", ""))
      .withColumn(s"${o}_date", header("WARC-Date"))
      .withColumn(s"${o}_payload", payload)
      .drop("__hdr")
    // HTTP payloads open with a status/request line; the entity body
    // follows the first blank line of the HTTP header block
    val p = col(s"${o}_payload")
    // status/request line, ZERO or more header lines, blank line, body
    // — "(?:[^\r\n]+\r?\n)*" rather than a lazy ".*?" so a headerless
    // "HTTP/1.1 200 OK\r\n\r\n<body>" still yields its body
    val httpBody = regexp_extract(p,
      "(?s)^HTTP/[^\\r\\n]*\\r?\\n(?:[^\\r\\n]+\\r?\\n)*\\r?\\n(.*)$", 1)
    val reqBody = regexp_extract(p,
      "(?s)^[A-Z]+ \\S+ HTTP/[^\\r\\n]*\\r?\\n(?:[^\\r\\n]+\\r?\\n)*\\r?\\n(.*)$", 1)
    val body = when(p.rlike("^HTTP/"), httpBody)
      .when(p.rlike("^[A-Z]+ \\S+ HTTP/"), reqBody)
      .otherwise(p)
    // HTTP status + media type — the gate a crawl pipeline applies
    // before anything decodes (keep 200s, keep text/html; Common
    // Crawl's own index carries exactly these two fields). The status
    // code comes off a response payload's status line; the media type
    // off the Content-Type header, scoped to the payload's HTTP
    // header block (the contiguous non-blank lines opening the
    // payload) so an HTML body that MENTIONS "Content-Type:" cannot
    // shadow it; parameters after ';' (charset=...) drop and the type
    // lowercases per RFC 9110 §8.3's case-insensitive media types.
    // Null for non-HTTP payloads and when the header is absent.
    val statusStr = regexp_extract(p, "^HTTP/[0-9.]+[ \\t]+([0-9]{3})", 1)
    val status = when(statusStr === "", lit(null).cast("int"))
      .otherwise(statusStr.cast("int"))
    val httpHdr = when(
      p.rlike("^HTTP/") || p.rlike("^[A-Z]+ \\S+ HTTP/"),
      regexp_extract(p, "(?s)^([^\\r\\n]*(?:\\r?\\n[^\\r\\n]+)*)", 1))
    val ctValue = trim(regexp_extract(httpHdr,
      "(?mi)^content-type[ \\t]*:[ \\t]*([^\\r\\n]*)", 1))
    val mime = lower(trim(regexp_extract(ctValue, "^([^;]*)", 1)))
    Array(headered
      .withColumn(s"${o}_body", body)
      .withColumn(s"${o}_status", status)
      .withColumn(s"${o}_mime", when(mime === "", lit(null).cast("string")).otherwise(mime))
      .drop("__rec"))
  }
}

object WarcParser extends StageLoader[WarcParser] {
  def load(spark: SparkSession, path: String): WarcParser =
    ReadWrite.applyParams(new WarcParser, path)
}
