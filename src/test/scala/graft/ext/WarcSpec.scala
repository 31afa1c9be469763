package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WarcSpec extends AnyFunSuite with SparkTestBase {

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Hand-build one record so the spec's bytes are independent of the
    * fixture builder under test.
    */
  private def record(
      warcType: String,
      uri: Option[String],
      content: Array[Byte],
      warcContentType: String = "application/http;msgtype=response",
      declaredLength: Option[Long] = None): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "WARC/1.1\r\n"
    sb ++= s"WARC-Type: $warcType\r\n"
    sb ++= "WARC-Date: 2026-01-01T00:00:00Z\r\n"
    sb ++= s"WARC-Record-ID: <urn:uuid:$warcType-1>\r\n"
    uri.foreach(u => sb ++= s"WARC-Target-URI: $u\r\n")
    sb ++= s"Content-Type: $warcContentType\r\n"
    sb ++= s"Content-Length: ${declaredLength.getOrElse(content.length.toLong)}\r\n"
    sb ++= "\r\n"
    val head = sb.toString.getBytes(Iso)
    head ++ content ++ "\r\n\r\n".getBytes(Iso)
  }

  private def http(body: Array[Byte], headers: String = "Content-Type: text/html\r\nX-A: 1\r\n"): Array[Byte] =
    s"HTTP/1.1 200 OK\r\n$headers\r\n".getBytes(Iso) ++ body

  test("parseFile: response record fields, HTTP split, byte-exact body") {
    val body = "hello <b>warc</b> world".getBytes(Iso)
    val recs = Warc.parseFile("f", record("response", Some("https://x.example/a"), http(body)))
    assert(recs.size == 1)
    val r = recs.head
    assert(r.warc_type == "response")
    assert(r.target_uri == "https://x.example/a")
    assert(r.http_status == 200)
    assert(r.http_content_type.contains("text/html"))
    assert(r.n_http_headers == 2)
    assert(r.body.sameElements(body))
    assert(r.rec_offset == 0L)
  }

  test("a literal WARC/1.1 header block inside a body cannot split the record") {
    // the decoy is a COMPLETE well-formed record embedded in the body:
    // any magic-scanning splitter would emit it as a second record
    val decoy = record("response", Some("https://evil.example/"), http("evil".getBytes(Iso)))
    val body = "prefix\r\n".getBytes(Iso) ++ decoy ++ "suffix".getBytes(Iso)
    val outer = record("response", Some("https://x.example/b"), http(body))
    val after = record("response", Some("https://x.example/c"), http("tail".getBytes(Iso)))
    val recs = Warc.parseFile("f", outer ++ after)
    assert(recs.map(_.target_uri) == Seq("https://x.example/b", "https://x.example/c"))
    assert(recs.head.body.sameElements(body))
  }

  test("truncated record drops the tail but keeps earlier records") {
    val good = record("response", Some("https://x.example/ok"), http("fine".getBytes(Iso)))
    val truncated = record("response", Some("https://x.example/bad"),
      http("short".getBytes(Iso)), declaredLength = Some(100000L))
    val recs = Warc.parseFile("f", good ++ truncated)
    assert(recs.map(_.target_uri) == Seq("https://x.example/ok"))
  }

  test("missing Content-Length stops the walk at the last good record") {
    val good = record("response", Some("https://x.example/ok"), http("fine".getBytes(Iso)))
    val noLen = ("WARC/1.1\r\nWARC-Type: response\r\n\r\n" + "junk").getBytes(Iso)
    assert(Warc.parseFile("f", good ++ noLen).size == 1)
  }

  test("warcinfo content passes through whole with status -1") {
    val info = "software: test\r\n".getBytes(Iso)
    val recs = Warc.parseFile("f",
      record("warcinfo", None, info, warcContentType = "application/warc-fields"))
    assert(recs.size == 1)
    assert(recs.head.warc_type == "warcinfo")
    assert(recs.head.http_status == -1)
    assert(recs.head.target_uri == null)
    assert(recs.head.body.sameElements(info))
  }

  test("non-UTF8 body bytes survive the walk byte-exact") {
    val body = Array.tabulate[Byte](256)(i => i.toByte) // all byte values incl. 0xFF, 0x00
    val recs = Warc.parseFile("f", record("response", Some("https://x.example/bin"), http(body)))
    assert(recs.head.body.sameElements(body))
  }

  test("malformed HTTP head passes content through with status -1") {
    val content = "NOT-HTTP at all\r\n\r\nrest".getBytes(Iso)
    val recs = Warc.parseFile("f", record("response", Some("https://x.example/m"), content))
    assert(recs.head.http_status == -1)
    assert(recs.head.body.sameElements(content))
  }

  test("responseFixture round-trips through parseRecords distributedly") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "alpha body"), (1L, "beta body with\nnewline"), (2L, "gamma"),
      (3L, "delta WARC/1.1 decoy text"), (7L, "eta")).toDF("doc_id", "text")
      .select(col("doc_id"),
        concat(lit("https://t.example/d/"), col("doc_id")).as("uri"),
        col("text").as("body"))
    val files = Warc.responseFixture(docs, "doc_id", "uri", "body", numFiles = 3)
    assert(files.count() == 3) // ids 0..3,7 mod 3 → files 0,1,2
    val recs = Warc.parseRecords(files, "file_id", "payload").toDF()
    assert(recs.where(col("warc_type") === "warcinfo").count() == 3)
    val resp = recs.where(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/d/([0-9]+)$", 1).cast("long").as("doc_id"),
        decode(col("body"), "UTF-8").as("got"), col("http_status"))
      .orderBy("doc_id").collect()
    assert(resp.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 7L))
    assert(resp.map(_.getString(1)).toSeq ==
      Seq("alpha body", "beta body with\nnewline", "gamma", "delta WARC/1.1 decoy text", "eta"))
    assert(resp.forall(_.getInt(2) == 200))
  }

  test("fixture records within a file are ordered by id and offsets increase") {
    val s = spark
    import s.implicits._
    val docs = Seq((9L, "a"), (3L, "b"), (6L, "c")).toDF("doc_id", "text")
      .select(col("doc_id"), lit("https://t.example/x").as("uri"), col("text").as("body"))
    val files = Warc.responseFixture(docs, "doc_id", "uri", "body", numFiles = 1)
    val recs = Warc.parseRecords(files, "file_id", "payload")
      .collect().sortBy(_.rec_offset)
    assert(recs.map(_.warc_type).toSeq == Seq("warcinfo", "response", "response", "response"))
    assert(recs.map(_.record_id).drop(1).toSeq ==
      Seq("<urn:uuid:doc-3>", "<urn:uuid:doc-6>", "<urn:uuid:doc-9>"))
  }

  test("gzip container: member-per-record bytes decompress to the plain payload") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta\nbody"), (5L, "gamma WARC/1.1 decoy"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), concat(lit("https://t.example/d/"),
        col("doc_id").cast("string")).as("uri"), col("text").as("body"))
    val plain = Warc.responseFixture(docs, "doc_id", "uri", "body", numFiles = 1)
      .select(col("payload")).head().getAs[Array[Byte]](0)
    val gz = Warc.responseFixtureGzip(docs, "doc_id", "uri", "body", numFiles = 1)
      .select(col("payload")).head().getAs[Array[Byte]](0)
    // the member stream really is compressed, and really is multi-member
    assert(gz.length < plain.length)
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    val magics = gz.sliding(2).count(p => (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b)
    assert(magics >= 4, s"expected one member per record, saw $magics magic pairs")
    // byte-identical plain stream → identical records
    assert(Warc.gunzipMembers(gz).sameElements(plain))
    val viaGz = Warc.parseGzipRecords(
      Warc.responseFixtureGzip(docs, "doc_id", "uri", "body", numFiles = 1),
      "file_id", "payload").collect().sortBy(_.rec_offset)
    assert(viaGz.map(_.warc_type).toSeq == Seq("warcinfo", "response", "response", "response"))
    assert(viaGz.filter(_.warc_type == "response")
      .map(r => new String(r.body, java.nio.charset.StandardCharsets.UTF_8)).toSeq ==
      Seq("alpha", "beta\nbody", "gamma WARC/1.1 decoy"))
  }

  test("gzip container: truncated tail keeps fully-decompressed records") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "first"), (2L, "second"), (3L, "third"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), lit("https://t.example/x").as("uri"), col("text").as("body"))
    val gz = Warc.responseFixtureGzip(docs, "doc_id", "uri", "body", numFiles = 1)
      .select(col("payload")).head().getAs[Array[Byte]](0)
    // cut into the LAST member: earlier members must survive
    val cut = java.util.Arrays.copyOfRange(gz, 0, gz.length - 12)
    val recs = Warc.parseFile("f", Warc.gunzipMembers(cut))
    assert(recs.nonEmpty && recs.size < 4)
    assert(recs.head.warc_type == "warcinfo")
  }
}
