package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** ustar shard walk: byte-exact round trip, checksum rejection,
  * truncated-tail semantics, and cross-validation against the JVM's
  * own independent tar via `jar`-style verification is unavailable
  * offline — instead the fixture bytes are validated structurally
  * (header fields re-read by hand) so writer and reader cannot share
  * a bug silently.
  */
class TarSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def fixture(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Tar.shardFixture(rows.toDF("id", "text"), "id", "text", numFiles = 1)
  }

  test("round trip: members come back byte-exact, in id order, typed '0'") {
    val docs = Seq((1L, "hello tar"), (2L, "x" * 600), (3L, ""))
    val members = Tar.parseMembers(fixture(docs), "file_id", "payload")
      .collect().sortBy(m => (m.name))
    members.length shouldBe 6 // .json + .txt per doc
    val byName = members.map(m => m.name -> m).toMap
    byName("1.txt").body shouldBe "hello tar".getBytes("UTF-8")
    byName("2.txt").body shouldBe ("x" * 600).getBytes("UTF-8")
    byName("2.txt").size shouldBe 600L
    byName("3.txt").body shouldBe Array.emptyByteArray
    byName("1.json").body shouldBe """{"doc_id":1}""".getBytes("UTF-8")
    members.foreach(_.typeflag shouldBe "0")
    // offsets advance in whole 512-byte blocks
    members.map(_.offset).foreach(o => o % 512 shouldBe 0)
  }

  test("header fields survive an independent re-read (writer/reader can't share a bug)") {
    val payload = fixture(Seq((7L, "abc"))).select("payload")
      .head().getAs[Array[Byte]](0)
    // hand-read the first header: name at 0, octal size at 124,
    // magic at 257 — the POSIX offsets, not the parser's code paths
    new String(payload.takeWhile(_ != 0), "UTF-8") shouldBe "7.txt"
    new String(payload.slice(257, 262), "US-ASCII") shouldBe "ustar"
    java.lang.Long.parseLong(
      new String(payload.slice(124, 135), "US-ASCII").trim, 8) shouldBe 3L
    // body starts at 512
    new String(payload.slice(512, 515), "UTF-8") shouldBe "abc"
  }

  test("a corrupted checksum truncates the walk at the last good member") {
    val payload = fixture(Seq((1L, "aaaa"), (2L, "bbbb"))).select("payload")
      .head().getAs[Array[Byte]](0)
    // members: 1.json, 1.txt, 2.json, 2.txt (id-ordered); flip one
    // byte inside the THIRD header's checksum field
    val thirdHeader = 2 * 1024 // two members of (512 hdr + 512 body)
    payload(thirdHeader + 148) = 'Z'.toByte
    Tar.parseShard("s", payload).map(_.name) shouldBe Seq("1.txt", "1.json")
  }

  test("a truncated archive keeps every complete member") {
    val payload = fixture(Seq((1L, "aaaa"), (2L, "bbbb"))).select("payload")
      .head().getAs[Array[Byte]](0)
    val cut = java.util.Arrays.copyOfRange(payload, 0, 3 * 1024 + 100)
    Tar.parseShard("s", cut).map(_.name) shouldBe
      Seq("1.txt", "1.json", "2.txt")
  }

  test("zero blocks terminate: trailing garbage after end-of-archive is ignored") {
    val payload = fixture(Seq((1L, "x"))).select("payload")
      .head().getAs[Array[Byte]](0)
    val withJunk = payload ++ Array.fill[Byte](512)('J')
    Tar.parseShard("s", withJunk).map(_.name) shouldBe Seq("1.txt", "1.json")
  }

  test("non-tar and empty payloads parse to no members, never throw") {
    Tar.parseShard("s", "not a tar at all".getBytes) shouldBe Seq.empty
    Tar.parseShard("s", Array.emptyByteArray) shouldBe Seq.empty
    Tar.parseShard("s", new Array[Byte](123)) shouldBe Seq.empty
  }

  test("sampleGroups reassembles webdataset samples by key") {
    import spark.implicits._
    val members = Tar.parseMembers(
      fixture(Seq((1L, "alpha"), (2L, "beta"))), "file_id", "payload")
    val groups = Tar.sampleGroups(members).orderBy("key").collect()
    groups.map(_.getString(0)) shouldBe Array("1", "2")
    val r = groups(0)
    r.getSeq[String](1) shouldBe Seq("json", "txt") // extension order
    new String(r.getSeq[Array[Byte]](2)(1), "UTF-8") shouldBe "alpha"
    new String(r.getSeq[Array[Byte]](2)(0), "UTF-8") shouldBe
      """{"doc_id":1}"""
  }
}
