package graft.ext

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class CdcSpec extends AnyFunSuite with Matchers with SparkTestBase {

  // deterministic pseudo-random printable bytes (no java.util.Random
  // seeding ambiguity; SplitMix-style like the gear table itself)
  private def bytes(n: Int, seed: Long): Array[Byte] = {
    var x = seed
    Array.fill(n) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      (32 + (((z >>> 33) % 95) + 95) % 95).toByte // printable ASCII
    }
  }

  private val Min = 64
  private val Bits = 6
  private val Max = 1024

  test("chunkBytes: full coverage, contiguous offsets, size bounds") {
    val b = bytes(20000, seed = 1)
    val ch = Cdc.chunkBytes(7L, b, Min, Bits, Max)
    ch.map(_.len).sum shouldBe b.length
    ch.head.offset shouldBe 0
    ch.sliding(2).foreach { case Seq(a, c) =>
      c.offset shouldBe a.offset + a.len
      c.chunk_idx shouldBe a.chunk_idx + 1
    }
    // every chunk except possibly the last respects [min, max]
    ch.init.foreach { c =>
      c.len should be >= Min
      c.len should be <= Max
    }
    ch.last.len should be <= Max
    // with 6 mask bits the expected length is min + 2^6; the stream is
    // random, so the observed mean must land in the right regime (not
    // degenerate to all-min or all-max)
    val mean = b.length.toDouble / ch.length
    mean should be > 80.0
    mean should be < 400.0
    // md5 is over the exact chunk bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(b, ch.head.offset, ch.head.len)
    ch.head.chunk_md5 shouldBe md.digest().map("%02x".format(_)).mkString
  }

  test("boundaries re-synchronize after an insertion (the CDC contract)") {
    val base = bytes(20000, seed = 2)
    val shifted = bytes(37, seed = 99) ++ base
    val a = Cdc.chunkBytes(1L, base, Min, Bits, Max).map(c => (c.len, c.chunk_md5))
    val b = Cdc.chunkBytes(1L, shifted, Min, Bits, Max).map(c => (c.len, c.chunk_md5))
    // the tails must agree: all but the first few chunks of each stream
    // are identical (the gear window is 64 bytes, so boundaries past
    // the first post-edit boundary are content-determined)
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    common should be >= a.length - 3
    common should be >= 1
  }

  test("fixed-width windows do NOT survive the same insertion (the contrast)") {
    val base = bytes(20000, seed = 2)
    val shifted = bytes(37, seed = 99) ++ base
    def fixed(bs: Array[Byte]) = bs.grouped(128).map { g =>
      java.security.MessageDigest.getInstance("MD5").digest(g)
        .map("%02x".format(_)).mkString
    }.toSeq
    val shared = fixed(base).toSet.intersect(fixed(shifted).toSet)
    // 37 is not a multiple of 128: every window shifts, nothing matches
    shared shouldBe empty
  }

  test("maxSize forces a boundary on boundary-free content") {
    // constant bytes: the gear hash locks to a fixed pattern that may
    // never hit the mask; max must cap every chunk
    val b = Array.fill(5000)('x'.toByte)
    val ch = Cdc.chunkBytes(1L, b, Min, Bits, maxSize = 256)
    ch.init.foreach(_.len shouldBe 256)
    ch.map(_.len).sum shouldBe 5000
  }

  test("chunks dataset matches the driver-side reference; empty text emits nothing") {
    import spark.implicits._
    val texts = Seq(
      (1L, new String(bytes(3000, 5), java.nio.charset.StandardCharsets.UTF_8)),
      (2L, ""),
      (3L, new String(bytes(500, 6), java.nio.charset.StandardCharsets.UTF_8)))
    val df = texts.toDF("doc_id", "text")
    val out = Cdc.chunks(df, "doc_id", "text", Min, Bits, Max)
      .collect().sortBy(c => (c.id, c.chunk_idx))
    val expected = texts.filter(_._2.nonEmpty).flatMap { case (id, t) =>
      Cdc.chunkBytes(id, t.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        Min, Bits, Max)
    }
    out.toSeq shouldBe expected
    out.count(_.id == 2L) shouldBe 0
  }

  test("chunks drops null and non-numeric ids instead of NPEing") {
    import spark.implicits._
    val df = Seq(
      (null.asInstanceOf[String], "some text body for chunking"),
      ("not-a-number", "another text body"),
      ("7", "kept row text")).toDF("doc_id", "text")
    val out = Cdc.chunks(df, "doc_id", "text", Min, Bits, Max).collect()
    out.map(_.id).distinct.toSeq shouldBe Seq(7L)
  }

  test("deltaStats: CDC survives a prefix edit, fixed windows do not; identity is 1.0") {
    import spark.implicits._
    val body = new String(bytes(8000, 44), java.nio.charset.StandardCharsets.UTF_8)
    val df = Seq(
      (1L, body, "BANNER-" + body),                // shifted edit
      (2L, body, body),                            // unchanged re-crawl
      (3L, body, new String(bytes(8000, 55),
        java.nio.charset.StandardCharsets.UTF_8))  // full rewrite
    ).toDF("id", "old", "new")
    val out = Cdc.deltaStats(df, "id", "old", "new")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    out(0)._2 should be > 0.9   // CDC re-syncs past the banner
    out(0)._3 should be < 0.05  // every fixed window shifted
    out(1)._2 shouldBe 1.0      // identical text: full reuse either way
    out(1)._3 shouldBe 1.0
    out(2)._2 should be < 0.05  // a rewrite shares nothing under either
    out(2)._3 should be < 0.05
  }

  test("crossDocChunkStats: planted shared block detected, unique doc at zero") {
    import spark.implicits._
    val shared = new String(bytes(4000, 11), java.nio.charset.StandardCharsets.UTF_8)
    val df = Seq(
      (1L, shared + new String(bytes(300, 21), java.nio.charset.StandardCharsets.UTF_8)),
      (2L, shared + new String(bytes(300, 22), java.nio.charset.StandardCharsets.UTF_8)),
      (3L, new String(bytes(4000, 33), java.nio.charset.StandardCharsets.UTF_8))
    ).toDF("doc_id", "text")
    val out = Cdc.crossDocChunkStats(df, "doc_id", "text", Min, Bits, Max)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.length shouldBe 3
    // docs 1/2 share the 4000-byte prefix: most of their bytes sit in
    // chunks present in the other doc (the divergent tail costs a bit)
    out(0)._4 should be > 0.7
    out(1)._4 should be > 0.7
    out(2)._4 shouldBe 0.0
    out(2)._3 shouldBe 4000L
  }
}
