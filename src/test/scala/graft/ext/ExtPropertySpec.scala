package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Property-based parity of the distributed corpus operators against
  * straight-line driver-side reference implementations, over seeded
  * random inputs — the net for composition bugs the hand cases can't
  * enumerate (winner ties, cell ties, budget boundaries, shard
  * boundaries of the 256-way prefix sum).
  */
class ExtPropertySpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("dedupSpans equals the naive keep-first reference on random corpora") {
    import spark.implicits._
    val rnd = new Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (round <- 1 to 8) {
      val span = 2 + rnd.nextInt(2) // 2 or 3
      val docs = (0 until (3 + rnd.nextInt(6))).map { id =>
        val len = 1 + rnd.nextInt(10)
        (id.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // reference: chunk, keep first (id, idx) per distinct span text,
      // reassemble in idx order
      case class Sp(id: Long, idx: Long, toks: Long, text: String)
      val spans = docs.flatMap { case (id, t) =>
        val w = t.trim.split("\\s+").toSeq
        (0 to math.max(w.size - 1, 0) by span).zipWithIndex.map { case (s0, i) =>
          Sp(id, i.toLong, math.min(span, w.size - s0).toLong,
            w.slice(s0, s0 + span).mkString(" "))
        }
      }
      val winner = spans.groupBy(_.text).map { case (txt, ss) =>
        txt -> ss.map(s => (s.id, s.idx)).min
      }
      val expected = spans
        .filter(s => winner(s.text) == ((s.id, s.idx)))
        .groupBy(_.id).toSeq.sortBy(_._1)
        .map { case (id, ss) =>
          (id, ss.size.toLong, ss.map(_.toks).sum,
            ss.sortBy(_.idx).map(_.text).mkString(" "))
        }
      val got = Dedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", span)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      withClue(s"round=$round span=$span docs=$docs: ") {
        got shouldBe expected
      }
    }
  }

  test("semanticDedup equals the naive domination reference on random vectors") {
    import spark.implicits._
    val rnd = new Random(11)
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    for (round <- 1 to 8) {
      val dim = 3
      def vec(): Seq[Float] = {
        var v = Seq.fill(dim)((rnd.nextInt(7) - 3).toFloat)
        while (v.forall(_ == 0f)) v = Seq.fill(dim)((rnd.nextInt(7) - 3).toFloat)
        v
      }
      val rows = (1 to 10).map(i => (i.toLong, vec()))
      val cents = Seq.fill(2 + rnd.nextInt(2))(Seq.fill(dim)(rnd.nextInt(5) - 2.0))
      val tau = Seq(0.5, 0.9)(rnd.nextInt(2))
      // reference: argmin L2 cell (ties to lower index), drop any id
      // with a lower-id same-cell neighbor at cosine >= tau
      val assigned = rows.map { case (id, v) =>
        val vd = v.map(_.toDouble)
        val cell = cents.zipWithIndex.map { case (c, i) =>
          (c.zip(vd).map { case (x, y) => (x - y) * (x - y) }.sum, i)
        }.min._2
        (id, vd, cell)
      }
      val expected = assigned.filter { case (id, vd, cell) =>
        !assigned.exists { case (jd, wd, jcell) =>
          jd < id && jcell == cell && cos(vd, wd) >= tau
        }
      }.map { case (id, _, cell) => (id, cell) }
      val got = SimilaritySearch.semanticDedup(
          rows.toDF("vec_id", "embedding"), "vec_id", "embedding", cents, tau)
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      withClue(s"round=$round tau=$tau cents=$cents rows=$rows: ") {
        got shouldBe expected
      }
    }
  }

  test("sharded sampleByTokenBudget equals the naive global running sum") {
    import spark.implicits._
    val rnd = new Random(13)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (round <- 1 to 6) {
      val groups = Seq("g1", "g2", "g3")
      val rows = (1 to 40).map { i =>
        (i.toLong, groups(rnd.nextInt(groups.size)), (1 + rnd.nextInt(20)).toLong)
      }
      val budgets = Map("g1" -> (5L + rnd.nextInt(40)), "g2" -> (5L + rnd.nextInt(40)))
      // reference: per group, md5(doc_id) order, keep while tokens
      // BEFORE the row are under budget; g3 has no budget -> dropped
      val expected = rows
        .filter(r => budgets.contains(r._2))
        .groupBy(_._2).toSeq.flatMap { case (g, rs) =>
          val ordered = rs.sortBy(r => (md5hex(r._1.toString), r._1))
          val befores = ordered.scanLeft(0L)(_ + _._3)
          ordered.zip(befores).filter(_._2 < budgets(g)).map(_._1)
        }.map(_._1).sorted
      val got = Sampling.sampleByTokenBudget(
          rows.toDF("doc_id", "grp", "n_toks").repartition(7),
          "grp", "doc_id", "n_toks", budgets)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      withClue(s"round=$round budgets=$budgets: ") {
        got shouldBe expected
      }
    }
  }

  test("Tar.parseShard never throws and never mis-sizes on arbitrary bytes") {
    val rnd = new Random(42)
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(4096)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      // adversarial flavor: sometimes plant a plausible magic so the
      // walk gets PAST the magic check into size/checksum parsing
      if (n >= 262 && rnd.nextBoolean()) {
        System.arraycopy("ustar".getBytes("US-ASCII"), 0, b, 257, 5)
      }
      val members = Tar.parseShard("fuzz", b) // must not throw
      // any member the walk DOES admit must be internally consistent:
      // body length equals the parsed size and fits inside the payload
      members.foreach { m =>
        m.body.length.toLong shouldBe m.size
        (m.offset + 512 + m.size) should be <= n.toLong
      }
    }
    // and a valid archive with fuzzed TRAILING bytes still parses its
    // members (the zero-block terminator shields the tail)
    import spark.implicits._
    val payload = Tar.shardFixture(
        Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text"),
        "id", "text", numFiles = 1)
      .select("payload").head().getAs[Array[Byte]](0)
    val junk = new Array[Byte](777)
    rnd.nextBytes(junk)
    Tar.parseShard("s", payload ++ junk).map(_.name) shouldBe
      Seq("1.txt", "1.json", "2.txt", "2.json")
  }
}
