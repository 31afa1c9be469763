package graft.ext

import org.apache.spark.sql.functions.{abs, col, max, min}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def docs = {
    import spark.implicits._
    (1 to 2000).map(i => (i.toLong, s"document number $i content")).toDF("id", "text")
  }

  test("contentSample is stable under repartitioning and ~rate-sized") {
    val a = Sampling.contentSample(docs, "text", "20")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.contentSample(docs.repartition(13), "text", "20")
      .select("id").collect().map(_.getLong(0)).toSet
    a shouldBe b
    // "20" hex ≈ 32/256 = 12.5%; allow generous tolerance at n=2000
    a.size.toDouble should be(250.0 +- 100.0)
  }

  test("contentSplit partitions every row exactly once, deterministically") {
    import org.apache.spark.sql.functions._
    val split = Sampling.contentSplit(docs, "text")
    split.count() shouldBe 2000
    val counts = split.groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.keySet shouldBe Set("train", "val", "test")
    counts.values.sum shouldBe 2000L
    counts("train").toDouble should be > counts("val").toDouble
    // same doc always lands in the same split
    val again = Sampling.contentSplit(docs.repartition(7), "text")
      .groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    again shouldBe counts
  }

  test("sampleByGroup keeps exactly k per group, deterministically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 100L).map(i => (s"g${i % 4}", i)).toDF("grp", "id")
    val out = Sampling.sampleByGroup(df, "grp", "id", 5)
    out.groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1)) shouldBe Array.fill(4)(5L)
    // stable under repartitioning — the md5 coordinate, not layout,
    // picks the rows
    val a = out.select("id").as[Long].collect().sorted
    val b = Sampling.sampleByGroup(df.repartition(13), "grp", "id", 5)
      .select("id").as[Long].collect().sorted
    a shouldBe b
    // a group smaller than k keeps all its rows
    val tiny = Seq(("g", 1L), ("g", 2L)).toDF("grp", "id")
    Sampling.sampleByGroup(tiny, "grp", "id", 5).count() shouldBe 2
  }

  test("sampleByTokenBudget draws each group up to its token budget, deterministically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10 docs of 10 tokens per group
    val df = (1L to 30L).map(i => (s"g${i % 3}", i, 10L)).toDF("grp", "id", "toks")
    val out = Sampling.sampleByTokenBudget(df, "grp", "id", "toks",
      Map("g0" -> 35L, "g1" -> 1L, "g2" -> 1000L))
    val perGroup = out.groupBy("grp").agg(count(lit(1)).as("n"), sum("toks").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // g0: rows kept while tokens-before < 35 -> 4 docs (40 tokens: the
    // budget-crossing doc is kept, the next is not)
    perGroup("g0") shouldBe ((4L, 40L))
    // g1: budget smaller than any doc still keeps the first doc
    perGroup("g1") shouldBe ((1L, 10L))
    // g2: budget never bites -> whole group
    perGroup("g2") shouldBe ((10L, 100L))
    // unlisted groups drop: the mixture is a whitelist
    Sampling.sampleByTokenBudget(df, "grp", "id", "toks", Map("g0" -> 35L))
      .select("grp").distinct().collect().map(_.getString(0)) shouldBe Array("g0")
    // layout-independent: same ids chosen on any partitioning
    val a = out.select("id").as[Long].collect().sorted
    val b = Sampling.sampleByTokenBudget(df.repartition(11), "grp", "id", "toks",
        Map("g0" -> 35L, "g1" -> 1L, "g2" -> 1000L))
      .select("id").as[Long].collect().sorted
    a shouldBe b
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("packSequences matches a driver-side global concat-and-chunk") {
    import spark.implicits._
    // token counts include zeros (a zero-token doc still occupies its
    // start point and spans exactly one pack)
    val rows = (1L to 50L).map(i => (i, i % 7))
    val df = rows.toDF("id", "toks")
    val seqLen = 10L
    // driver-side truth: global md5 order, running sum
    var acc = 0L
    val expected = rows.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .map { case (id, tok) =>
        val start = acc; acc += tok
        val last = start + math.max(tok, 1L) - 1L
        id -> ((start / seqLen, start % seqLen, last / seqLen - start / seqLen + 1L))
      }.toMap
    val out = Sampling.packSequences(df, "id", "toks", seqLen)
      .select("id", "pack_id", "pack_offset", "n_packs")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out shouldBe expected
    // at least one doc must straddle a pack boundary in this fixture
    out.values.map(_._3).max should be >= 2L
    // layout-independent: identical on any input partitioning
    val rep = Sampling.packSequences(df.repartition(13), "id", "toks", seqLen)
      .select("id", "pack_id", "pack_offset", "n_packs")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rep shouldBe expected
  }

  /** Driver-side reference FFD: naive O(d·bins) first-fit over docs
    * sorted (tokens desc, md5 asc) per md5-prefix shard — the same
    * semantics as [[Sampling.packBinsFFD]] with NONE of its machinery
    * (no segment tree, no distributed prefix sum), so it catches bugs
    * in either.
    */
  private def referenceFFD(
      rows: Seq[(Long, Long)], seqLen: Long,
      shards: Int = 256): Map[Long, (Long, Long)] = {
    val byShard = rows
      .map { case (id, n) => (md5hex(id.toString), id, n) }
      .groupBy(t => Integer.parseInt(t._1.take(4), 16) % shards)
      .toSeq.sortBy(_._1)
    var base = 0L
    val out = Map.newBuilder[Long, (Long, Long)]
    for ((_, docs) <- byShard) {
      val sorted = docs.sortBy { case (k, _, n) => (-math.max(n, 1L), k) }
      val fill = scala.collection.mutable.ArrayBuffer.empty[Long]
      for ((_, id, n) <- sorted) {
        val eff = math.max(n, 1L)
        val i = if (eff > seqLen) -1
          else fill.indexWhere(f => seqLen - f >= eff)
        if (i >= 0) {
          out += id -> ((base + i, fill(i)))
          fill(i) += eff
        } else {
          out += id -> ((base + fill.length, 0L))
          // an oversize bin's fill (eff > seqLen) blocks all joiners
          fill += eff
        }
      }
      base += fill.length
    }
    out.result()
  }

  test("packBinsFFD matches the naive first-fit reference exactly") {
    import spark.implicits._
    // sizes from tiny to oversize (> seqLen), with zero-token docs
    val rows = (1L to 80L).map(i => (i, (i * 37) % 13 * 2))
    val seqLen = 10L
    val expected = referenceFFD(rows, seqLen)
    val out = Sampling.packBinsFFD(rows.toDF("id", "toks"), "id", "toks", seqLen)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    out shouldBe expected
    // layout-independent
    val rep = Sampling.packBinsFFD(
        rows.toDF("id", "toks").repartition(7), "id", "toks", seqLen)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    rep shouldBe expected
    // sized-down sharding (the scaling contract) and the single-shard
    // case (= global FFD) agree with the reference too
    for (sh <- Seq(1, 4)) {
      val e = referenceFFD(rows, seqLen, shards = sh)
      val o = Sampling.packBinsFFD(rows.toDF("id", "toks"), "id", "toks", seqLen, sh)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      o shouldBe e
    }
    // fewer shards can only tighten the packing on this fixture: global
    // FFD uses no more bins than the 256-shard run
    val binsGlobal = referenceFFD(rows, seqLen, shards = 1).values.map(_._1).toSet.size
    val bins256 = expected.values.map(_._1).toSet.size
    binsGlobal should be <= bins256
  }

  test("clusterSplit keeps every dup cluster whole; unlabeled docs split by id") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // three clusters + unlabeled tail: {1,2,3} -> 1, {4,5} -> 4
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "component")
    val out = Sampling.clusterSplit(docs, "doc_id", comps)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    out.size shouldBe 60 // the left join drops nobody
    // cluster members share their split
    Set(out(1L), out(2L), out(3L)).size shouldBe 1
    Set(out(4L), out(5L)).size shouldBe 1
    // cluster split = the split of the label key (md5 of component id)
    out(1L) shouldBe splitOf(1L)
    out(4L) shouldBe splitOf(4L)
    // unlabeled docs fall back to their own id key = contentSplit on id
    (6L to 60L).foreach(i => out(i) shouldBe splitOf(i))
    // determinism under repartitioning
    val rep = Sampling.clusterSplit(docs.repartition(7), "doc_id", comps)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    rep shouldBe out
  }

  private def splitOf(key: Long): String = {
    val h = md5hex(key.toString)
    if (h < "0d") "test" else if (h < "1a") "val" else "train"
  }

  test("packBinsFFD invariants: whole docs, capacity, contiguous ids, policy order") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, (i * 13) % 700))
    val seqLen = 512L
    val out = Sampling.packBinsFFD(rows.toDF("id", "toks"), "id", "toks", seqLen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc placed exactly once
    out.map(_._1).toSet shouldBe rows.map(_._1).toSet
    // bins respect capacity (an oversize doc sits ALONE in its bin)
    val byBin = out.groupBy(_._3)
    byBin.values.foreach { docs =>
      val fill = docs.map(d => math.max(d._2, 1L)).sum
      if (fill > seqLen) docs.length shouldBe 1
    }
    // bin ids are contiguous from 0
    val ids = byBin.keySet
    ids shouldBe (0L until ids.size.toLong).toSet
    // offsets within a bin are the running fill (no overlap, no gap)
    byBin.values.foreach { docs =>
      val sorted = docs.sortBy(_._4)
      var at = 0L
      sorted.foreach { d =>
        d._4 shouldBe at
        at += math.max(d._2, 1L)
      }
    }
    // policy quality: concat <= ffd <= isolated pack counts
    val nTok = rows.map(_._2).sum
    val concatPacks = (nTok + seqLen - 1) / seqLen
    val isolatedPacks = rows.map { case (_, n) =>
      (math.max(n, 1L) + seqLen - 1) / seqLen }.sum
    ids.size.toLong should be >= concatPacks
    ids.size.toLong should be <= isolatedPacks
  }

  test("weightedSample matches an independent driver-side reference at any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (0L until 400L).map(i => (i, s"content number $i", 1L + i % 37))
    // independent reference: same formula, plain Scala
    val expected = rows.map { case (id, text, w) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((text + "ws").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 12)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / math.pow(16.0, 12.0)
      (id, -math.log(u) / w)
    }.sortBy(_._2).take(25).map(_._1).toSet
    for (parts <- Seq(1, 8)) {
      val df = rows.toDF("id", "text", "w").repartition(parts)
      val got = Sampling.weightedSample(df, "text", col("w"), k = 25)
        .select("id").collect().map(_.getLong(0)).toSet
      withClue(s"parts=$parts: ") { got shouldBe expected }
    }
  }

  test("weightedSample: heavier rows dominate the sample (inclusion law)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 500 light (w=1) + 500 heavy (w=20); k=100 -> heavy share should
    // sit near 20/21, far above the unweighted 1/2 (deterministic
    // fixture, pinned band rather than a flaky statistical test)
    val df = (0L until 1000L).map(i =>
      (i, s"doc body $i", if (i < 500) 1L else 20L)).toDF("id", "text", "w")
    val heavy = Sampling.weightedSample(df, "text", col("w"), k = 100)
      .where(col("id") >= 500).count()
    heavy.toDouble should be > 75.0
  }

  test("weightedSample plans TakeOrderedAndProject, not a global sort") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).select(col("id"),
      concat(lit("t"), col("id")).as("text"), lit(1L).as("w"))
    val plan = Sampling.weightedSample(df, "text", col("w"), k = 10)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }

  test("epochShuffle: a permutation, stable per epoch, different across epochs") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    def order(epoch: String) = Sampling.epochShuffle(df, "id", epoch)
      .select("id").as[Long].collect().toSeq
    val e1 = order("e1")
    e1.sorted shouldBe (0L until 500L) // permutation: nothing lost
    order("e1") shouldBe e1 // reproducible
    val e2 = order("e2")
    e2 should not be e1 // epochs decorrelate
    e2.sorted shouldBe (0L until 500L)
    // partition-invariant: the order is data-derived, not planner-derived
    Sampling.epochShuffle(df.repartition(7), "id", "e1")
      .select("id").as[Long].collect().toSeq shouldBe e1
  }

  test("neymanSample: allocation follows n_h*s_h; admission is content-keyed and nested") {
    import spark.implicits._
    // stratum a: high variance (values 0/1000 alternating), stratum b:
    // constant, stratum c: singleton -> s=0. Neyman should pour the
    // budget into a and starve b/c.
    val rows =
      (1 to 1000).map(i => (i.toLong, "a", if (i % 2 == 0) 1000.0 else 0.0)) ++
      (1001 to 2000).map(i => (i.toLong, "b", 500.0)) ++
      Seq((9999L, "c", 123.0))
    val df = rows.toDF("id", "g", "v")
    val out = Sampling.neymanSample(df, "g", "id", col("v"), budgetFrac = 0.3)
      .select("id", "g", "__rate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byG = out.groupBy(_._2).view.mapValues(_.length).toMap
    // all mass to a: rate_a = min(1, .3 * 2001 * s_a / (1000 s_a)) = .6003
    byG.getOrElse("b", 0) shouldBe 0
    byG.getOrElse("c", 0) shouldBe 0
    val rateA = out.find(_._2 == "a").get._3
    rateA shouldBe BigDecimal(0.3 * 2001 / 1000)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    // admission matches the driver-side md5 reference exactly
    def admitted(id: Long, rate: Double): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      rate >= 1.0 || h < f"${math.floor(rate * 281474976710656L.toDouble).toLong}%012x"
    }
    val expectA = (1 to 1000).map(_.toLong).filter(admitted(_, rateA))
    out.filter(_._2 == "a").map(_._1).sorted shouldBe expectA
    // sample size tracks the budgeted count for the one funded stratum
    math.abs(byG("a") - rateA * 1000).toDouble should be < 60.0
    // nested: a SMALLER budget admits a subset of the larger one
    val small = Sampling.neymanSample(df, "g", "id", col("v"), budgetFrac = 0.1)
      .select("id").as[Long].collect().toSet
    small.subsetOf(out.map(_._1).toSet) shouldBe true
    // all-constant strata degenerate to proportional sampling
    val const = (1 to 500).map(i => (i.toLong, if (i % 2 == 0) "x" else "y", 7.0))
      .toDF("id", "g", "v")
    val rates = Sampling.neymanSample(const, "g", "id", col("v"), 0.25)
      .select("__rate").distinct().as[Double].collect()
    rates shouldBe Array(0.25)
  }

  test("rendezvousShard matches a driver-side HRW reference; minimal churn on growth") {
    import spark.implicits._
    val n = 2000
    val df = spark.range(n).toDF("id")
    def ref(key: Long, shards: Int): Int =
      (0 until shards).maxBy { s =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$key:$s".getBytes("UTF-8"))
        (d.map("%02x".format(_)).mkString, s)
      }
    val out = df.select(col("id"),
        Sampling.rendezvousShard(col("id"), 8).as("s8"),
        Sampling.rendezvousShard(col("id"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    out.foreach { case (id, s8, s9) =>
      s8 shouldBe ref(id, 8)
      s9 shouldBe ref(id, 9)
    }
    // every shard populated, roughly balanced (uniform expectation 250)
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    sizes.keySet shouldBe (0 until 8).toSet
    sizes.values.min should be > 150
    // growth churn: only keys won by the NEW shard move — exactly the
    // keys whose 9-shard argmax is shard 8
    val moved = out.count { case (_, s8, s9) => s8 != s9 }
    moved shouldBe out.count(_._3 == 8)
    moved.toDouble / n should be < 0.25 // ~1/9 expected, modulo noise
    // shards == 1 degenerates to constant 0
    df.select(Sampling.rendezvousShard(col("id"), 1).as("s"))
      .agg(max("s"), min("s")).head.toSeq shouldBe Seq(0, 0)
  }

  test("stratifiedSplit: exact per-stratum counts, disjoint+complete, layout-stable") {
    import spark.implicits._
    // strata of deliberately awkward sizes: 7, 50, 1
    val df = ((1 to 7).map(i => (i.toLong, "a")) ++
      (100 to 149).map(i => (i.toLong, "b")) :+ ((999L, "c"))).toDF("id", "g")
    val out = Sampling.stratifiedSplit(df, "g", "id", testFrac = 0.1, valFrac = 0.1)
    val counts = out.groupBy("g", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // ceil(0.1*7)=1, ceil(0.1*50)=5, ceil(0.1*1)=1 (test swallows the
    // singleton; val is empty there, train empty too)
    counts(("a", "test")) shouldBe 1
    counts(("a", "val")) shouldBe 1
    counts(("a", "train")) shouldBe 5
    counts(("b", "test")) shouldBe 5
    counts(("b", "val")) shouldBe 5
    counts(("b", "train")) shouldBe 40
    counts(("c", "test")) shouldBe 1
    counts.keys.count(_._1 == "c") shouldBe 1
    // complete + disjoint: one split per row, all rows present
    out.count() shouldBe 58
    out.select("id").distinct().count() shouldBe 58
    // layout-stable: the assignment is a pure function of content
    val shuffled = Sampling.stratifiedSplit(df.repartition(13), "g", "id",
      testFrac = 0.1, valFrac = 0.1)
    shuffled.select("id", "split").except(out.select("id", "split"))
      .count() shouldBe 0
  }

  test("autoSplit: regime switch pins exact-below / hex-bulk-above") {
    import spark.implicits._
    // one dominant stratum (60 rows) + one small (7) around threshold 20
    val df = ((1 to 60).map(i => (i.toLong, "big")) ++
      (200 to 206).map(i => (i.toLong, "small"))).toDF("id", "g")
    val out = Sampling.autoSplit(df, "g", "id",
        testFrac = 0.1, valFrac = 0.1, exactThreshold = 20L)
      .select("id", "g", "split", "regime")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3)))
    // complete + disjoint across both regimes
    out.length shouldBe 67
    out.map(_._1).distinct.length shouldBe 67
    out.filter(_._2 == "big").map(_._4).toSet shouldBe Set("bulk")
    out.filter(_._2 == "small").map(_._4).toSet shouldBe Set("exact")
    // the small stratum carries stratifiedSplit's EXACT counts
    val small = out.filter(_._2 == "small")
    small.count(_._3 == "test") shouldBe 1 // ceil(0.1*7)
    small.count(_._3 == "val") shouldBe 1
    small.count(_._3 == "train") shouldBe 5
    // the big stratum matches the 12-hex bound law row by row
    val tB = f"${math.floor(0.1 * 281474976710656L.toDouble).toLong}%012x"
    val vB = f"${math.floor(0.2 * 281474976710656L.toDouble).toLong}%012x"
    out.filter(_._2 == "big").foreach { case (id, _, split, _) =>
      val k = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val expect = if (k < tB) "test" else if (k < vB) "val" else "train"
      split shouldBe expect
    }
    // the exact form on the SAME small stratum agrees with autoSplit
    val exact = Sampling.stratifiedSplit(
        df.where(col("g") === "small"), "g", "id", 0.1, 0.1)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    out.filter(_._2 == "small").map(t => (t._1, t._3)).toSet shouldBe exact
  }

  test("uniMaxAllocation: water-filling with epoch caps") {
    import spark.implicits._
    // token masses 100 / 200 / 700; budget 40% of 1000 = 400; cap 0.6
    // epochs -> capacities 60 / 120 / 420. Greedy: 60 <= 400/3 caps;
    // 120 <= (400-60)/2 = 170 caps; theta = 400 - 180 = 220 < 420.
    val df = (Seq.fill(1)(("a", 100L)) ++ Seq.fill(2)(("b", 100L)) ++
      Seq.fill(7)(("c", 100L))).toDF("g", "w")
    val out = Sampling.uniMaxAllocation(df, "g", col("w"), 0.4, 0.6)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    out(0) shouldBe ("a", 100L, 60.0, 0.6, true)
    out(1) shouldBe ("b", 200L, 120.0, 0.6, true)
    out(2)._1 shouldBe "c"
    out(2)._3 shouldBe 220.0 +- 1e-9
    out(2)._4 shouldBe 220.0 / 700 +- 1e-12
    out(2)._5 shouldBe false
    // budget fully spent when it fits under the caps
    out.map(_._3).sum shouldBe 400.0 +- 1e-9
    // over-budget: everything caps and the surplus is honestly unspent
    val over = Sampling.uniMaxAllocation(df, "g", col("w"), 0.9, 0.5)
      .collect().map(r => (r.getDouble(2), r.getBoolean(4)))
    over.foreach(_._2 shouldBe true)
    over.map(_._1).sum shouldBe 500.0 +- 1e-9 // = 0.5 epochs of 1000
  }

  test("temperatureWeights: closed-form shares; T=1 is the identity mix") {
    import spark.implicits._
    // masses 90 / 10: p = .9/.1; T=2 -> pt = sqrt(p); shares
    val df = (Seq.fill(9)(("a", 10L)) :+ (("b", 10L))).toDF("g", "w")
    val out = Sampling.temperatureWeights(df, "g", col("w"), 2.0)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val za = math.sqrt(0.9) + math.sqrt(0.1)
    out(0)._1 shouldBe "a"
    out(0)._2 shouldBe 90L
    out(0)._3 shouldBe 0.9 +- 1e-12
    out(0)._4 shouldBe math.sqrt(0.9) / za +- 1e-12
    out(1)._4 shouldBe math.sqrt(0.1) / za +- 1e-12
    // temperature softens but never inverts the order; shares sum to 1
    out(0)._4 should be > out(1)._4
    (out(0)._4 + out(1)._4) shouldBe 1.0 +- 1e-12
    // T = 1: temp_share == nat_share
    Sampling.temperatureWeights(df, "g", col("w"), 1.0)
      .select(max(abs(col("temp_share") - col("nat_share"))))
      .head.getDouble(0) should be < 1e-12
  }
}
