package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class DedupSpec extends AnyFunSuite with Matchers with SparkTestBase {

  import Dedup._

  test("exact dedup: null-position adversarial keys do NOT collide") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), None: Option[String]),
      (2L, None: Option[String], Some("a")),
      (3L, Some("a"), None: Option[String])).toDF("id", "c1", "c2")
    val out = exact(df, Seq("c1", "c2"), "id")
    out.count() shouldBe 2 // rows 1 and 2 are distinct keys; 3 dups 1
    out.select("id").as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  test("exact dedup keeps the smallest tieBreak row") {
    import spark.implicits._
    val df = Seq((9L, "x"), (4L, "x"), (7L, "y")).toDF("id", "k")
    val out = exact(df, Seq("k"), "id")
    out.select("id").as[Long].collect().sorted shouldBe Array(4L, 7L)
  }

  test("exactGroups counts copies and picks min representative") {
    import spark.implicits._
    val df = Seq((5L, "x"), (2L, "x"), (8L, "y")).toDF("id", "k")
    val out = exactGroups(df, Seq("k"), "id")
      .orderBy("k").collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) shouldBe
      Array(("x", 2L, 2L), ("y", 8L, 1L))
  }

  test("wordShingles: zip-chain construction equals the naive sliding window") {
    // The capture-free zip-chain spelling (round 9 — the index-slice
    // lambda re-ran normalize+split per shingle) must stay
    // byte-identical to the definition: shingle i = tokens i..i+n-1
    // joined by " ", first-occurrence distinct, whole text when the
    // doc is shorter than n words.
    import spark.implicits._
    def naive(text: String, n: Int): Seq[String] = {
      val norm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      val toks = norm.split(" ", -1).toSeq
      val all =
        if (toks.size < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      all.distinct
    }
    val rnd = new scala.util.Random(7)
    val vocab = Array("a", "bb", "ccc", "Dd", "e!", "ff9", "")
    val texts = (1 to 60).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    } :+ "" :+ "one" :+ "one two" :+ "x x x x x"
    for (n <- 1 to 4) {
      val got = texts.toDF("t")
        .select(col("t"), wordShinglesAll(col("t"), n).as("all"),
          wordShingles(col("t"), n).as("dist"))
        .collect()
      got.foreach { r =>
        val text = r.getString(0)
        val norm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        val toks = norm.split(" ", -1).toSeq
        val expAll =
          if (toks.size < n) Seq(toks.mkString(" "))
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        withClue(s"n=$n text='$text': ") {
          r.getSeq[String](1) shouldBe expAll
          r.getSeq[String](2) shouldBe naive(text, n)
        }
      }
    }
  }

  test("minhash: aggregate-path signatures equal the scalar expression") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox jumps over the lazy dog again")).toDF("id", "text")
    val viaAgg = minhashSignatures(docs, "id", "text", numHashes = 16, shingleSize = 2)
      .select(col("__id").as("id"), col("__sig"))
    val viaExpr = docs.select(col("id"),
      minhashSignature(col("text"), numHashes = 16, shingleSize = 2).as("__sig"))
    val joined = viaAgg.alias("a").join(viaExpr.alias("e"), "id")
      .where(col("a.__sig") =!= col("e.__sig"))
    joined.count() shouldBe 0
  }

  test("minhash pairs: identical docs found with est_jaccard 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")).toDF("id", "text")
    val pairs = minhashPairs(docs, "id", "text", 0.9, numHashes = 32, bands = 8, shingleSize = 2)
      .collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    pairs.head.getDouble(2) shouldBe 1.0
  }

  test("simhash: aggregate-path frame equals the scalar expression") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow")).toDF("id", "text")
    val viaAgg = simhashFrame(docs, "id", "text")
      .select(col("__id").as("id"), col("__sh"))
    val viaExpr = docs.select(col("id"), simhash64(col("text")).as("__sh"))
    viaAgg.alias("a").join(viaExpr.alias("e"), "id")
      .where(col("a.__sh") =!= col("e.__sh"))
      .count() shouldBe 0
  }

  test("simhash: identical docs collide; hamming bound respected") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark engine query plan optimizer shuffle partition"),
      (2L, "spark engine query plan optimizer shuffle partition"),
      (3L, "completely different words about cooking pasta tonight")).toDF("id", "text")
    val pairs = simhashPairs(docs, "id", "text", maxHamming = 3).collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) should contain((1L, 2L))
    all(pairs.map(_.getInt(2))) should be <= 3
  }

  test("ngram jaccard: identical docs score 1.0, disjoint docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "q r s t u v w")).toDF("id", "text")
    val pairs = ngramJaccardPairs(docs, "id", "text", n = 2, minJaccard = 0.5)
      .collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    pairs.head.getDouble(2) shouldBe 1.0
  }

  test("prefix-filter jaccard equals the full-index brute force") {
    import spark.implicits._
    // adversarial: a universal hot token ("the") in every doc — the
    // prefix index must still find exactly the qualifying pairs, via
    // the rare tokens, without ever joining on the hot one
    val docs = Seq(
      (1L, "the quick brown fox jumps over lazy dog"),
      (2L, "the quick brown fox jumps over lazy cat"),
      (3L, "the quick brown fox jumps over lazy dog"),
      (4L, "the slow green turtle walks under heavy rain"),
      (5L, "the slow green turtle walks under heavy rain today"),
      (6L, "the completely different words appear here now")).toDF("id", "text")
    for (tau <- Seq(0.5, 0.8); n <- Seq(1, 2)) {
      val brute = ngramJaccardPairs(docs, "id", "text", n = n,
          minJaccard = tau, maxDocFreq = 0L)
        .orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val fast = prefixJaccardPairs(docs, "id", "text", n = n, minJaccard = tau)
        .orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      withClue(s"tau=$tau n=$n: ") { fast shouldBe brute }
    }
  }

  test("prefix-filter jaccard keeps a pair sitting exactly at the threshold") {
    import spark.implicits._
    // |a|=|b|=5, overlap 4 -> J = 4/6 = 0.666..; at tau = 2/3 the pair
    // must survive (>=, not >) and the prefix length floor (|d| -
    // ceil(tau*|d|) + 1 = 5-4+1 = 2) still indexes a shared rare token
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta")).toDF("id", "text")
    val out = prefixJaccardPairs(docs, "id", "text", n = 1, minJaccard = 4.0 / 6.0)
      .collect()
    out.length shouldBe 1
    out.head.getDouble(2) shouldBe 4.0 / 6.0 +- 1e-15
  }

  test("prefix-filter jaccard: identical docs 1.0, disjoint absent, null/empty text safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("a b c d e f g")),
      (2L, Some("a b c d e f g")),
      (3L, Some("q r s t u v w")),
      (4L, None: Option[String]),
      (5L, Some(""))).toDF("id", "text")
    val pairs = prefixJaccardPairs(docs, "id", "text", n = 2, minJaccard = 0.5)
      .collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    pairs.head.getDouble(2) shouldBe 1.0
  }

  test("connected components: transitive chain collapses to min label") {
    import spark.implicits._
    val nodes = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val comp = connectedComponents(nodes, pairs)
      .orderBy("id").as[(Long, Long)].collect()
    comp shouldBe Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
  }

  test("connected components: 50-node path converges via pointer jumping") {
    import spark.implicits._
    // Worst case for plain min-label propagation (diameter 49, needs 49
    // rounds); pointer jumping must land it within the default budget.
    val nodes = (1L to 50L).toDF("id")
    val pairs = (1L to 49L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = connectedComponents(nodes, pairs)
      .as[(Long, Long)].collect()
    comp.length shouldBe 50
    all(comp.map(_._2)) shouldBe 1L
  }

  test("bandsFor derives the banding from the detection threshold") {
    // j=0.9 at 64 hashes: 8 bands × 8 rows (t = 0.125^(1/8) ≈ 0.771);
    // 16 bands would set t = 0.5 and flood verification.
    bandsFor(64, 0.9) shouldBe 8
    bandsFor(64, 0.7) shouldBe 16 // t(r=4,b=16) = 0.5; r=8's 0.771 > 0.7
    bandsFor(64, 0.99) shouldBe 2 // very high threshold → wide bands
    bandsFor(64, 0.01) shouldBe 64 // threshold below every divisor curve
    bandsFor(128, 0.8) shouldBe 16 // t(r=8,b=16) = 0.707
  }

  test("exactly-once candidate emission matches the distinct-based path") {
    import spark.implicits._
    val docs = (1L to 40L).map { i =>
      // 4 clusters of 10 near-identical docs + per-doc salt
      val base = s"cluster${i % 4} shared words run common phrase body text"
      (i, s"$base extra$i")
    }.toDF("id", "text")
    val sigs = minhashSignatures(docs, "id", "text", numHashes = 32, shingleSize = 1)
    val fast = candidatesFromSigs(sigs, numHashes = 32, bands = 8)
    // reference path: raw bucket join + distinct (what the filter replaces)
    val r = 32 / 8
    val banded = sigs
      .select(col("__id"), explode(sequence(lit(0), lit(7))).as("__band"),
        col("__sig"))
      .select(col("__id"), col("__band"),
        xxhash64(col("__band"), slice(col("__sig"), col("__band") * r + 1, lit(r))).as("__bucket"))
    val slow = banded.as("a").join(banded.as("b"), Seq("__band", "__bucket"))
      .where(col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    fast.count() shouldBe fast.distinct().count() // exactly-once: no dup rows
    fast.as[(Long, Long)].collect().toSet shouldBe
      slow.as[(Long, Long)].collect().toSet
  }

  test("threshold-derived banding returns the same verified pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (4L, "one two three four five six seven eight nine ten")).toDF("id", "text")
    val auto = minhashPairs(docs, "id", "text", 0.9, numHashes = 64, shingleSize = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val fixed = minhashPairs(docs, "id", "text", 0.9, numHashes = 64, bands = 16,
      shingleSize = 1).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    auto shouldBe fixed
    auto should contain((1L, 2L))
  }

  test("hot-shingle guard drops stopword shingles from the index") {
    import spark.implicits._
    // "the" appears in every doc; with maxDocFreq=2 it is excluded, so
    // docs sharing ONLY "the" produce no pair.
    val docs = Seq(
      (1L, "the apple orchard"),
      (2L, "the rusty bicycle"),
      (3L, "the quiet harbor")).toDF("id", "text")
    val pairs = ngramJaccardPairs(docs, "id", "text", n = 1, minJaccard = 0.01,
      maxDocFreq = 2L)
    pairs.count() shouldBe 0
  }

  test("lshParamsFor: optimum tracks the threshold; rule-of-thumb holds") {
    // higher threshold -> longer bands (steeper, later S-curve)
    val (bLo, rLo) = Dedup.lshParamsFor(128, tau = 0.3)
    val (bHi, rHi) = Dedup.lshParamsFor(128, tau = 0.9)
    rHi should be > rLo
    bLo should be > bHi
    bLo * rLo shouldBe 128
    bHi * rHi shouldBe 128
    // the chosen split's implied threshold (1/b)^(1/r) lands near tau
    def implied(b: Int, r: Int) = math.pow(1.0 / b, 1.0 / r)
    math.abs(implied(bLo, rLo) - 0.3) should be < 0.15
    math.abs(implied(bHi, rHi) - 0.9) should be < 0.1
    // the q28/q48 production split (16 bands x 8 rows, implied
    // threshold (1/16)^(1/8) ≈ 0.707) is the tuner's optimum at ~0.7;
    // at the operators' tau = 0.8 the tuner prefers (8, 16) — i.e.
    // the production split deliberately leans RECALL (candidates at
    // 0.7+ still surface; the exact verify pass discards them)
    Dedup.lshParamsFor(128, tau = 0.7) shouldBe ((16, 8))
    Dedup.lshParamsFor(128, tau = 0.8) shouldBe ((8, 16))
  }

  test("connectedComponentsFrom: warm start matches cold and converges in fewer rounds") {
    import spark.implicits._
    // one long chain 0-1-...-49 grown by appending edge (49,50): the
    // cold run pays O(log diameter) rounds; the warm run starts at the
    // old fixed point and only absorbs the new node
    val nodes = (0L to 50L).toDF("id")
    val oldPairs = (0L until 49L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val allPairs = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (oldLabels, _) = Dedup.connectedComponentsFrom(nodes, oldPairs, None)
    val (cold, coldRounds) = Dedup.connectedComponentsFrom(nodes, allPairs, None)
    val (warm, warmRounds) =
      Dedup.connectedComponentsFrom(nodes, allPairs, Some(oldLabels))
    warm.orderBy("id").collect().map(_.toSeq) shouldBe
      cold.orderBy("id").collect().map(_.toSeq)
    warm.select("component").distinct().count() shouldBe 1
    warmRounds should be < coldRounds
    // a carried label pointing at a VANISHED node falls back to id
    val stale = Seq((5L, 999L)).toDF("id", "component")
    val (fixed, _) = Dedup.connectedComponentsFrom(
      Seq(5L, 6L).toDF("id"), Seq((5L, 6L)).toDF("id_a", "id_b"), Some(stale))
    fixed.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq shouldBe Seq((5L, 5L), (6L, 5L))
  }

  test("keepBestPerCluster keeps the argmax-score row per component, id tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 10L), (2L, "a dup", 30L), (3L, "a dup too", 30L), // cluster {1,2,3}
      (4L, "alone", 5L)                                           // singleton
    ).toDF("doc_id", "text", "len")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("id", "component")
    val kept = keepBestPerCluster(docs, "doc_id", clusters, "len")
      .select("doc_id", "component", "len").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // 2 beats 3 on the id tie at score 30; 1 loses on score; 4 survives alone
    kept shouldBe Array((2L, 1L, 30L), (4L, 4L, 5L))
  }

  test("crawlDiff classifies unchanged/changed/added/removed; normalization-invariant") {
    import spark.implicits._
    val old_ = Seq(
      (1L, "same text"),
      (2L, "will change"),
      (3L, "will be removed"),
      (4L, "Same   TEXT!") // doc 4 re-crawled with formatting noise only
    ).toDF("doc_id", "text")
    val new_ = Seq(
      (1L, "same text"),
      (2L, "has changed"),
      (4L, "same text"),   // normalizes identically -> unchanged
      (5L, "brand new")
    ).toDF("doc_id", "text")
    val out = Dedup.crawlDiff(old_, new_, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect()
    out shouldBe Array(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"),
      (4L, "unchanged"), (5L, "added"))
  }

  test("crawlDiff: null-text rows are PRESENT in their snapshot, not added/removed") {
    import spark.implicits._
    val old_ = Seq(
      (1L, Some("had text")),
      (2L, None: Option[String]),  // failed fetch both times
      (3L, None: Option[String])   // fetch recovered in the new crawl
    ).toDF("doc_id", "text")
    val new_ = Seq(
      (1L, None: Option[String]),  // fetch failed on re-crawl: changed, NOT removed
      (2L, None: Option[String]),  // still null both sides -> unchanged
      (3L, Some("now has text"))   // changed, NOT added
    ).toDF("doc_id", "text")
    Dedup.crawlDiff(old_, new_, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect() shouldBe Array(
      (1L, "changed"), (2L, "unchanged"), (3L, "changed"))
  }

  test("dedupSpans: cross-doc spans kept at first occurrence, docs can vanish") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),  // spans "a b", "c d"
      (2L, "a b x y"),  // "a b" repeats doc 1 -> dropped; "x y" kept
      (3L, "c d")       // its only span repeats doc 1 -> doc vanishes
    ).toDF("doc_id", "text")
    val out = dedupSpans(df, "doc_id", "text", spanTokens = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    out shouldBe Array(
      (1L, 2L, 4L, "a b c d"),
      (2L, 1L, 2L, "x y"))
  }

  test("dedupSpans: within-doc repeats collapse; short tail span counted") {
    import spark.implicits._
    val df = Seq(
      (1L, "p q p q"), // second "p q" is a repeat of the first
      (2L, "m n o")    // tail span "o" has 1 token
    ).toDF("doc_id", "text")
    val out = dedupSpans(df, "doc_id", "text", spanTokens = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    out shouldBe Array(
      (1L, 1L, 2L, "p q"),
      (2L, 2L, 3L, "m n o"))
  }

  test("sharedCharSpans: exact unaligned detection, closed-form fractions, step bound") {
    import spark.implicits._
    // doc 2 embeds doc 1's 12-char block at an offset no token-span
    // boundary would align to; doc 3 is all-unique
    val a = "abcdefghijkl" // the shared 12-char block
    val df = Seq(
      (1L, s"${a}0123456789"),
      (2L, s"zzzz${a}zzzzzz"),
      (3L, "qrstuvwx9876543210")).toDF("doc_id", "text")
    val out = sharedCharSpans(df, "doc_id", "text", k = 12)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: 11 windows (22-12+1), exactly ONE (the block itself) shared
    // doc 2: 11 windows, one shared; doc 3: 7 windows, none
    out shouldBe Seq((1L, 11L, 1L), (2L, 11L, 1L), (3L, 7L, 0L))
    // exactness: shrink the shared block below k and nothing matches
    val none = sharedCharSpans(df, "doc_id", "text", k = 13)
      .agg(sum("n_shared")).head.getLong(0)
    none shouldBe 0L
    // mod-p sampling is CONTENT-keyed: the same windows of a shared
    // block survive in both docs even at phase-shifted offsets (an
    // offset-stride sampler provably misses this fixture), so a long
    // shared block is still detected in both documents
    val b = "The quick brown fox jumps over the lazy dog again and again"
    val df2 = Seq(
      (1L, s"$b 0123456789"),
      (2L, s"zzz $b zzzzzzz")).toDF("doc_id", "text")
    val det = sharedCharSpans(df2, "doc_id", "text", k = 12, sampleMod = 2)
      .where(col("n_shared") >= 1).count()
    det shouldBe 2
    // ...and never invents a false positive on unique docs
    sharedCharSpans(df.where(col("doc_id") === 3), "doc_id", "text",
        k = 12, sampleMod = 2)
      .agg(coalesce(sum("n_shared"), lit(0L))).head.getLong(0) shouldBe 0L
    // duplicate windows inside ONE doc don't count as shared
    val selfDup = Seq((1L, "ababababababababab" + "XY")).toDF("doc_id", "text")
    sharedCharSpans(selfDup, "doc_id", "text", k = 4)
      .agg(sum("n_shared")).head.getLong(0) shouldBe 0L
  }

  test("exactSubstringContamination: exact run lengths, sub-threshold drop, stride invariance") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def blob(n: Int) = rnd.alphanumeric.take(n).mkString
    val shared80 = blob(80)
    val shared50 = blob(50)
    val corpus = Seq(
      // doc 1: the 80-char bench run planted at an odd offset
      (1L, blob(37) + shared80 + blob(23)),
      // doc 2: only a 50-char overlap — below minLen, must not flag
      (2L, blob(41) + shared50 + blob(19)),
      // doc 3: clean
      (3L, blob(120)),
      // doc 4: the same 80-char run, so the bench doc flags BOTH 1 and 4
      (4L, shared80 + blob(55))
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, blob(9) + shared80 + blob(5) + shared50 + blob(7))
    ).toDF("bench_id", "bench_text")

    val out = exactSubstringContamination(corpus, "doc_id", "text",
        bench, "bench_id", "bench_text", minLen = 60)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // exact maximal run: exactly the planted 80 chars, nothing more
    out shouldBe Seq((1L, 1L, 80L), (4L, 1L, 80L))

    // stride invariance: the strided grid and the stride-1 grid agree
    // (detection is exact at >= minLen by pigeonhole; extension recovers
    // the full run from any anchor)
    val exact = exactSubstringContamination(corpus, "doc_id", "text",
        bench, "bench_id", "bench_text", minLen = 60, corpusStride = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    exact shouldBe out

    // a run straddling the bench doc's start (left extension hits the
    // boundary) still measures exactly
    val headBench = Seq((200L, shared80.drop(10) + blob(6))).toDF("bench_id", "bench_text")
    val headOut = exactSubstringContamination(corpus, "doc_id", "text",
        headBench, "bench_id", "bench_text", minLen = 60)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    headOut shouldBe Seq((1L, 70L), (4L, 70L))
  }

  test("dedupSpans is layout-stable (keep-first is (id, idx) order, not partition order)") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, if (i % 2 == 0) "dup span text here" else s"uniq $i text $i"))
      .toDF("doc_id", "text")
    val a = dedupSpans(df, "doc_id", "text", spanTokens = 2)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = dedupSpans(df.repartition(13), "doc_id", "text", spanTokens = 2)
      .orderBy("doc_id").collect().map(_.toSeq)
    a shouldBe b
    // the shared span survives only in doc 2, the lowest even id
    val kept = a.map(r => r.head.asInstanceOf[Long]).toSet
    kept.contains(2L) shouldBe true
    (4L to 40L by 2).exists(kept.contains) shouldBe false
  }
}
