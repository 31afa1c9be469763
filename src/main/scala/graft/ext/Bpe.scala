package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learned-merges byte-pair encoding over the corpus — real BPE, not
  * the `bpeishTokenCount` heuristic: a merge table is LEARNED from the
  * corpus's word frequencies (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"), then applied to
  * every document so the token counts that drive packing
  * ([[Sampling.packSequences]] / [[Sampling.packBinsFFD]]), budget
  * mixing, and chunking match what a subword tokenizer actually
  * produces.
  *
  * Semantics (pinned by BpeSpec's independent reference
  * implementation): word-internal merges only (words are
  * [[TextAnalysis.normalize]]d whitespace tokens; no end-of-word
  * marker, no cross-word merges), merges learned greedily — each round
  * takes the adjacent symbol pair with the highest occurrence count
  * weighted by word frequency, ties broken (count desc, left asc,
  * right asc) — and ENCODING applies the merge table in rank order,
  * each rule merging its occurrences left-to-right. Rank-order
  * application is the standard simple-implementation variant of
  * Sennrich's lowest-rank-first loop; the two differ only on contrived
  * tables where a later rule manufactures an earlier rule's operand,
  * which greedy learning never emits for its own corpus.
  *
  * Shape at scale: the corpus is touched exactly ONCE (the word-count
  * aggregation — explode + hash agg with map-side combine). Everything
  * sequential happens on the VOCABULARY table (Zipf: orders of
  * magnitude below the corpus): each learning round is one pair-count
  * aggregation over the vocab plus a 1-row argmax collect — the same
  * O(1) driver round-trip class as centroid seeding — and each round's
  * rewritten vocab is `localCheckpoint`-pinned so lineage stays flat.
  * Encoding re-derives piece counts for DISTINCT words only, then
  * broadcast-joins the word→pieces map back onto the token stream; the
  * corpus text never shuffles — only (id, piece-count) rows do.
  */
object Bpe {

  /** A learned merge table in rank order. */
  final case class BpeModel(merges: Seq[(String, String)])

  /** Word → its spaced symbol string ("hello" → "h e l l o"). Symbols
    * stay `[a-z0-9]+` by construction (normalized words), so the space
    * separator can never collide with symbol content.
    */
  private def spacedChars(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** One merge rule as a Java regex on the spaced representation:
    * zero-width boundary assertions (not consumed spaces), so
    * consecutive occurrences all merge in ONE left-to-right pass —
    * `a a a a` under rule (a,a) becomes `aa aa`, the greedy pairing,
    * where a space-consuming pattern would skip every other
    * occurrence. Spark-side only (lookaround is not RE2), which is
    * fine: BPE encode has no SQL oracle twin by design.
    */
  private def mergePattern(a: String, b: String): String =
    "(?<!\\S)" + java.util.regex.Pattern.quote(a) + " " +
      java.util.regex.Pattern.quote(b) + "(?!\\S)"

  /** Adjacent-pair occurrence counts over a (freq `__f`, spaced `__s`)
    * vocab frame, weighted by word frequency — overlapping occurrences
    * all count ("aaa" contributes two (a,a)), matching the reference
    * algorithm. HOF-free: posexplode + element_at (the
    * [[TextAnalysis.bigramCrossEntropy]] spelling).
    */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("__f"), split(col("__s"), " ").as("__sy"))
      .where(size(col("__sy")) >= 2)
      .select(col("__f"), col("__sy"),
        posexplode(col("__sy")).as(Seq("__p", "__a")))
      .where(col("__p") < size(col("__sy")) - 1)
      .select(col("__f"), col("__a"),
        element_at(col("__sy"), col("__p") + 2).as("__b"))
      .groupBy(col("__a"), col("__b"))
      .agg(sum(col("__f")).as("__c"))

  /** Learn up to `numMerges` merge rules from the corpus's word
    * frequencies. Stops early when the best remaining pair occurs
    * fewer than `minPairCount` times (merging singletons memorizes
    * noise). One corpus pass total; each round is vocab-sized work.
    */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var vocab = df
      .select(explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("__w"))
      .where(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__f"), spacedChars(col("__w")).as("__s"))
      // the loop table is VOCAB-sized (Zipf) — pin it on few partitions
      // so each of the numMerges rounds schedules a handful of tasks
      // instead of a full shuffle-width's worth (measured ~2× the whole
      // learn loop at sf0.1); 8 × ~1M-row partitions still holds a
      // 10M-word web vocabulary comfortably
      .coalesce(8)
      .localCheckpoint()
    // Branch on the MEASURED pinned vocab size (the Prefix/Par
    // scale-adaptive discipline, r22): a vocab that fits one advisory
    // shuffle partition runs the greedy loop on the driver — the
    // reference Sennrich shape: one collect, then numMerges rounds of
    // in-memory pair counting and regex merging, ZERO per-round Spark
    // roundtrips (the distributed loop paid ~84 scheduled jobs + plan
    // passes for 32 merges at sf0.1, its entire profiled wall; a
    // measured AQE-off variant cut the job count in half and the wall
    // not at all — the roundtrips themselves are the floor). The
    // in-memory rounds replay the SAME arithmetic: integer pair counts
    // (order-free sums), the same (count desc, left asc, right asc)
    // tie-break (symbols are [a-z0-9]+ by construction, where UTF8 and
    // Java string order agree), and the same java.util.regex pattern +
    // replaceAll the codegen regexp_replace runs — BpeSpec pins merge
    // equality between the two branches. Corpus-scale vocabularies
    // beyond the byte bound keep the distributed loop untouched.
    val vocabBytes: Long = vocab.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val id = l.rdd.id
        df.sparkSession.sparkContext.getRDDStorageInfo
          .filter(_.id == id).map(i => i.memSize + i.diskSize).sum
      case _ => 0L
    }
    val advisory = df.sparkSession.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    if (vocabBytes > 0 && vocabBytes <= advisory) {
      var entries = vocab.collect().map(r => (r.getLong(0), r.getString(1)))
      var done = false
      while (!done && merges.size < numMerges) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        entries.foreach { case (f, s) =>
          val toks = s.split(" ")
          var i = 0
          while (i < toks.length - 1) {
            val key = (toks(i), toks(i + 1))
            counts.update(key, counts.getOrElse(key, 0L) + f)
            i += 1
          }
        }
        var best: ((String, String), Long) = null
        counts.foreach { e =>
          if (best == null || e._2 > best._2 ||
            (e._2 == best._2 && (e._1._1 < best._1._1 ||
              (e._1._1 == best._1._1 && e._1._2 < best._1._2)))) best = e
        }
        if (best == null || best._2 < minPairCount) done = true
        else {
          val (a, b) = best._1
          merges += ((a, b))
          val pat = java.util.regex.Pattern.compile(mergePattern(a, b))
          val sub = a + " " + b
          entries = entries.map { case (f, s) =>
            if (s.contains(sub)) (f, pat.matcher(s).replaceAll(a + b)) else (f, s)
          }
        }
      }
    } else {
      var done = false
      var sincePin = 0
      while (!done && merges.size < numMerges) {
        val top = pairCounts(vocab)
          .orderBy(col("__c").desc, col("__a"), col("__b"))
          .limit(1).collect()
        if (top.isEmpty || top(0).getAs[Long]("__c") < minPairCount) done = true
        else {
          val (a, b) = (top(0).getAs[String]("__a"), top(0).getAs[String]("__b"))
          merges += ((a, b))
          // Pin every 8th rewrite, not every rewrite (r21): an
          // unbounded chain would stack r regexp passes into round r's
          // plan, but a per-round localCheckpoint pays a full
          // materialization JOB per rule — half this loop's driver
          // roundtrips. Eight chained regexp projections over the
          // 8-partition vocab re-run per top-pair collect for far less
          // than a checkpoint job costs; lineage depth stays ≤ 8.
          vocab = vocab
            .withColumn("__s", regexp_replace(col("__s"), mergePattern(a, b), a + b))
          sincePin += 1
          if (sincePin >= 8) {
            vocab = vocab.localCheckpoint()
            sincePin = 0
          }
        }
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Apply the merge table to a frame of distinct words (`wordCol`):
    * adds `__pieces` (the spaced piece string) and `__np` (piece
    * count). The whole rank-ordered chain is one codegen projection
    * over the vocab-sized input.
    */
  def wordPieces(words: DataFrame, wordCol: String, model: BpeModel): DataFrame = {
    val encoded = model.merges.foldLeft(spacedChars(col(wordCol))) {
      case (c, (a, b)) => regexp_replace(c, mergePattern(a, b), a + b)
    }
    words.withColumn("__pieces", encoded)
      .withColumn("__np", size(split(col("__pieces"), " ")).cast("long"))
  }

  /** Encode a corpus: one row per non-null-text document — `n_words`
    * (whitespace tokens of the normalized text) and `n_bpe_tokens`
    * (pieces under the model). A document whose normalized text is
    * empty scores (0, 0), not a missing row (the scored-at-bias
    * convention).
    *
    * Shape at scale: explode → DISTINCT words (vocab-sized) → merge
    * chain over the vocab → broadcast word→pieces map joined back onto
    * the token stream → one per-doc aggregation. Corpus text never
    * shuffles.
    */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: BpeModel): DataFrame = {
    val base = df.where(col(textCol).isNotNull)
    val toks = base
      .select(col(idCol), explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("__w"))
      .where(col("__w") =!= "")
    // pinned: the distinct-word scan feeds the merge chain whose result
    // is broadcast — unpinned, the 32-regexp projection re-runs per
    // consumer action (the model-table fan-out lesson)
    val wp = wordPieces(toks.select(col("__w")).distinct(), "__w", model)
      .select(col("__w"), col("__np"))
      .localCheckpoint()
    val counts = toks.join(broadcast(wp), Seq("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__np")).as("n_bpe_tokens"))
    base.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** BPE-budget chunking — [[TextAnalysis.chunkByTokens]] measured in
    * LEARNED tokens instead of whitespace tokens: consecutive
    * whitespace words grouped so each chunk's BPE piece total stays
    * within `chunkBudget`, never splitting a word. Assignment is by
    * start offset (word w lands in chunk `floor(start_pieces /
    * budget)`) — the closed-form, one-shuffle spelling: a chunk may
    * overflow by at most its straddling word's pieces − 1, and a
    * single word costing more than the whole budget gets a chunk to
    * itself (the dedicated-bin convention), exactly the cases a
    * sequential greedy packer also cannot avoid.
    *
    * Output: one row per (doc, chunk) — `chunk_idx`,
    * `chunk_bpe_tokens`, `chunk_text` (the original normalized words
    * joined by spaces, in order).
    *
    * Shape at scale: the running piece sum is a window partitioned BY
    * DOCUMENT (thousands of parallel partitions, no global sort), the
    * word→pieces map broadcasts, and reassembly is one hash
    * aggregation keyed by (doc, chunk) with an in-row `sort_array` —
    * the q71 reassembly shape without its lambda.
    */
  def chunkByBpeTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: BpeModel,
      chunkBudget: Int): DataFrame = {
    require(chunkBudget > 0, s"chunkBudget must be positive, got $chunkBudget")
    val toks = df.where(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(TextAnalysis.normalize(col(textCol)), " "))
          .as(Seq("__p", "__w")))
      .where(col("__w") =!= "")
    val wp = wordPieces(toks.select(col("__w")).distinct(), "__w", model)
      .select(col("__w"), col("__np"))
      .localCheckpoint()
    val w = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    toks.join(broadcast(wp), Seq("__w"))
      .withColumn("__start", sum(col("__np")).over(w) - col("__np"))
      .withColumn("chunk_idx", floor(col("__start") / lit(chunkBudget.toLong)))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(
        sum(col("__np")).as("chunk_bpe_tokens"),
        array_join(
          sort_array(collect_list(struct(col("__p"), col("__w"))))
            .getField("__w"),
          " ").as("chunk_text"))
  }
}
