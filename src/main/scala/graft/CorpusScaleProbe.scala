package graft

import graft.ext.{Dedup, SyntheticCorpus}

/** Scale-linearity probe for the near-dup path on a realistic corpus:
  * runs `minhashPairs` over `SyntheticCorpus.realistic` at increasing
  * doc counts (generation excluded from timing via localCheckpoint) and
  * prints one JSON line per size. The thing to check: wall time grows
  * ~linearly with docs at fixed dup rate — the banded LSH never touches
  * the O(n²) pair space, which the degenerate fixture can't demonstrate
  * (BENCH_NOTES "degenerate vs realistic").
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.CorpusScaleProbe 5000 50000"
  */
object CorpusScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(5000, 50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    for (n <- sizes) {
      val docs = SyntheticCorpus.realistic(spark, n).localCheckpoint()
      val t0 = System.nanoTime()
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        minJaccard = 0.7, numHashes = 64, shingleSize = 1)
        .queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"metric":"minhash_realistic","n_docs":$n,""" +
        s""""pairs":$pairs,"sec":$secs,"cpus":$cpus}""")
      // The composed pipeline, same corpus: its 5k-doc cost is a fixed
      // stage-scaffolding floor (BENCH_NOTES) — this line measures how
      // that floor amortizes as docs grow
      val t1 = System.nanoTime()
      val kept = graft.ext.TextPipeline.cleanCorpus(docs, "doc_id", "text",
        graft.ext.TextPipeline.Config(minQuality = 0.2, langs = Seq("en"),
          nearDupJaccard = 0.9, numHashes = 64, shingleSize = 3))
        .queryExecution.toRdd.count()
      val secs1 = (System.nanoTime() - t1) / 1e9
      println(s"""{"metric":"clean_corpus_realistic","n_docs":$n,""" +
        s""""kept":$kept,"sec":$secs1,"cpus":$cpus}""")
      // Eval-set contamination: the benchmark side is genuinely FIXED
      // (the first 100 doc ids, identical at every probe size), so any
      // growth is attributable to the corpus side alone — the
      // broadcast join never shuffles the exploded corpus grams
      val t2 = System.nanoTime()
      import org.apache.spark.sql.functions.col
      val flagged = graft.ext.TextPipeline.contaminatedIds(docs, "doc_id",
        "text", docs.where(col("doc_id") < 100), "text", n = 5)
        .queryExecution.toRdd.count()
      val secs2 = (System.nanoTime() - t2) / 1e9
      println(s"""{"metric":"contamination_realistic","n_docs":$n,""" +
        s""""flagged":$flagged,"sec":$secs2,"cpus":$cpus}""")
      // Unigram cross-entropy: explode + two hash aggs + a
      // vocabulary-sized join — the model table grows sublinearly
      // (Zipf), the doc side linearly
      val t3 = System.nanoTime()
      val scored = graft.ext.TextAnalysis.unigramCrossEntropy(
        docs, "doc_id", "text").queryExecution.toRdd.count()
      val secs3 = (System.nanoTime() - t3) / 1e9
      println(s"""{"metric":"unigram_xent_realistic","n_docs":$n,""" +
        s""""scored":$scored,"sec":$secs3,"cpus":$cpus}""")
      // Span dedup: explode + span-keyed agg + join-back + doc-keyed
      // reassembly — all streams linear in token count; the realistic
      // corpus's planted dups give the winners table real work
      val t4 = System.nanoTime()
      val survivors = Dedup.dedupSpans(docs, "doc_id", "text", spanTokens = 10)
        .queryExecution.toRdd.count()
      val secs4 = (System.nanoTime() - t4) / 1e9
      println(s"""{"metric":"span_dedup_realistic","n_docs":$n,""" +
        s""""survivors":$survivors,"sec":$secs4,"cpus":$cpus}""")
      // DSIR weights: model agg (pinned, vocab-sized) + scoring join —
      // two corpus explodes total, vocabulary sublinear (Zipf). Target
      // = a fixed 20% slice (the generated corpus is all-en, so the
      // lang label would make target ≡ raw)
      val t5 = System.nanoTime()
      val weighted = graft.ext.TextAnalysis.dsirWeights(docs, "doc_id",
        "text", col("doc_id") % 5 === 0).queryExecution.toRdd.count()
      val secs5 = (System.nanoTime() - t5) / 1e9
      println(s"""{"metric":"dsir_realistic","n_docs":$n,""" +
        s""""weighted":$weighted,"sec":$secs5,"cpus":$cpus}""")
      // Bigram xent: the WIDEST pinned stream in the engine (one row
      // per token transition) feeding two model joins
      val t6 = System.nanoTime()
      val biScored = graft.ext.TextAnalysis.bigramCrossEntropy(
        docs, "doc_id", "text").queryExecution.toRdd.count()
      val secs6 = (System.nanoTime() - t6) / 1e9
      println(s"""{"metric":"bigram_xent_realistic","n_docs":$n,""" +
        s""""scored":$biScored,"sec":$secs6,"cpus":$cpus}""")
      // OOV rate: top-k vocab (TakeOrdered) + broadcast scoring join
      val t7 = System.nanoTime()
      val oovScored = graft.ext.TextAnalysis.oovRate(
        docs, "doc_id", "text", vocabSize = 1000).queryExecution.toRdd.count()
      val secs7 = (System.nanoTime() - t7) / 1e9
      println(s"""{"metric":"oov_realistic","n_docs":$n,""" +
        s""""scored":$oovScored,"sec":$secs7,"cpus":$cpus}""")
      // Fuzzy decontamination (round 10): the same genuinely FIXED
      // 100-doc benchmark at every probe size — bands + signatures
      // broadcast, so the corpus side should scale like one signature
      // pass, never a self-join
      val t8 = System.nanoTime()
      val fuzzyFlagged = graft.ext.TextPipeline.contaminatedIdsFuzzy(
        docs, "doc_id", "text",
        docs.where(col("doc_id") < 100)
          .select(col("doc_id").as("bench_id"), col("text").as("bench_text")),
        "bench_id", "bench_text",
        minJaccard = 0.5, numHashes = 64, shingleSize = 1)
        .queryExecution.toRdd.count()
      val secs8 = (System.nanoTime() - t8) / 1e9
      println(s"""{"metric":"fuzzy_decon_realistic","n_docs":$n,""" +
        s""""flagged":$fuzzyFlagged,"sec":$secs8,"cpus":$cpus}""")
      // Hashed-n-gram classifier (round 10): two gram explodes (train,
      // score) + a ≤4096-row broadcast model — linear in tokens
      val t9 = System.nanoTime()
      val classified = graft.ext.TextAnalysis.hashedNgramClassifier(
        docs, "doc_id", "text", col("doc_id") % 5 === 0)
        .queryExecution.toRdd.count()
      val secs9 = (System.nanoTime() - t9) / 1e9
      println(s"""{"metric":"classifier_realistic","n_docs":$n,""" +
        s""""classified":$classified,"sec":$secs9,"cpus":$cpus}""")
      // FFD bin packing (round 10): per-shard O(d log d) greedy over
      // 256 md5 shards + broadcast prefix-sum globalization
      val t10 = System.nanoTime()
      val packed = graft.ext.Sampling.packBinsFFD(
        docs.select(col("doc_id"),
          graft.ext.TextAnalysis.tokenCount(col("text")).cast("long").as("__n")),
        "doc_id", "__n", seqLen = 512L)
        .queryExecution.toRdd.count()
      val secs10 = (System.nanoTime() - t10) / 1e9
      println(s"""{"metric":"ffd_pack_realistic","n_docs":$n,""" +
        s""""packed":$packed,"sec":$secs10,"cpus":$cpus}""")
      // Exact shared-substring detection (round 15): the window table
      // is |text| rows/doc at mod 1 — the probe runs the mod-8
      // SCREENING configuration production would, plus mod 1 once at
      // the smallest size to show the exact-pass cost multiple
      for (m <- if (n == sizes.min) Seq(1, 8) else Seq(8)) {
        val t11 = System.nanoTime()
        val flaggedSpans = Dedup.sharedCharSpans(docs, "doc_id", "text",
            k = 40, sampleMod = m)
          .where(col("n_shared") >= 1)
          .queryExecution.toRdd.count()
        val secs11 = (System.nanoTime() - t11) / 1e9
        println(s"""{"metric":"char_span_realistic","n_docs":$n,""" +
          s""""sample_mod":$m,"flagged":$flaggedSpans,"sec":$secs11,"cpus":$cpus}""")
      }
    }
    spark.stop()
  }
}
