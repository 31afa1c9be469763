package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline — the operators of this
  * package working together the way a 100 TB corpus prep job would run
  * them, cheapest filter first so each stage shrinks the next stage's
  * input:
  *
  *  1. quality gate (pure codegen scalar — runs in the scan projection),
  *  2. language filter (scalar),
  *  3. exact dedup on the normalized-content fingerprint (one hash agg),
  *  4. near-dup dedup via MinHash/LSH clusters (banded, no O(n²)),
  *  5. deterministic train/val/test split (scalar).
  */
object TextPipeline {

  /** `bands = 0` (the default) derives the LSH banding from
    * `nearDupJaccard` via [[Dedup.bandsFor]] — a fixed banding run at a
    * mismatched threshold floods the verify stage with false candidates.
    */
  final case class Config(
      minQuality: Double = 0.2,
      langs: Seq[String] = Seq("en"),
      nearDupJaccard: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 0,
      shingleSize: Int = 3)

  /** Stages 1-3 (shared by both pipeline variants): quality gate,
    * language filter, exact dedup on the normalized-content fingerprint.
    */
  private def gateAndExactDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      config: Config): DataFrame = {
    val gated = df
      .where(TextAnalysis.qualityScore(col(textCol)) >= config.minQuality)
      .where(LangId.langId(col(textCol)).isin(config.langs: _*))
    // Pin the result: BOTH pipeline variants consume it at least twice
    // (signature/pair generation AND the final representative semi
    // join) — left lazy, the quality/lang regexp scalars and the dedup
    // window re-run per consumer (measured ~6 s of q39's 14 s at
    // sf0.1), the same recompute trap the signature paths checkpoint
    // against.
    Dedup.exact(
      gated.withColumn("__fp", TextAnalysis.fingerprintMd5(col(textCol))),
      on = Seq("__fp"), tieBreak = idCol).drop("__fp").localCheckpoint()
  }

  /** Clean `df` down to deduplicated, quality-gated, language-filtered
    * rows with a `split` column. Keeps all input columns.
    */
  def cleanCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      config: Config = Config()): DataFrame = {
    val nearDeduped = Dedup.minhashDedupApply(
      gateAndExactDedup(df, idCol, textCol, config), idCol, textCol,
      config.nearDupJaccard, config.numHashes, config.bands, config.shingleSize)
    Sampling.contentSplit(nearDeduped, textCol)
  }

  /** Oracle-checkable twin of [[cleanCorpus]]: the near-dup stage runs
    * EXACT word n-gram Jaccard (inverted-index join, [[Dedup
    * .ngramJaccardPairs]] with the hot-shingle guard off) + connected
    * components instead of MinHash/LSH, so every stage is expressible
    * in ANSI SQL and the composed pipeline can be verified end-to-end
    * against an independent engine. Same stages and outputs modulo the
    * similarity estimator; at scale prefer [[cleanCorpus]] — MinHash
    * bounds the per-pair work at `numHashes` components, where the
    * exact index is the right choice up to mid-size corpora or as the
    * correctness twin of the MinHash run.
    */
  def cleanCorpusExact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      config: Config = Config()): DataFrame = {
    val exactDeduped = gateAndExactDedup(df, idCol, textCol, config)
    val pairs = Dedup.ngramJaccardPairs(exactDeduped, idCol, textCol,
      n = config.shingleSize, minJaccard = config.nearDupJaccard, maxDocFreq = 0L)
    val comp = Dedup.connectedComponents(
      exactDeduped.select(col(idCol).as("id")), pairs)
    val reps = comp.where(col("id") === col("component")).select("id")
    val nearDeduped = exactDeduped.join(
      reps.withColumnRenamed("id", idCol), Seq(idCol), "left_semi")
    Sampling.contentSplit(nearDeduped, textCol)
  }

  /** Ids of corpus documents sharing at least one word `n`-gram with
    * the benchmark set — the standard eval-set contamination test
    * (exact n-gram collision at n ≈ 8-13): one row per contaminated
    * id, with the number of distinct colliding n-grams as
    * `n_overlapping`.
    *
    * Shape at scale: the benchmark's distinct n-gram set is tiny next
    * to a training corpus (thousands of eval docs vs billions of
    * training docs), so Catalyst/AQE broadcasts it and the corpus side
    * is a single scan + explode with NO shuffle of document text; the
    * aggregation shuffles only (id, gram-hit) pairs. Sub-`n`-word
    * documents are their own single shingle ([[Dedup.wordShingles]]),
    * so a short doc is contaminated only by an exact normalized-text
    * match.
    */
  def contaminatedIds(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8): DataFrame = {
    val benchGrams = benchmark
      .select(explode(Dedup.wordShingles(col(benchTextCol), n)).as("__g"))
      .distinct()
    corpus
      .select(col(idCol), explode(Dedup.wordShingles(col(textCol), n)).as("__g"))
      .join(benchGrams, Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlapping"))
  }

  /** Drop corpus documents that share any word `n`-gram with the
    * benchmark set ([[contaminatedIds]]) — run AFTER dedup (fewer docs
    * to test) and BEFORE split, the standard ordering for training-
    * corpus preparation against eval leakage.
    */
  def decontaminate(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8): DataFrame =
    corpus.join(
      contaminatedIds(corpus, idCol, textCol, benchmark, benchTextCol, n)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Fuzzy (MinHash) eval-set contamination: corpus documents whose
    * estimated shingle-Jaccard against SOME benchmark document reaches
    * `minJaccard` — the paraphrase-robust complement of
    * [[contaminatedIds]]. Exact n-gram collision misses the
    * contamination mode that actually burned public evals: a benchmark
    * document lightly rephrased, re-wrapped, or punctuation-mangled
    * shares almost no 8-gram with its source but keeps most of its
    * shingle set; set-similarity at a loose threshold catches it.
    * (Technique per the published dedup/decontamination literature —
    * Lee et al. 2022 "Deduplicating Training Data Makes Language
    * Models Better"; the GPT-3 paper's appendix-C n-gram overlap
    * decontamination is [[contaminatedIds]], this is its fuzzy
    * extension.)
    *
    * Returns one row per contaminated corpus id: `n_bench_matches`
    * (how many benchmark docs it collides with at the threshold) and
    * `max_est_jaccard` (strongest match, rounded to 6 like every float
    * ratio here).
    *
    * Shape at scale: [[Dedup.crossPairsFromSigs]] — the benchmark's
    * banded form and signatures broadcast (eval sets are 10³–10⁵ docs
    * vs billions of training docs); corpus text and signatures never
    * shuffle, and there is no corpus self-join anywhere. The corpus
    * signature pass is the same one a MinHash dedup run already pays —
    * in a real pipeline compute [[Dedup.minhashSignatures]] once and
    * feed both.
    */
  def contaminatedIdsFuzzy(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      minJaccard: Double = 0.25,
      numHashes: Int = 128,
      bands: Int = 0,
      shingleSize: Int = 3): DataFrame = {
    val corpusSigs = Dedup.minhashSignatures(
      corpus, idCol, textCol, numHashes, shingleSize)
    val benchSigs = Dedup.minhashSignatures(
      benchmark, benchIdCol, benchTextCol, numHashes, shingleSize)
    Dedup.crossPairsFromSigs(corpusSigs, benchSigs, minJaccard, numHashes, bands)
      .groupBy(col("id_a").as(idCol))
      .agg(
        count(lit(1)).as("n_bench_matches"),
        round(max(col("est_jaccard")), 6).as("max_est_jaccard"))
  }

  /** Drop corpus documents fuzzy-matching the benchmark set
    * ([[contaminatedIdsFuzzy]]) — same pipeline position as
    * [[decontaminate]] (after dedup, before split); run BOTH in a real
    * prep job: exact n-gram catches short verbatim quotes a loose
    * Jaccard threshold misses, fuzzy catches paraphrases exact n-grams
    * miss.
    */
  def decontaminateFuzzy(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      minJaccard: Double = 0.25,
      numHashes: Int = 128,
      bands: Int = 0,
      shingleSize: Int = 3): DataFrame =
    corpus.join(
      contaminatedIdsFuzzy(corpus, idCol, textCol, benchmark, benchIdCol,
          benchTextCol, minJaccard, numHashes, bands, shingleSize)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Drop documents that cite any blocklisted URL domain — the
    * provenance gate (spam/SEO/adult domain lists) that runs alongside
    * the quality gate in a crawl-curation pipeline. For a bounded
    * blocklist (the common case: curated lists are 10³–10⁶ entries)
    * the test is a literal `array_intersect` over
    * [[TextAnalysis.urlHostnames]] — a pure codegen scan predicate,
    * NO shuffle and NO join anywhere in the plan, so it pushes to the
    * same scan as every other gate. (A blocklist too large for a
    * literal becomes a broadcast anti-join on the exploded hostnames;
    * same I/O class, one extra exchange.)
    */
  def filterByDomains(
      df: DataFrame,
      textCol: String,
      blockedDomains: Seq[String]): DataFrame =
    // null text cites no domain — keep it (the gate drops only rows
    // that POSITIVELY cite a blocked host; an unguarded size(...)===0
    // is null on null text and would silently drop the row)
    df.where(col(textCol).isNull || size(array_intersect(
      TextAnalysis.urlHostnames(col(textCol)),
      // Locale.ROOT: a default-locale lowercase turns "BIT.LY" into
      // "bıt.ly" on tr/az JVMs and the gate silently stops matching
      typedLit(blockedDomains.map(_.toLowerCase(java.util.Locale.ROOT))))) === 0)

  /** Incremental-crawl admission: pass only stream documents whose
    * normalized-content fingerprint is ABSENT from the previous
    * snapshot — the streaming complement of [[Dedup.crawlDiff]]
    * (`added` + `changed` flow through; re-crawled bytes and
    * formatting-only edits drop at the gate, before any downstream
    * re-embedding/re-scoring pays for them).
    *
    * Shape at scale: a stream-static LEFT ANTI join (stateless — legal
    * in any streaming plan; the static side re-resolves per
    * micro-batch, so a snapshot refresh is picked up on the next
    * trigger). Null-text rows (failed fetches) carry no content and
    * are dropped before the join — a null fingerprint never matches an
    * anti-join key and would otherwise be admitted unconditionally.
    * The static side is pruned to a DISTINCT 32-hex
    * fingerprint column before the join; for snapshots too large to
    * join comfortably, swap the anti-join for a Bloom-filter prefilter
    * built from the same fingerprints (false positives re-admit a few
    * known docs, which the downstream exact dedup removes anyway).
    */
  def ingestNewOnly(
      stream: DataFrame,
      textCol: String,
      previousCorpus: DataFrame,
      prevTextCol: String): DataFrame = {
    val known = previousCorpus
      .select(TextAnalysis.fingerprintMd5(col(prevTextCol)).as("__fp"))
      .distinct()
    stream.where(col(textCol).isNotNull)
      .withColumn("__fp", TextAnalysis.fingerprintMd5(col(textCol)))
      .join(known, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Streaming corpus ingestion: the stateless prefix of [[cleanCorpus]]
    * (quality gate → language filter — both pure scan-projection
    * scalars, legal in any streaming plan) plus watermark-bounded exact
    * dedup on the content fingerprint ([[Dedup.streamingExact]]), with
    * the split label stamped on the survivors. Near-dup dedup stays in
    * the BATCH pipeline, run periodically over the ingested table — LSH
    * banding is a corpus-wide self-join, which streaming can't express
    * incrementally without unbounded state; the standard split is to
    * decide everything a single pass CAN decide at ingestion (gate,
    * language, exact dup, split) so the periodic near-dedup reads an
    * already-reduced table.
    */
  def cleanStream(
      df: DataFrame,
      textCol: String,
      eventTimeCol: String,
      config: Config = Config(),
      watermarkDelay: String = "10 minutes"): DataFrame =
    Sampling.contentSplit(
      Dedup.streamingExact(
        df.where(TextAnalysis.qualityScore(col(textCol)) >= config.minQuality)
          .where(LangId.langId(col(textCol)).isin(config.langs: _*))
          .withColumn("__fp", TextAnalysis.fingerprintMd5(col(textCol))),
        on = Seq("__fp"), eventTimeCol = eventTimeCol, delay = watermarkDelay),
      textCol).drop("__fp")
}
