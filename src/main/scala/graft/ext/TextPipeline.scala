package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
    * `htmlInput = true` prepends [[extractText]] (boilerplate removal)
    * to the pipeline, so a raw-crawl HTML column flows through the same
    * gates as clean text. `repairEncoding = true` prepends
    * [[repairText]] (mojibake + control-char repair) before even that —
    * encoding debris must be fixed before tag parsing or any gate reads
    * the text.
    */
  final case class Config(
      minQuality: Double = 0.2,
      langs: Seq[String] = Seq("en"),
      nearDupJaccard: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 0,
      shingleSize: Int = 3,
      htmlInput: Boolean = false,
      repairEncoding: Boolean = false,
      // Signature lanes for the MinHash stage: Xxhash64 for production
      // throughput, Md5 when an external engine must replay the exact
      // signatures (the q28/q48 verify-lane convention).
      sigMode: Dedup.SigMode = Dedup.SigMode.Xxhash64)

  // -------------------------------------------------------------------
  // HTML → text extraction (boilerplate removal) — the first operator a
  // crawl pipeline runs: every other text operator here assumes clean
  // text already exists. Trafilatura/jusText-shape heuristics spelled
  // as chained codegen regexp passes + the line-explode machinery — no
  // UDF, no HOF — and every regex avoids lookaround/backreferences so
  // the SAME pattern strings run under RE2 (the q50 redaction
  // convention): the driver oracle executes the chain verbatim.
  // -------------------------------------------------------------------

  /** Tags that delimit block-level structure: replaced by newlines so
    * the line gate sees one candidate text block per line. Covers the
    * document skeleton (html/head/body/title/meta/link) too — head
    * content must not glue onto body text.
    */
  private val BlockTagAlternation: String =
    "html|head|body|title|meta|link|p|div|br|li|ul|ol|h[1-6]|tr|td|th|" +
      "table|thead|tbody|section|article|header|footer|nav|aside|" +
      "blockquote|pre|form|hr"

  /** Structural pass: comments and script/style blocks removed, every
    * block-level tag replaced by a newline. Inline tags (`<a>`, `<b>`,
    * `<span>`, …) survive into the per-line gate, which needs them for
    * link density. Four chained codegen `regexp_replace` passes.
    */
  def htmlToLines(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    // two passes, not one alternation with a backreference: RE2 has no
    // backreferences, and `</(script|style)>` alone would let a stray
    // `</style>` close a `<script>` block
    val noScript =
      regexp_replace(noComments, "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style\\s*>", " ")
    regexp_replace(noStyle, s"(?i)</?(?:$BlockTagAlternation)\\b[^>]*>", "\n")
  }

  /** One text line from one HTML line: remaining (inline) tags dropped,
    * the six dominant entities decoded (specific entities BEFORE
    * `&amp;` — decoding `&amp;` first would turn `&amp;lt;`, an escaped
    * literal "&lt;", into a real `<`), whitespace collapsed and
    * trimmed. Plain-string `replace` + two regexps, all codegen.
    */
  def stripTags(line: Column): Column = {
    val noTags = regexp_replace(line, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Extract article text from raw HTML — strip script/style/comments,
    * break at block tags, then keep only lines that read like content:
    * at least `minWords` words AND at most `maxLinksPerWord` `<a>` tags
    * per word (navigation/share/footer chrome is link-dense and
    * word-poor — the jusText/trafilatura link-density gate, spelled on
    * links-per-word since inline tags are still visible per line).
    *
    * Output: one row per non-null-html input row — `(id,
    * n_lines_kept, extracted)`, surviving lines joined by newline in
    * document order. A document whose EVERY line is boilerplate yields
    * `n_lines_kept = 0` and an empty string, not a missing row (the
    * scored-at-bias convention: a downstream join must see "extracted
    * to nothing", not "never extracted").
    *
    * Shape at scale: one explode of the line stream, per-line gates in
    * the codegen projection (regexp count + word count — no shuffle),
    * reassembly as ONE hash aggregation keyed by id (`sort_array` of
    * (pos, line) structs in-row, field-extracted without a lambda), and
    * a final equi-join on id. No window, no global sort; the widest
    * stream is the kept-line set.
    */
  def extractText(
      df: DataFrame,
      idCol: String,
      htmlCol: String,
      minWords: Int = 3,
      maxLinksPerWord: Double = 0.34): DataFrame = {
    // spread before the tag-strip regexp chain — the per-row heavy
    // pass, otherwise single-task over a single-row-group fixture scan
    // (r21 parallelism repair, [[Par.spread]])
    val base = Par.spread(
      df.where(col(htmlCol).isNotNull).select(col(idCol), col(htmlCol)),
      col(idCol))
    val lines = base
      .select(col(idCol),
        posexplode(split(htmlToLines(col(htmlCol)), "\n")).as(Seq("__p", "__l")))
      .select(col(idCol), col("__p"),
        stripTags(col("__l")).as("__t"),
        regexp_count(col("__l"), lit("(?i)<a[\\s>]")).as("__nl"))
      .where(col("__t") =!= "")
      .withColumn("__w", size(split(col("__t"), " ")))
      .where(col("__w") >= minWords &&
        col("__nl").cast("double") <= col("__w").cast("double") * maxLinksPerWord)
    val kept = lines.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines_kept"),
        array_join(
          sort_array(collect_list(struct(col("__p"), col("__t"))))
            .getField("__t"),
          "\n").as("extracted"))
    base.select(col(idCol))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("extracted"), lit("")).as("extracted"))
  }

  // -------------------------------------------------------------------
  // Encoding repair — crawl text is full of mojibake (UTF-8 bytes
  // mis-decoded through Windows-1252 somewhere upstream) and control-
  // character debris. The repair is a FIXED substitution table (the
  // high-frequency core of what ftfy fixes) + a C0/C1 control strip:
  // pure codegen `replace`/`regexp_replace` chains, so the driver
  // oracle can run the identical chain (the q50/q94 convention) and a
  // 100 TB pass stays in the scan projection with no shuffle.
  // -------------------------------------------------------------------

  /** `(mojibake, repaired)` pairs: each repaired character's UTF-8
    * bytes as they render when mis-decoded as Windows-1252 (bytes
    * 0x80–0x9F → cp1252 punctuation; 0xA0–0xFF → the Latin-1-identical
    * range; 0x9D, undefined in cp1252, passes through as U+009D).
    * Ordering matters twice: the en/em-dash sequences run BEFORE the
    * curly quotes whose REPAIRED output (U+201C/U+201D) is those
    * sequences' third character — otherwise a quote repair could
    * manufacture a dash pattern mid-chain — and three-char punctuation
    * runs before two-char accented letters (disjoint lead bytes, but
    * longest-first is the defensive default). Single pass by design:
    * double-encoded mojibake (repair output that is itself mojibake)
    * needs iterated application, which [[repairText]] deliberately
    * does not do — one pass is what the SQL twin can express, and
    * double encoding is rare enough to land in the residue metrics.
    */
  val MojibakeTable: Seq[(String, String)] = Seq(
    "â€“" -> "–", // en dash   (e2 80 93)
    "â€”" -> "—", // em dash   (e2 80 94)
    "â€™" -> "’", // right single quote (e2 80 99)
    "â€˜" -> "‘", // left single quote  (e2 80 98)
    "â€œ" -> "“", // left double quote  (e2 80 9c)
    "â€" -> "”", // right double quote (e2 80 9d)
    "â€¦" -> "…", // ellipsis  (e2 80 a6)
    "â€¢" -> "•", // bullet    (e2 80 a2)
    "â‚¬" -> "€", // euro sign (e2 82 ac)
    "Ã " -> "à", // a grave
    "Ã¡" -> "á", // a acute
    "Ã¤" -> "ä", // a umlaut
    "Ã§" -> "ç", // c cedilla
    "Ã¨" -> "è", // e grave
    "Ã©" -> "é", // e acute
    "Ãª" -> "ê", // e circumflex
    "Ã­" -> "í", // i acute
    "Ã±" -> "ñ", // n tilde
    "Ã³" -> "ó", // o acute
    "Ã¶" -> "ö", // o umlaut
    "Ãº" -> "ú", // u acute
    "Ã¼" -> "ü", // u umlaut
    "Â " -> " ") // no-break space (c2 a0) -> real U+00A0, not ASCII
  //     space: "A-circumflex" + plain space can be legitimate text; the
  //     repaired char stays NBSP (strip/normalize separately)

  /** Alternation of every mojibake sequence (all literal characters —
    * no regex metachars in the table), for counting residue before
    * repair.
    */
  val MojibakePattern: String = MojibakeTable.map(_._1).mkString("|")

  /** C0 controls except tab/newline/CR, DEL, and the C1 block — the
    * debris left by encoding round-trips (RE2-safe class, the q50
    * convention).
    */
  val ControlPattern: String = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]"

  /** One `replace` pass per table entry, in table order. */
  def repairMojibake(c: Column): Column =
    MojibakeTable.foldLeft(c) { case (acc, (m, r)) => replace(acc, lit(m), lit(r)) }

  /** Strip control debris — run AFTER [[repairMojibake]]: the U+009D
    * inside the right-double-quote sequence is itself a C1 control, so
    * stripping first would destroy that pattern's third byte.
    */
  def stripControls(c: Column): Column =
    regexp_replace(c, ControlPattern, "")

  /** The composed repair: mojibake table, then control strip. */
  def repairText(c: Column): Column = stripControls(repairMojibake(c))

  /** Mojibake sequences present BEFORE repair (diagnostic column). */
  def mojibakeCount(c: Column): Column = regexp_count(c, lit(MojibakePattern))

  /** Control chars that survive mojibake repair (diagnostic column). */
  def controlCount(c: Column): Column =
    regexp_count(repairMojibake(c), lit(ControlPattern))

  /** Stages 1-3 (shared by both pipeline variants): quality gate,
    * language filter, exact dedup on the normalized-content fingerprint.
    */
  private def gateAndExactDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      config: Config): DataFrame = {
    // htmlInput: boilerplate removal FIRST — the quality/lang gates and
    // every fingerprint must see the article text, not the markup (a
    // nav-chrome-heavy page would otherwise fail quality on punctuation
    // soup, and two crawls of the same article with different chrome
    // would not exact-dedup). The join keeps all input columns with
    // textCol replaced by the extraction.
    val repaired =
      if (!config.repairEncoding) df
      else df.withColumn(textCol, repairText(col(textCol)))
    val input =
      if (!config.htmlInput) repaired
      else repaired.drop(textCol).join(
        extractText(repaired, idCol, textCol)
          .select(col(idCol), col("extracted").as(textCol)),
        Seq(idCol))
    val gated = input
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
      config.nearDupJaccard, config.numHashes, config.bands,
      config.shingleSize, config.sigMode)
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
      shingleSize: Int = 3,
      sigMode: Dedup.SigMode = Dedup.SigMode.Xxhash64): DataFrame = {
    val corpusSigs = Dedup.minhashSignatures(
      corpus, idCol, textCol, numHashes, shingleSize, sigMode)
    val benchSigs = Dedup.minhashSignatures(
      benchmark, benchIdCol, benchTextCol, numHashes, shingleSize, sigMode)
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

  /** Hostnames of every absolute or PROTOCOL-RELATIVE `href` attribute
    * in raw HTML, lowercased, in order of appearance. Two jobs: (1)
    * LINK provenance as its own coordinate — q99 separates "hosts this
    * page links to" from "hosts mentioned in running text"; (2) the
    * blocklist gap [[TextAnalysis.urlHostnames]] genuinely cannot
    * cover — a protocol-relative `href="//tracker.example/x"` (common
    * in real markup) contains no `http` prefix anywhere, so no
    * text-URL pattern can see it, while an absolute href URL is at
    * least caught as a raw-text substring. Same RE2-safe host grammar
    * as `urlHostnames` (userinfo skipped, port/path/query never leak
    * into the host); path-relative hrefs carry no host and extract
    * nothing. Pure codegen `regexp_extract_all` — a scan-projection
    * scalar.
    */
  def hrefHostnames(html: Column): Column =
    regexp_extract_all(lower(html),
      lit("href\\s*=\\s*[\"'](?:https?:)?//(?:[^/?#\"'\\s@]*@)?" +
        "([\\p{L}\\p{N}_-]+(?:\\.[\\p{L}\\p{N}_-]+)*)"), lit(1))

  /** `(doc_id, href, anchor)` triples from `<a href=…>…</a>` elements —
    * the raw anchor-text stream. Anchor-text corpora are a standard
    * pretraining signal (link text describes the TARGET page, written
    * by an independent author), and per-target anchor aggregation is
    * how a crawl turns its link graph into labels.
    *
    * One regex drives two `regexp_extract_all` calls (group 1 = href,
    * group 2 = inner markup) whose match lists are positionally
    * identical by construction, zipped and exploded in one generator.
    * `(?is)`: anchors spanning lines and any tag case. Inner markup is
    * flattened with [[stripTags]] (entities decoded, whitespace
    * collapsed). Quote handling matches [[hrefHostnames]]: either
    * quote style opens, the value runs to the next quote.
    *
    * Shape at scale: the whole extraction is a codegen scan projection
    * plus one explode — no join, no shuffle; downstream aggregation
    * ([[anchorTextSummary]]) owns the keyed exchanges.
    */
  def anchorPairs(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val re = "(?is)<a\\s[^>]*?href\\s*=\\s*[\"']([^\"']+)[\"'][^>]*>(.*?)</a\\s*>"
    // spread before the double regexp_extract_all pass (r21, [[Par.spread]])
    Par.spread(df.select(col(idCol), col(htmlCol)), col(idCol))
      .select(col(idCol).as("doc_id"),
        regexp_extract_all(col(htmlCol), lit(re), lit(1)).as("__h"),
        regexp_extract_all(col(htmlCol), lit(re), lit(2)).as("__t"))
      .select(col("doc_id"), explode(arrays_zip(col("__h"), col("__t"))).as("__z"))
      .select(col("doc_id"),
        col("__z.__h").as("href"),
        stripTags(col("__z.__t")).as("anchor"))
  }

  /** Per-target anchor-text rollup over the absolute http(s) links of
    * [[anchorPairs]]: targets keyed by [[Urls.canonicalUrl]] (aliasing
    * spellings — case, default ports, tracking params — merge into one
    * row), with total anchor count, distinct citing documents, and the
    * most frequent anchor spelling (ties break to the lexicographically
    * smallest, deterministic).
    *
    * Output: `(target, n_anchors, n_docs, top_anchor)`.
    *
    * Shape at scale: canonicalization is a scan projection; then two
    * hash aggregations keyed by target — (target, anchor) counts → the
    * struct-min argmax, and (target) totals with a distinct-doc count —
    * joined on target. Everything shuffles by the same key once; no
    * window over the link stream.
    */
  def anchorTextSummary(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val pairs = anchorPairs(df, idCol, htmlCol)
      .where(col("href").rlike("(?i)^https?://"))
      .select(col("doc_id"), Urls.canonicalUrl(col("href")).as("target"),
        col("anchor"))
      // feeds both aggregations — pin the explode + canonicalize pass
      .localCheckpoint()
    val top = pairs.groupBy(col("target"), col("anchor"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("target"))
      // min of (-count, anchor): highest count, ties to smallest text
      .agg(min(struct((-col("__c")).as("__nc"), col("anchor").as("__a")))
        .as("__top"))
      .select(col("target"), col("__top.__a").as("top_anchor"))
    pairs.groupBy(col("target"))
      .agg(count(lit(1)).as("n_anchors"),
        countDistinct(col("doc_id")).as("n_docs"))
      .join(top, Seq("target"))
  }

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
      blockedDomains: Seq[String],
      includeHrefs: Boolean = false): DataFrame = {
    // includeHrefs: for RAW-HTML columns, gate on href targets too —
    // the running-text URL pattern alone is blind to <a href="...">
    val hosts =
      if (includeHrefs)
        concat(TextAnalysis.urlHostnames(col(textCol)),
          hrefHostnames(col(textCol)))
      else TextAnalysis.urlHostnames(col(textCol))
    // null text cites no domain — keep it (the gate drops only rows
    // that POSITIVELY cite a blocked host; an unguarded size(...)===0
    // is null on null text and would silently drop the row)
    df.where(col(textCol).isNull || size(array_intersect(
      hosts,
      // Locale.ROOT: a default-locale lowercase turns "BIT.LY" into
      // "bıt.ly" on tr/az JVMs and the gate silently stops matching
      typedLit(blockedDomains.map(_.toLowerCase(java.util.Locale.ROOT))))) === 0)
  }

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
  /** Streaming FUZZY admission — the near-dup complement of
    * [[ingestNewOnly]]'s exact gate, wired through the persisted
    * MinHash index ([[Dedup.writeMinhashIndex]]): each micro-batch is
    * (1) near-deduped WITHIN itself ([[Dedup.minhashDedupApply]] — the
    * index gate alone would admit both halves of a dup pair arriving
    * together), (2) gated against the accumulated index
    * ([[Dedup.pairsAgainstMinhashIndex]] — a paraphrased re-crawl of
    * anything ever admitted drops here), (3) APPENDED to the index, and
    * (4) handed to `onBatch` (write to the corpus table, kick off
    * downstream scoring, …). The first batch bootstraps the index.
    *
    * The admitted rows are `localCheckpoint`-pinned BEFORE the index
    * append — left lazy, any consumer action after step (3) would
    * re-run the admission join against the just-appended signatures and
    * every admitted document would collide with itself and vanish.
    * Self-pairs (same id on both sides) are excluded from the gate, so
    * an at-least-once replay of a crashed batch re-admits its own
    * documents instead of silently dropping them against the
    * half-appended index; the replayed append leaves duplicate
    * signature rows, which only cost index bytes — admission semantics
    * are unchanged (same id, same bands). Exactly-once index hygiene,
    * if needed, is a periodic compaction (dedup sigs by id), not a
    * streaming concern.
    *
    * Shape at scale: per micro-batch, the batch side (a crawl slice,
    * small by construction — the incremental-admission asymmetry)
    * broadcasts against a linear index scan; the index never shuffles
    * and is never rewritten, only appended.
    */
  def admitStreamNearUnique(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      checkpointDir: String,
      minJaccard: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 0,
      shingleSize: Int = 3)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val metaPath = new org.apache.hadoop.fs.Path(s"$indexPath/meta.json")
        val fs = metaPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        val indexExists = fs.exists(metaPath)
        // pinned: the index gate consumes fresh twice (anti-join left
        // side AND its signature pass) — lazy, the within-batch dedup
        // re-runs per consumer every micro-batch (the fan-out lesson)
        val fresh = Dedup.minhashDedupApply(
          batch.where(col(textCol).isNotNull),
          idCol, textCol, minJaccard, numHashes, bands, shingleSize)
          .localCheckpoint()
        val admitted = (if (!indexExists) fresh
          else Dedup.admitNearUnique(fresh, idCol, textCol, indexPath,
            minJaccard, numHashes, bands, shingleSize)).localCheckpoint()
        if (!admitted.isEmpty)
          Dedup.writeMinhashIndex(admitted, idCol, textCol, indexPath,
            numHashes, shingleSize,
            mode = if (indexExists) "append" else "overwrite")
        onBatch(admitted, batchId)
      }
      .start()

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
