package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic realistic-profile corpus generator for benchmarking
  * the text-dedup operators on a NON-degenerate fixture.
  *
  * The driver's synthetic `documents` table draws every word from a
  * ~50-word shared vocabulary, so ~75% of ALL doc pairs are genuine
  * near-duplicates — the q28/q39 bench numbers on it mostly measure
  * emitting ~5M true pairs (BENCH_NOTES.md). This generator produces
  * the profile a real training corpus has: a 10k-word content
  * vocabulary under a Zipf-ish draw (`u²` biases toward low indices),
  * ~1/3 English stopwords (which is also what lets the docs pass the
  * clean-corpus language gate), 30–150-word docs, and a planted ~8%
  * near-dup rate — each dup copies a non-dup source doc in its block
  * and mutates ~1% of words, so some dups stay byte-identical (caught
  * by exact dedup) and the rest sit just under Jaccard 1.0 (caught by
  * MinHash at j≥0.9 even on trigram shingles).
  *
  * Everything is keyed off (seed, doc id): the same inputs produce the
  * byte-identical corpus on any partitioning or cluster size, so bench
  * runs are reproducible without materializing the fixture.
  */
object SyntheticCorpus {

  /** splitmix64 finalizer — a cheap, well-mixed non-negative hash. */
  private def splitmix(v: Long): Long = {
    var x = v + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    (x ^ (x >>> 31)) & Long.MaxValue
  }

  private val stop = Array(
    "the", "of", "and", "to", "a", "in", "is", "it", "that", "for",
    "was", "on", "are", "as", "with", "his", "they", "at", "be", "this")

  /** Held-out per-language function-word pools (30 entries each) that
    * the lang-weighted generator salts from. Deliberately WIDER than
    * [[LangId.stopwords]] (each classifier list is a 10-word subset,
    * asserted in SyntheticCorpusSpec): a generator that salts exactly
    * the classifier's feature list makes any recall floor near-
    * tautological — the classifier must generalize from 1/3 of the
    * planted signal here, and the genuine cross-language overlaps
    * (es/fr share de/la/que/le/un/les) put real mass off the diagonal.
    * Words are the standard high-frequency function words of each
    * language; zh is a character pool (the classifier scores distinct
    * contained characters — it is unsegmented).
    */
  val lexicon: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that",
      "for", "was", "on", "are", "as", "with", "his", "they", "at", "be",
      "this", "have", "from", "or", "had", "by", "but", "not", "what",
      "all", "were"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se", "del",
      "las", "un", "una", "por", "con", "no", "para", "es", "al", "lo",
      "como", "mas", "pero", "sus", "le", "ya", "o", "este", "si",
      "porque", "les"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu",
      "den", "mit", "von", "sie", "auf", "fur", "auch", "es", "an",
      "werden", "aus", "er", "hat", "dass", "nach", "wird", "bei",
      "einer", "um", "am", "sind", "oder"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que",
      "pour", "dans", "en", "du", "des", "il", "qui", "ne", "sur", "se",
      "pas", "plus", "par", "avec", "son", "au", "ce", "cette", "mais",
      "ou", "si"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "人", "这", "不",
      "一", "大", "中", "上", "们", "来", "到", "时", "地", "为",
      "子", "说", "生", "国", "年", "着", "就", "那", "要", "出"))

  /** Generate the corpus. `langWeights` empty (the default) keeps the
    * round-7 byte-identical English-only corpus (every row labeled
    * `lang = "en"`, stopwords from a fixed 20-word list). A non-empty
    * weighting, e.g. `Seq("en" -> 40, "es" -> 20, ...)`, assigns each
    * SOURCE doc a language by a deterministic weighted draw and salts
    * its stopword mass from the HELD-OUT [[lexicon]] for that language
    * (30 function words of which the classifier's [[LangId.stopwords]]
    * are a 10-word subset) — dups inherit their source's language
    * (their text IS the source's text), so the `lang` column stays a
    * true label through the planted near-dup structure. This makes
    * lang-ID quality MEASURABLE on the generated corpus, and not
    * tautologically: the classifier sees only a third of the planted
    * function words, and the es/fr pool overlap puts genuine confusion
    * mass off the diagonal (unlike the driver's documents fixture,
    * whose `lang` label is independent of its text — COVERAGE.md).
    */
  def realistic(
      spark: SparkSession,
      nDocs: Long,
      vocab: Int = 10000,
      dupPct: Int = 8,
      seed: Long = 42L,
      langWeights: Seq[(String, Int)] = Nil): DataFrame = {
    import spark.implicits._
    require(langWeights.forall { case (l, w) =>
      lexicon.contains(l) && w > 0 },
      s"langWeights must name lexicon languages with positive weights: $langWeights")
    val weights = langWeights // stable local for the closure
    val totalW = weights.map(_._2).sum
    spark.range(nDocs).mapPartitions { ids =>
      ids.map { boxed =>
        val id: Long = boxed
        // Ids with block offset < dupPct duplicate a NON-dup id (offset
        // ≥ dupPct) of the same 100-id block — never another dup, whose
        // actual text differs from its base-seed text (a dup-of-dup
        // would be a near-dup of nothing). Several dups picking the
        // same source form a dup CLUSTER, as real corpora have.
        val block = (id / 100) * 100
        val srcOffset = dupPct + (splitmix(seed ^ id) % (100 - dupPct))
        val isDup = id % 100 < dupPct && block + srcOffset < nDocs
        val srcId = if (isDup) block + srcOffset else id
        // Language keyed off srcId so a dup's label matches its text
        val (lang, stopPool) =
          if (weights.isEmpty) ("en", stop)
          else {
            var roll = (splitmix(seed ^ (srcId * 0xA24BAED4963EE407L)) % totalW).toInt
            val picked = weights.find { case (_, w) =>
              roll -= w; roll < 0 }.get._1
            (picked, lexicon(picked).toArray)
          }
        val rnd = new scala.util.Random(seed ^ (srcId * 0x9E3779B97F4A7C15L))
        val len = 30 + rnd.nextInt(121)
        val words = Array.fill(len) {
          if (rnd.nextInt(100) < 35) stopPool(rnd.nextInt(stopPool.length))
          else {
            val u = rnd.nextDouble()
            "w" + (u * u * vocab).toInt
          }
        }
        if (isDup) {
          val mut = new scala.util.Random(seed ^ (id * 0xC2B2AE3D27D4EB4FL))
          var i = 0
          while (i < words.length) {
            if (mut.nextInt(100) == 0) words(i) = "w" + mut.nextInt(vocab)
            i += 1
          }
        }
        (id, words.mkString(" "), lang)
      }
    }.toDF("doc_id", "text", "lang")
  }
}
