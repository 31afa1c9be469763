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

  /** Clean `df` down to deduplicated, quality-gated, language-filtered
    * rows with a `split` column. Keeps all input columns.
    */
  def cleanCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      config: Config = Config()): DataFrame = {
    val gated = df
      .where(TextAnalysis.qualityScore(col(textCol)) >= config.minQuality)
      .where(LangId.langId(col(textCol)).isin(config.langs: _*))
    val exactDeduped = Dedup.exact(
      gated.withColumn("__fp", TextAnalysis.fingerprintMd5(col(textCol))),
      on = Seq("__fp"), tieBreak = idCol).drop("__fp")
    val nearDeduped = Dedup.minhashDedupApply(
      exactDeduped, idCol, textCol,
      config.nearDupJaccard, config.numHashes, config.bands, config.shingleSize)
    Sampling.contentSplit(nearDeduped, textCol)
  }
}
