package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Content-defined chunking (gear-hash CDC) — split a byte stream at
  * positions the CONTENT chooses, so that inserting or deleting bytes
  * near the front only perturbs the chunks that contain the edit: every
  * boundary after the edit re-synchronizes, and the downstream chunks
  * hash identically. Fixed-width windows lose that property entirely
  * (one inserted byte shifts every later window), which is why
  * storage dedup and incremental-crawl near-dedup chunk by content.
  * The FastCDC-family gear hash drives the boundary test: a rolling
  * `h = (h << 1) + gear(byte)` over a 256-entry random table, with a
  * boundary declared when `h & mask == 0` (mask with `maskBits` ones →
  * expected chunk length `2^maskBits` past the minimum), subject to
  * hard `minSize`/`maxSize` bounds. The gear table derives from
  * SplitMix64 so the operator is deterministic across JVMs and
  * documented enough to re-implement externally.
  *
  * Chunk hashes are md5 over the chunk bytes — cross-document
  * duplicate detection is then an exact group-by on (hash, len),
  * with no false positives at corpus scale beyond md5 collision odds.
  *
  * Shape at scale: per-document linear CPU inside a typed flatMap (the
  * [[Warc]]/[[Multimodal]] codec class — the payload bytes never
  * shuffle; only the emitted (id, idx, offset, len, hash) rows do, and
  * they are ~64 bytes each regardless of chunk size). Dedup over the
  * emitted chunk table is one hash aggregation on the md5 key.
  */
object Cdc {

  /** One emitted chunk: `offset`/`len` locate it in the source bytes;
    * `chunk_md5` is the dedup key.
    */
  final case class Chunk(
      id: Long, chunk_idx: Int, offset: Int, len: Int, chunk_md5: String)

  /** SplitMix64-derived gear table (seed fixed): public construction,
    * deterministic everywhere.
    */
  private[ext] val Gear: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** Boundary positions (exclusive chunk ends) of `bytes` under the
    * gear rule — shared by [[chunkBytes]] and the spec's reference.
    * The hash is NOT reset across a declared boundary's window ramp-up:
    * it re-synchronizes within 64 bytes regardless (the `<< 1` ages a
    * byte out of the hash after 64 shifts), which is what makes
    * boundaries content-local.
    */
  private[ext] def boundaries(
      bytes: Array[Byte], minSize: Int, maskBits: Int, maxSize: Int): Seq[Int] = {
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize) {
        out += i + 1
        start = i + 1
      }
      i += 1
    }
    if (start < bytes.length) out += bytes.length
    out.toSeq
  }

  private[ext] def chunkBytes(
      id: Long, bytes: Array[Byte],
      minSize: Int, maskBits: Int, maxSize: Int): Seq[Chunk] = {
    val ends = boundaries(bytes, minSize, maskBits, maxSize)
    var start = 0
    ends.zipWithIndex.map { case (end, idx) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(bytes, start, end - start)
      val hex = md.digest().map("%02x".format(_)).mkString
      val c = Chunk(id, idx, start, end - start, hex)
      start = end
      c
    }
  }

  /** CDC chunks of a string column's UTF-8 bytes: one row per chunk.
    * Empty/null text emits no rows (a document with no bytes has no
    * chunks — join back on id to see absences); rows whose id is null
    * or not castable to long are likewise dropped.
    */
  def chunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minSize: Int = 64,
      maskBits: Int = 6,
      maxSize: Int = 1024): Dataset[Chunk] = {
    require(minSize >= 1, s"minSize must be >= 1, got $minSize")
    require(maxSize >= minSize, s"maxSize ($maxSize) must be >= minSize ($minSize)")
    require(maskBits >= 1 && maskBits <= 48,
      s"maskBits must be in [1, 48], got $maskBits")
    val s = df.sparkSession
    import s.implicits._
    df.select(col(idCol).try_cast("long"), col(textCol))
      // a null id (null input, or a non-numeric string — try_cast
      // yields null where ANSI cast would throw) would NPE in the
      // typed decode below — drop it beside the null-text rows
      .where(col(idCol).try_cast("long").isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        chunkBytes(id, text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          minSize, maskBits, maxSize)
      }
  }

  /** Per-document delta between two versions of the same text (the
    * re-crawl diff at chunk granularity): chunk BOTH versions, then
    * count the bytes of the new version lying in chunks the old
    * version also has — multiset semantics, `Σ len · min(countOld,
    * countNew)` over (md5, len) — alongside the SAME statistic at a
    * fixed window width. On an edit that shifts content (the common
    * case: an inserted ad, a changed header), CDC re-synchronizes and
    * reports the unchanged tail as unchanged, while fixed windows all
    * shift and report near-zero reuse; the two columns side by side
    * are the operator's value proposition as data. Fixed windows reuse
    * [[chunkBytes]] with `min = max = width` (max forces every
    * boundary).
    *
    * Shape at scale: both chunkings are per-row linear CPU in one
    * typed flatMap; the multiset intersection is a (id, hash, len)
    * hash aggregation and one equi-join per statistic — no all-pairs,
    * no window, payload bytes never shuffle.
    */
  def deltaStats(
      df: DataFrame,
      idCol: String,
      oldCol: String,
      newCol: String,
      minSize: Int = 64,
      maskBits: Int = 6,
      maxSize: Int = 1024,
      fixedWidth: Int = 128): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    require(fixedWidth >= 1, s"fixedWidth must be >= 1, got $fixedWidth")
    val pairs = df
      .select(col(idCol).cast("long"),
        coalesce(col(oldCol), lit("")), coalesce(col(newCol), lit("")))
      .as[(Long, String, String)]
    // one flatMap emits both sides under both chunkings: (id, scheme,
    // side, md5, len) — side 0 = old, 1 = new
    val ch = pairs.flatMap { case (id, oldT, newT) =>
      val ob = oldT.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val nb = newT.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      def emit(scheme: String, bs: Array[Byte], side: Int, mn: Int, bits: Int, mx: Int) =
        chunkBytes(id, bs, mn, bits, mx)
          .map(c => (id, scheme, side, c.chunk_md5, c.len))
      emit("cdc", ob, 0, minSize, maskBits, maxSize) ++
        emit("cdc", nb, 1, minSize, maskBits, maxSize) ++
        emit("fixed", ob, 0, fixedWidth, 1, fixedWidth) ++
        emit("fixed", nb, 1, fixedWidth, 1, fixedWidth)
    }.toDF(idCol, "__scheme", "__side", "__md5", "__len")
    val counts = ch.groupBy(col(idCol), col("__scheme"), col("__md5"), col("__len"))
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cb"))
    val perScheme = counts.groupBy(col(idCol), col("__scheme"))
      .agg(
        sum(col("__len") * col("__cb")).as("__newBytes"),
        sum(col("__len") * least(col("__ca"), col("__cb"))).as("__shared"))
      .withColumn("__frac",
        when(col("__newBytes") > 0,
          round(col("__shared").cast("double") / col("__newBytes"), 6))
          .otherwise(lit(1.0)))
    perScheme.groupBy(col(idCol))
      .agg(
        max(when(col("__scheme") === "cdc", col("__newBytes"))).as("new_bytes"),
        max(when(col("__scheme") === "cdc", col("__frac"))).as("cdc_shared_frac"),
        max(when(col("__scheme") === "fixed", col("__frac"))).as("fixed_shared_frac"))
  }

  /** Cross-document chunk-dedup rollup: per document, its chunk count,
    * total bytes, and the fraction of its BYTES lying in chunks whose
    * (md5, len) also occurs in at least one OTHER document — the
    * CDC analogue of [[TextAnalysis.crossDocDupFraction]], but robust
    * to shifted boilerplate (a fixed-window version misses a footer
    * that moved by one byte; CDC re-synchronizes on it).
    *
    * Shape at scale: the chunk table is pinned once; the per-chunk
    * distinct-document count is one hash aggregation joined back on the
    * md5 key (broadcast-to-sort-merge by size, AQE's call) — the join
    * form deliberately, not a window, for the same hot-gram reason as
    * crossDocDupFraction.
    */
  def crossDocChunkStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minSize: Int = 64,
      maskBits: Int = 6,
      maxSize: Int = 1024): DataFrame = {
    val ch = chunks(df, idCol, textCol, minSize, maskBits, maxSize)
      .toDF().localCheckpoint()
    val docsPerChunk = ch.groupBy(col("chunk_md5"), col("len"))
      .agg(countDistinct(col("id")).as("__ndocs"))
    ch.join(docsPerChunk, Seq("chunk_md5", "len"))
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("len")).as("n_bytes"),
        round(sum(when(col("__ndocs") >= 2, col("len")).otherwise(0L))
          .cast("double") / sum(col("len")), 6).as("shared_byte_frac"))
  }
}
