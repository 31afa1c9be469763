package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side contract is real and tested: schema, partitioning,
  * batch iteration shape, and metadata extraction all work end-to-end.
  * The actual media decoding is STUBBED — this container has no codec
  * libraries — behind [[MediaCodec.decodeBytes]], which produces a
  * deterministic fake so tests are reproducible. Swapping in a real
  * decoder changes one function, not the pipeline.
  *
  * At 100 TB the pattern holds: payloads stay columnar in parquet,
  * never pass through the driver, and decode work parallelizes by
  * input split; `spark.sql.files.maxPartitionBytes` bounds per-task
  * memory since each task holds at most one partition of payloads.
  */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video" | "blob"
      payload: Array[Byte])

  /** Extracted features for one media payload. `payload_fnv1a` is the
    * decoder-side FNV-1a hash — deliberately NOT named `content_hash`:
    * [[envelopeMeta]]'s `content_hash` is xxhash64 and the two are never
    * equal, so sharing a name would invite a silently-empty join.
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      payload_fnv1a: Long,
      width: Int, // fake-decoded dimensions (stub)
      height: Int,
      duration_ms: Long, // 0 for images
      feature: Seq[Float]) // tiny fake embedding of the payload

  /** Fake payload corpus from a text table — stands in for real media
    * bytes so the binary-column plumbing is exercised end-to-end.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Envelope metadata that needs no decode: byte size + content hash.
    * Pure column algebra — this part is NOT stubbed and is the fast path
    * for dedup/integrity sweeps over petabytes of media.
    */
  def envelopeMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      xxhash64(col("payload")).as("content_hash"),
      md5(col("payload")).as("content_md5"))

  /** Batched decode + feature extraction over the payload column.
    *
    * `mapPartitions` is deliberate: a real decoder amortizes codec
    * init per batch, exactly like a pandas-UDF batch would. Each task
    * decodes its partition's payloads and emits fixed-width features.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-batch decoder init would go here (codec contexts, models…)
      rows.map(MediaCodec.decodeBytes)
    }
  }

  /** Frame sampling plan for video-like payloads: every `everyMs`
    * starting at 0, as an array of timestamps — the shuffle-free
    * precursor to a frame-decode pass.
    */
  def frameSamplePlan(features: DataFrame, everyMs: Long): DataFrame =
    features
      .where(col("kind") === "video" && col("duration_ms") > 0)
      .withColumn("frame_ts_ms",
        sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
}

/** The decode boundary. REAL IMPLEMENTATION STUBBED — no codec libs in
  * this environment. `decodeBytes` derives all "decoded" properties
  * deterministically from the payload bytes so the pipeline around it
  * is fully testable; a production build replaces this object with
  * JNI/FFM bindings to actual decoders.
  */
object MediaCodec {

  /** STUB: deterministic fake decode. A real decoder would parse the
    * container/codec here (??? in spirit); we derive stable pseudo
    * dimensions/duration/features from a 64-bit payload hash instead.
    */
  def decodeBytes(row: Multimodal.MediaRow): Multimodal.MediaFeatures = {
    val h = fnv1a(row.payload)
    def mix(i: Int): Long = {
      var x = h + i.toLong * 0x9E3779B97F4A7C15L
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
      x
    }
    val width = 64 + (math.abs(mix(1)) % 1920).toInt
    val height = 64 + (math.abs(mix(2)) % 1080).toInt
    val duration = if (row.kind == "image") 0L else 1000L + math.abs(mix(3)) % 600000L
    val feature = (0 until 8).map(i =>
      (mix(4 + i).toDouble / Long.MaxValue.toDouble).toFloat)
    Multimodal.MediaFeatures(
      media_id = row.media_id,
      kind = row.kind,
      n_bytes = row.payload.length.toLong,
      payload_fnv1a = h,
      width = width,
      height = height,
      duration_ms = duration,
      feature = feature)
  }

  /** FNV-1a 64-bit — tiny, allocation-free, stable across JVMs. */
  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFF).toLong
      h *= 0x100000001B3L
      i += 1
    }
    h
  }
}
