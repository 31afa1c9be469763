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

/** The decode boundary. Image DIMENSIONS are decoded for real — PNG,
  * JPEG, and GIF store them at fixed or marker-addressed header offsets,
  * parseable with zero codec dependencies ([[imageDimensions]]). Full
  * pixel decode and audio/video remain STUBBED (no codec libs in this
  * environment): payloads that aren't a recognized image fall back to
  * deterministic fake properties so the pipeline around the boundary is
  * fully testable. A production build swaps the fallback for JNI/FFM
  * bindings to actual decoders.
  */
object MediaCodec {

  /** Real image header parse: returns (width, height) for PNG (IHDR at
    * byte 16), JPEG (first SOFn frame header), or GIF (logical screen
    * descriptor); None when the payload isn't one of the three.
    */
  def imageDimensions(b: Array[Byte]): Option[(Int, Int)] = {
    // PNG: 8-byte signature, then the IHDR chunk MUST be first —
    // width/height are the 4-byte big-endian words at offsets 16/20
    if (b.length >= 24 &&
        (b(0) & 0xFF) == 0x89 && b(1) == 'P'.toByte && b(2) == 'N'.toByte &&
        b(3) == 'G'.toByte && b(12) == 'I'.toByte && b(13) == 'H'.toByte &&
        b(14) == 'D'.toByte && b(15) == 'R'.toByte)
      Some((be32(b, 16), be32(b, 20)))
    // JPEG: SOI then a marker walk to the first start-of-frame
    else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
      jpegSofDimensions(b)
    // GIF87a/89a: width/height are little-endian shorts at 6/8
    else if (b.length >= 10 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
        b(2) == 'F'.toByte && b(3) == '8'.toByte &&
        (b(4) == '7'.toByte || b(4) == '9'.toByte) && b(5) == 'a'.toByte)
      Some((le16(b, 6), le16(b, 8)))
    else None
  }

  /** Walk JPEG marker segments from SOI to the first SOFn (C0–CF minus
    * C4/C8/CC, which aren't frame headers); height/width are big-endian
    * shorts at segment offsets 5/7. Stops at SOS (entropy-coded data —
    * a frame header must precede it) or any desync.
    */
  private def jpegSofDimensions(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return None
      val marker = b(i + 1) & 0xFF
      if (marker == 0xFF) i += 1 // fill byte
      else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) i += 2 // standalone
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof)
          return if (len >= 7) Some((be16(b, i + 7), be16(b, i + 5))) else None
        if (marker == 0xDA) return None
        i += 2 + len
      }
    }
    None
  }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** Decode one payload: real header dimensions when the payload is a
    * recognized image; otherwise the deterministic STUB fallback (fake
    * dimensions/duration/features from a 64-bit payload hash) so
    * non-image media keep exercising the pipeline.
    */
  def decodeBytes(row: Multimodal.MediaRow): Multimodal.MediaFeatures = {
    val h = fnv1a(row.payload)
    def mix(i: Int): Long = {
      var x = h + i.toLong * 0x9E3779B97F4A7C15L
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
      x
    }
    val realDims = imageDimensions(row.payload)
    val width = realDims.map(_._1).getOrElse(64 + (math.abs(mix(1)) % 1920).toInt)
    val height = realDims.map(_._2).getOrElse(64 + (math.abs(mix(2)) % 1080).toInt)
    val duration =
      if (row.kind == "image" || realDims.isDefined) 0L
      else 1000L + math.abs(mix(3)) % 600000L
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
