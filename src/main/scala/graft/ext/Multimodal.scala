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

  /** One analysis frame of a PCM payload ([[audioFrameFeatures]]). */
  final case class AudioFrame(
      media_id: Long,
      frame_idx: Int,
      start_ms: Long,
      rms: Double, // [0,1] of full scale
      peak: Double,
      zcr: Double) // sign changes per sample transition within the frame

  /** Frame-level audio features over 16-bit PCM WAV payloads: the
    * payload's data chunk sliced into non-overlapping `frameMs`
    * windows, each reduced to (rms, peak, zcr) — the
    * silence/voice-activity primitives every audio curation pipeline
    * segments on, and the audio analog of [[frameSamplePlan]] (which
    * PLANS frames; this one computes per-frame features for real).
    *
    * Typed flatMap: per-payload linear CPU in the scan projection, no
    * shuffle — downstream segmentation aggregates the (id, frame)
    * stream, which is the narrow thing to shuffle, never the payload
    * bytes. Non-WAV / non-PCM16 payloads yield no rows (the decode
    * boundary convention: [[MediaCodec.wavFrameFeatures]] returns
    * empty, callers needing "undecodable" rows left-join back).
    */
  def audioFrameFeatures(media: Dataset[MediaRow], frameMs: Int): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    media.flatMap(r =>
      MediaCodec.wavFrameFeatures(r.payload, frameMs).map {
        case (idx, startMs, rms, peak, zcr) =>
          AudioFrame(r.media_id, idx, startMs, rms, peak, zcr)
      })
  }

  /** One spectral row per audio frame. */
  final case class AudioSpectrum(
      media_id: Long,
      frame: Int,
      peak_hz: Double, // dominant-frequency bin center
      centroid_hz: Double, // magnitude-weighted mean frequency
      peak_mag_rel: Double) // peak bin's share of non-DC magnitude

  /** Frame-level FREQUENCY-domain features over 16-bit PCM WAV
    * payloads: each `frameMs` window FFT'd
    * ([[MediaCodec.wavSpectralFeatures]] — radix-2, channel 0,
    * rectangular window) to its dominant frequency, spectral centroid,
    * and peak-magnitude share — the tone/speech/noise discriminators
    * the time-domain [[audioFrameFeatures]] (rms/peak/zcr) can't see.
    * Same scale shape: a typed flatMap, per-payload CPU in the scan,
    * only the narrow (id, frame, features) stream ever shuffles.
    */
  def audioSpectralFeatures(media: Dataset[MediaRow], frameMs: Int): Dataset[AudioSpectrum] = {
    import media.sparkSession.implicits._
    media.flatMap(r =>
      MediaCodec.wavSpectralFeatures(r.payload, frameMs).map {
        case (idx, peakHz, centroidHz, rel) =>
          AudioSpectrum(r.media_id, idx, peakHz, centroidHz, rel)
      })
  }
}

/** The decode boundary. ENVELOPE properties are decoded for real with
  * zero codec dependencies: image dimensions (PNG/JPEG/GIF header
  * offsets, [[imageDimensions]]), audio sample rate + duration (WAV
  * RIFF chunk walk, [[wavInfo]]), and video duration (MP4 `moov/mvhd`
  * box walk, [[mp4DurationMs]]). Only full SAMPLE decode (pixels, PCM
  * frames) remains STUBBED — no codec libs in this environment:
  * unrecognized payloads fall back to deterministic fake properties so
  * the pipeline around the boundary is fully testable. A production
  * build swaps the fallback for JNI/FFM bindings to actual decoders.
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
    // BMP: BITMAPFILEHEADER "BM", width/height LE words at 18/22
    // (height may be negative = top-down row order)
    else if (isBmp(b))
      Some((le32(b, 18), math.abs(le32(b, 22))))
    // binary netpbm (P5 grayscale / P6 RGB): ASCII header tokens
    else
      pnmHeader(b).map { case (_, w, h, _, _) => (w, h) }
  }

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M' &&
      (le32(b, 14) & 0xFFFFFFFFL) >= 40 // BITMAPINFOHEADER or later

  /** Per-channel means of an uncompressed 24-bpp BMP, normalized to
    * [0,1] — REAL sample (pixel) decode, zero codec dependencies: BMP
    * rows are raw B,G,R triples padded to 4-byte boundaries, so the
    * whole raster is plain byte math. Returns (meanR, meanG, meanB);
    * None when the payload isn't such a BMP or the raster is truncated.
    * Means are row-order-independent, so bottom-up vs top-down storage
    * needs no branch.
    */
  def bmpPixelStats(b: Array[Byte]): Option[(Double, Double, Double)] = {
    if (!isBmp(b)) return None
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    val w = le32(b, 18)
    val h = math.abs(le32(b, 22))
    val off = le32(b, 10)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0 || off < 54) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (off.toLong + stride.toLong * h > b.length) return None
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var i = off + y * stride
      val rowEnd = i + w * 3
      while (i < rowEnd) {
        sb += b(i) & 0xFF; sg += b(i + 1) & 0xFF; sr += b(i + 2) & 0xFF
        i += 3
      }
      y += 1
    }
    val n = w.toLong * h * 255L
    Some((sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }

  /** Per-channel means of a PNG, normalized to [0,1] — REAL pixel
    * decode of the dominant web-crawl image format, zero codec
    * dependencies: PNG's "compression" is plain zlib
    * (`java.util.zip.Inflater`) over filtered scanlines, the five
    * scanline filters (None/Sub/Up/Average/Paeth) are byte arithmetic,
    * and Adam7 interlacing needs only per-pass scanline geometry — a
    * MEAN is pixel-order-independent, so pass samples accumulate
    * without placement. SPEC-COMPLETE for means: every legal (color
    * type, bit depth) pair — gray 1/2/4/8/16, RGB 8/16, palette
    * 1/2/4/8 (PLTE lookup), gray+alpha and RGBA 8/16 — interlaced or
    * not. Alpha is ignored in the means, gray replicates to all three
    * channels, sub-8-bit samples unpack MSB-first and scale by
    * 255/maxval. Returns None only for malformed streams (bad
    * depth/type pairs, missing PLTE, out-of-palette indices,
    * truncation) — those fall to the deterministic stub like any
    * unrecognized payload.
    *
    * Allocation guard: the raster size is bounded by the deflate
    * maximum expansion (1032×) of the IDAT bytes actually present plus
    * an absolute cap, so a forged IHDR claiming a huge canvas cannot
    * allocation-bomb an executor scanning untrusted crawl bytes.
    */
  def pngPixelStats(b: Array[Byte]): Option[(Double, Double, Double)] = {
    val isPng = b.length >= 33 &&
      (b(0) & 0xFF) == 0x89 && b(1) == 'P'.toByte && b(2) == 'N'.toByte &&
      b(3) == 'G'.toByte && b(12) == 'I'.toByte && b(13) == 'H'.toByte &&
      b(14) == 'D'.toByte && b(15) == 'R'.toByte
    if (!isPng) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val depth = b(24) & 0xFF
    val colorType = b(25) & 0xFF
    val interlace = b(28) & 0xFF
    // compression(26) must be 0 (zlib), filter method(27) 0
    if (b(26) != 0 || b(27) != 0 || (interlace != 0 && interlace != 1))
      return None
    val channels = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => return None
    }
    // legal depth/type pairs (PNG spec table 11.1)
    val depthOk = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)(depth)
      case 3 => Set(1, 2, 4, 8)(depth)
      case _ => depth == 8 || depth == 16
    }
    if (!depthOk || w <= 0 || h <= 0) return None

    // chunk walk: concatenate IDAT payloads until IEND; capture PLTE
    val idat = new java.io.ByteArrayOutputStream()
    var palette: Array[Byte] = null
    var i = 33 // skip signature(8) + IHDR chunk(12+13)
    var sawEnd = false
    while (!sawEnd) {
      if (i + 8 > b.length) return None // ran off the end before IEND
      val len = be32(b, i)
      if (len < 0 || i + 12 + len.toLong > b.length) return None // truncated
      val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (typ == "IDAT") idat.write(b, i + 8, len)
      else if (typ == "PLTE") {
        if (len % 3 != 0 || len > 768) return None
        palette = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
      }
      else if (typ == "IEND") sawEnd = true
      i += 12 + len
    }
    if (colorType == 3 && palette == null) return None // PLTE is mandatory

    // pass geometry: one full-frame pass, or the seven Adam7 passes
    // (zero-dimension passes drop out). Means need no pixel placement,
    // only each pass's scanline widths.
    val passes: Seq[(Int, Int)] =
      if (interlace == 0) Seq((w, h))
      else Seq(
        ((w + 7) / 8, (h + 7) / 8), // x0 0, y0 0, step 8x8
        ((w + 3) / 8, (h + 7) / 8), // x0 4
        ((w + 3) / 4, (h + 3) / 8), // y0 4
        ((w + 1) / 4, (h + 3) / 4), // x0 2
        ((w + 1) / 2, (h + 1) / 4), // y0 2
        (w / 2, (h + 1) / 2), // x0 1
        (w, h / 2) // y0 1
      ).filter { case (pw, ph) => pw > 0 && ph > 0 }

    def rowBytes(pw: Int): Long = (pw.toLong * channels * depth + 7) / 8
    // overflow-safe canvas guards before any allocation
    if (w.toLong * h > (1L << 26)) return None // 64 M pixel cap
    val expected = passes.map { case (pw, ph) => (rowBytes(pw) + 1) * ph }.sum
    if (expected > (1L << 28)) return None // 256 MB absolute cap
    if (expected > idat.size().toLong * 1032L + 1024L) return None // deflate bound
    val raw = new Array[Byte](expected.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length) {
        val k =
          try inf.inflate(raw, off, raw.length - off)
          catch { case _: java.util.zip.DataFormatException => return None }
        // inflate yields 0 only when finished, starved for input, or
        // demanding a preset dictionary — all terminal here (PNG zlib
        // streams never use dictionaries), so 0 progress = bad stream
        if (k == 0) return None
        off += k
      }
    } finally inf.end()

    // scanline reconstruction (PNG spec §4.5.2-4.5.4); the filter unit
    // bpp is the byte width of one pixel, floored at 1 for sub-byte
    // packing
    def paeth(a: Int, up: Int, c: Int): Int = {
      val p = a + up - c
      val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
    }
    val bpp = math.max(1, channels * depth / 8)
    val maxval = (1 << depth) - 1
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    var badPalette = false
    for ((pw, ph) <- passes if !badPalette) {
      val rl = rowBytes(pw).toInt
      var prev = new Array[Byte](rl)
      var cur = new Array[Byte](rl)
      var y = 0
      while (y < ph && !badPalette) {
        val f = raw(p) & 0xFF
        p += 1
        if (f > 4) return None
        var x = 0
        while (x < rl) {
          val rv = raw(p + x) & 0xFF
          val a = if (x >= bpp) cur(x - bpp) & 0xFF else 0
          val up = prev(x) & 0xFF
          val v = f match {
            case 0 => rv
            case 1 => rv + a
            case 2 => rv + up
            case 3 => rv + ((a + up) >> 1)
            case _ => rv + paeth(a, up,
              if (x >= bpp) prev(x - bpp) & 0xFF else 0)
          }
          cur(x) = (v & 0xFF).toByte
          x += 1
        }
        p += rl
        // sample extraction per depth/type
        if (depth < 8) {
          // single channel (gray or palette), MSB-first packing
          val mask = maxval
          var px = 0
          while (px < pw) {
            val bit = px * depth
            val v = ((cur(bit >> 3) & 0xFF) >> (8 - depth - (bit & 7))) & mask
            if (colorType == 3) {
              val idx = v * 3
              if (idx + 2 >= palette.length) badPalette = true
              else {
                sr += palette(idx) & 0xFF
                sg += palette(idx + 1) & 0xFF
                sb += palette(idx + 2) & 0xFF
              }
            } else {
              // scale sub-8-bit gray to 8-bit exactly: v*255/maxval
              val g = v * 255 / mask
              sr += g; sg += g; sb += g
            }
            px += 1
          }
        } else if (depth == 8) {
          var px = 0
          while (px < rl) {
            if (colorType == 2 || colorType == 6) {
              sr += cur(px) & 0xFF; sg += cur(px + 1) & 0xFF; sb += cur(px + 2) & 0xFF
            } else if (colorType == 3) {
              val idx = (cur(px) & 0xFF) * 3
              if (idx + 2 >= palette.length) badPalette = true
              else {
                sr += palette(idx) & 0xFF
                sg += palette(idx + 1) & 0xFF
                sb += palette(idx + 2) & 0xFF
              }
            } else {
              val g = cur(px) & 0xFF
              sr += g; sg += g; sb += g
            }
            px += channels
          }
        } else { // depth 16: big-endian sample pairs
          val step = channels * 2
          var px = 0
          while (px < rl) {
            def s16(o: Int) = ((cur(o) & 0xFF) << 8) | (cur(o + 1) & 0xFF)
            if (colorType == 2 || colorType == 6) {
              sr += s16(px); sg += s16(px + 2); sb += s16(px + 4)
            } else {
              val g = s16(px)
              sr += g; sg += g; sb += g
            }
            px += step
          }
        }
        val t = prev; prev = cur; cur = t
        y += 1
      }
    }
    if (badPalette) return None // index past PLTE: refuse, never misread
    // denominator: palette and sub-8-bit gray sums are 8-bit scaled;
    // direct samples normalize by their own maxval
    val den = if (colorType == 3 || depth < 8) 255L else maxval.toLong
    val n = w.toLong * h * den
    Some((sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }

  /** Parsed binary-netpbm header: (isColor, width, height, maxval,
    * rasterOffset). P5 = grayscale (1 sample/pixel), P6 = RGB
    * (3 samples/pixel); samples are 1 byte (maxval ≤ 255) or 2-byte
    * big-endian (maxval ≤ 65535). Header tokens are ASCII separated by
    * whitespace, `#` comments run to end-of-line, and exactly ONE
    * whitespace byte separates maxval from the raster.
    */
  private def pnmHeader(b: Array[Byte]): Option[(Boolean, Int, Int, Int, Int)] = {
    if (b.length < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return None
    val isColor = b(1) == '6'
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      // skip whitespace and comments
      var skipping = true
      while (skipping && i < b.length) {
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else skipping = false
      }
      if (i >= b.length || b(i) < '0' || b(i) > '9') return None
      var x = 0L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        x = x * 10 + (b(i) - '0')
        if (x > Int.MaxValue) return None
        i += 1
      }
      vals(v) = x.toInt
      v += 1
    }
    // exactly one whitespace byte before the raster
    if (i >= b.length) return None
    val c = b(i)
    if (c != ' ' && c != '\t' && c != '\n' && c != '\r') return None
    val (w, h, maxval) = (vals(0), vals(1), vals(2))
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 65535) return None
    Some((isColor, w, h, maxval, i + 1))
  }

  /** Per-channel means of a binary netpbm raster (P5 grayscale / P6
    * RGB), normalized to [0,1] by the header's maxval — the same
    * zero-dependency REAL pixel decode as [[bmpPixelStats]] (netpbm
    * rasters are raw samples, no compression): returns
    * (meanR, meanG, meanB), with the gray mean on all three channels
    * for P5. Handles both 1-byte and big-endian 2-byte samples. None
    * when the payload isn't binary netpbm or the raster is truncated.
    */
  def pnmPixelStats(b: Array[Byte]): Option[(Double, Double, Double)] =
    pnmHeader(b).flatMap { case (isColor, w, h, maxval, off) =>
      val bytesPerSample = if (maxval > 255) 2 else 1
      val samplesPerPixel = if (isColor) 3 else 1
      val nPix = w.toLong * h
      // division form: the multiplied guard overflows Long for huge
      // header dims (1.3e9 × 1.3e9 × 6 > Long.Max) and would pass,
      // sending the decode loop off the end of the buffer
      if (nPix > (b.length - off).toLong / (samplesPerPixel * bytesPerSample)) None
      else {
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = off
        def next(): Int =
          if (bytesPerSample == 1) { val s = b(i) & 0xFF; i += 1; s }
          else { val s = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF); i += 2; s }
        var p = 0L
        while (p < nPix) {
          if (isColor) { sr += next(); sg += next(); sb += next() }
          else { val g = next(); sr += g; sg += g; sb += g }
          p += 1
        }
        val n = nPix.toDouble * maxval
        Some((sr / n, sg / n, sb / n))
      }
    }

  /** Sample-level PCM statistics of a 16-bit PCM WAV — REAL audio
    * sample decode, zero codec dependencies (int16 little-endian math
    * over the `data` chunk): RMS and peak normalized to [0,1] by
    * full-scale 32768, clip ratio = fraction of samples at ±full-scale,
    * zero-crossing rate = sign changes per sample transition. Works on
    * however much of the declared data chunk is present in the buffer
    * (a truncated tail payload yields stats of its prefix). None when
    * the payload isn't RIFF/WAVE, isn't format 1 (integer PCM) at 16
    * bits, or carries no samples.
    */
  def wavPcmStats(b: Array[Byte]): Option[(Double, Double, Double, Double)] = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (i + 8 <= b.length && (!fmtOk || dataOff < 0)) {
      val size = le32(b, i + 4) & 0xFFFFFFFFL
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return None
        fmtOk = le16(b, i + 8) == 1 && le16(b, i + 22) == 16 // PCM, 16-bit
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = math.min(size, (b.length - dataOff).toLong).toInt
      }
      if (size > Int.MaxValue - 16L) return None
      i += 8 + size.toInt + (size.toInt & 1)
    }
    val n = dataLen / 2
    if (!fmtOk || dataOff < 0 || n == 0) return None
    var sumSq = 0.0; var peak = 0; var clipped = 0L; var crossings = 0L
    var prevSign = 0
    var s = 0
    while (s < n) {
      val v = ((b(dataOff + 2 * s) & 0xFF) |
        (b(dataOff + 2 * s + 1) << 8)).toShort.toInt
      val a = math.abs(v)
      sumSq += v.toDouble * v
      if (a > peak) peak = a
      if (a >= 32767) clipped += 1
      val sign = Integer.signum(v)
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) crossings += 1
        prevSign = sign
      }
      s += 1
    }
    Some((math.sqrt(sumSq / n) / 32768.0, peak / 32768.0,
      clipped.toDouble / n, if (n > 1) crossings.toDouble / (n - 1) else 0.0))
  }

  /** Per-frame PCM features of a 16-bit PCM WAV: the data chunk cut
    * into non-overlapping `frameMs` windows (interleaved-sample count
    * `rate·channels·frameMs/1000`, min 1), each reduced to the same
    * (rms, peak, zcr) math as [[wavPcmStats]] — one linear pass, one
    * tuple per frame: `(frame_idx, start_ms, rms, peak, zcr)`. The
    * trailing partial frame is reported over its actual sample count.
    * Empty for non-RIFF / non-PCM16 payloads or `frameMs <= 0`.
    */
  /** RIFF/WAVE chunk walk shared by every PCM reader: returns
    * (sampleRate, channels, dataOff, nSamples16) for canonical 16-bit
    * PCM, or None for anything else.
    */
  private def wavPcmLayout(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var fmtOk = false
    var rate = 0
    var channels = 0
    var dataOff = -1
    var dataLen = 0
    while (i + 8 <= b.length && (!fmtOk || dataOff < 0)) {
      val size = le32(b, i + 4) & 0xFFFFFFFFL
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return None
        fmtOk = le16(b, i + 8) == 1 && le16(b, i + 22) == 16
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = math.min(size, (b.length - dataOff).toLong).toInt
      }
      if (size > Int.MaxValue - 16L) return None
      i += 8 + size.toInt + (size.toInt & 1)
    }
    val n = dataLen / 2
    if (!fmtOk || dataOff < 0 || n == 0 || rate <= 0 || channels <= 0) None
    else Some((rate, channels, dataOff, n))
  }

  def wavFrameFeatures(b: Array[Byte], frameMs: Int): Seq[(Int, Long, Double, Double, Double)] = {
    if (frameMs <= 0) return Nil
    val (rate, channels, dataOff, n) = wavPcmLayout(b) match {
      case Some(l) => l
      case None => return Nil
    }
    val perFrame = math.max(1L, rate.toLong * channels * frameMs / 1000L).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double, Double)]
    var f = 0
    var s0 = 0
    while (s0 < n) {
      val m = math.min(perFrame, n - s0)
      var sumSq = 0.0; var peak = 0; var crossings = 0L; var prevSign = 0
      var s = 0
      while (s < m) {
        val v = ((b(dataOff + 2 * (s0 + s)) & 0xFF) |
          (b(dataOff + 2 * (s0 + s) + 1) << 8)).toShort.toInt
        val a = math.abs(v)
        sumSq += v.toDouble * v
        if (a > peak) peak = a
        val sign = Integer.signum(v)
        if (sign != 0) {
          if (prevSign != 0 && sign != prevSign) crossings += 1
          prevSign = sign
        }
        s += 1
      }
      out += ((f, s0.toLong * 1000L / (rate.toLong * channels),
        math.sqrt(sumSq / m) / 32768.0, peak / 32768.0,
        if (m > 1) crossings.toDouble / (m - 1) else 0.0))
      f += 1
      s0 += m
    }
    out.toSeq
  }

  /** Per-frame SPECTRAL features of 16-bit PCM WAV audio: radix-2
    * Cooley-Tukey FFT over each frame's first 2^k channel-0 samples,
    * yielding the dominant frequency (peak magnitude bin, DC excluded)
    * and the spectral centroid — the two features a speech/music/noise
    * gate reads first. Rectangular window, deterministic arithmetic.
    *
    * Returns (frame, peak_hz, centroid_hz, peak_mag_rel) per frame with
    * ≥ 16 samples; `peak_mag_rel` is the peak bin's share of total
    * non-DC magnitude (a pure tone reads near 1, noise near 1/bins).
    */
  def wavSpectralFeatures(b: Array[Byte], frameMs: Int): Seq[(Int, Double, Double, Double)] = {
    if (frameMs <= 0) return Nil
    val (rate, channels, dataOff, n) = wavPcmLayout(b) match {
      case Some(l) => l
      case None => return Nil
    }
    val mono = n / channels
    val perFrame = math.max(1L, rate.toLong * frameMs / 1000L).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, Double)]
    var f = 0
    var s0 = 0
    while (s0 < mono) {
      val m = math.min(perFrame, mono - s0)
      // largest power of two ≤ m (FFT length), min 16 samples
      var len = Integer.highestOneBit(m)
      if (len >= 16) {
        val re = new Array[Double](len)
        val im = new Array[Double](len)
        var s = 0
        while (s < len) {
          val off = dataOff + 2 * ((s0 + s) * channels) // channel 0
          re(s) = ((b(off) & 0xFF) | (b(off + 1) << 8)).toShort.toDouble
          s += 1
        }
        fftInPlace(re, im)
        // magnitude spectrum over bins 1 .. len/2 (DC excluded)
        var peakBin = 1
        var peakMag = 0.0
        var magSum = 0.0
        var centNum = 0.0
        var bin = 1
        while (bin <= len / 2) {
          val mag = math.sqrt(re(bin) * re(bin) + im(bin) * im(bin))
          if (mag > peakMag) { peakMag = mag; peakBin = bin }
          magSum += mag
          centNum += mag * bin
          bin += 1
        }
        val hzPerBin = rate.toDouble / len
        out += ((f,
          peakBin * hzPerBin,
          if (magSum > 0) centNum / magSum * hzPerBin else 0.0,
          if (magSum > 0) peakMag / magSum else 0.0))
      }
      f += 1
      s0 += m
    }
    out.toSeq
  }

  /** Iterative radix-2 Cooley-Tukey, in place; length must be a power
    * of two. Textbook construction: bit-reversal permutation, then
    * log2(n) butterfly passes.
    */
  private def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr = re(blk + k + len / 2) * cr - im(blk + k + len / 2) * ci
          val vi = re(blk + k + len / 2) * ci + im(blk + k + len / 2) * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr; im(blk + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
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

  /** Real WAV envelope parse: RIFF/WAVE chunk walk to the `fmt ` chunk
    * (sample rate, byte rate) and the `data` chunk (payload size);
    * duration = dataBytes · 1000 / byteRate. Returns (sampleRate,
    * durationMs); None when the payload isn't RIFF/WAVE or the needed
    * chunks are absent/inconsistent. The declared data size is trusted
    * even if the buffer is truncated — it is the header's claim about
    * stream length, exactly what an envelope sweep wants.
    */
  def wavInfo(b: Array[Byte]): Option[(Int, Long)] = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var sampleRate = 0
    var byteRate = 0
    var dataBytes = -1L
    while (i + 8 <= b.length && (sampleRate == 0 || dataBytes < 0)) {
      val size = le32(b, i + 4) & 0xFFFFFFFFL
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return None
        sampleRate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dataBytes = size
      }
      if (size > Int.MaxValue - 16L) return None // implausible chunk size
      i += 8 + size.toInt + (size.toInt & 1) // RIFF chunks are word-aligned
    }
    if (sampleRate > 0 && byteRate > 0 && dataBytes >= 0)
      Some((sampleRate, dataBytes * 1000L / byteRate))
    else None
  }

  /** Real MP4 envelope parse: ISO-BMFF box walk `moov` → `mvhd`;
    * duration_ms = duration · 1000 / timescale (mvhd v0: 32-bit
    * creation/modification/duration words; v1: 64-bit). Gated on the
    * first top-level box being a known ISO-BMFF type so arbitrary
    * binary can't false-positive.
    */
  def mp4DurationMs(b: Array[Byte]): Option[Long] = {
    val known = Set("ftyp", "styp", "moov", "mdat", "free", "skip", "wide", "pdin")
    if (b.length < 16 || !known.contains(boxType(b, 0))) return None
    findBox(b, 0, b.length, List("moov", "mvhd")).flatMap { case (off, end) =>
      val version = b(off) & 0xFF
      if (version == 0 && off + 20 <= end) {
        val timescale = be32(b, off + 12).toLong & 0xFFFFFFFFL
        val duration = be32(b, off + 16).toLong & 0xFFFFFFFFL
        if (timescale > 0) Some(duration * 1000L / timescale) else None
      } else if (version == 1 && off + 32 <= end) {
        val timescale = be32(b, off + 20).toLong & 0xFFFFFFFFL
        val duration = be64(b, off + 24)
        if (timescale > 0 && duration >= 0) Some(duration * 1000L / timescale) else None
      } else None
    }
  }

  /** Walk sibling boxes in [start, end) for `path.head`; recurse into
    * the match for the rest of the path. Returns the payload span
    * (after the 8- or 16-byte box header) of the final match.
    */
  private def findBox(b: Array[Byte], start: Int, end: Int, path: List[String]): Option[(Int, Int)] = {
    var i = start
    while (i + 8 <= end) {
      var size = be32(b, i).toLong & 0xFFFFFFFFL
      var hdr = 8
      if (size == 1) {
        if (i + 16 > end) return None
        size = be64(b, i + 8); hdr = 16
      } else if (size == 0) size = (end - i).toLong // box runs to EOF
      if (size < hdr || size > end - i) return None
      if (boxType(b, i) == path.head) {
        val span = (i + hdr, i + size.toInt)
        return if (path.tail.isEmpty) Some(span)
        else findBox(b, span._1, span._2, path.tail)
      }
      i += size.toInt
    }
    None
  }

  private def boxType(b: Array[Byte], i: Int): String =
    new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i).toLong & 0xFFFFFFFFL) << 32) | (be32(b, i + 4).toLong & 0xFFFFFFFFL)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** Decode one payload: real header properties when the payload is a
    * recognized image (dimensions), WAV (duration), or MP4 (duration);
    * otherwise the deterministic STUB fallback (fake dimensions/
    * duration/features from a 64-bit payload hash) so unrecognized
    * media keep exercising the pipeline. Recognized audio/video get
    * width = height = 0 — visual dimensions genuinely unknown from the
    * envelope — never fake ones.
    *
    * SAMPLE decode is real for one format per modality (the formats
    * whose samples are raw integers, so no codec library is needed):
    *  - 16-bit PCM WAV → `feature = [rms, peak, clip_ratio,
    *    zero_cross_rate, 0, 0, 0, 0]` ([[wavPcmStats]]);
    *  - uncompressed 24-bpp BMP → `feature = [mean_r, mean_g, mean_b,
    *    mean_luma, 0, 0, 0, 0]` ([[bmpPixelStats]], BT.601 luma);
    *  - binary netpbm (P5 grayscale / P6 RGB) → the same channel-mean
    *    feature head ([[pnmPixelStats]]; gray mean on all three
    *    channels for P5);
    *  - 8-bit non-interlaced PNG (gray / gray+alpha / RGB / RGBA) →
    *    the same channel-mean feature head ([[pngPixelStats]]: zlib
    *    inflate + the five scanline filters, zero-dependency — the
    *    dominant crawl image format decodes for real);
    *  - baseline AND progressive JPEG (grayscale or YCbCr, any
    *    standard subsampling) → the same channel-mean feature head
    *    ([[JpegCodec.pixelStats]]: Huffman entropy decode — multi-scan
    *    spectral-selection/successive-approximation accumulation for
    *    SOF2 per ITU T.81 Annex G — + dequant + IDCT + YCbCr→RGB,
    *    zero-dependency — cross-verified against the JDK's independent
    *    ImageIO codec in JpegSpec);
    *  - GIF (87a/89a, first frame, interlace-agnostic — means are
    *    pixel-order-independent) → the same feature head
    *    ([[GifCodec.pixelStats]]: LZW + color-table lookup,
    *    zero-dependency, ImageIO-cross-checked in GifSpec).
    * With JPEG (baseline and progressive), PNG (incl. palette), and
    * GIF all real, every dominant crawl image format now decodes. The
    * remaining codec-bound shapes (arithmetic JPEG, 16-bit or
    * interlaced PNG, MP3/AAC frames, H.26x) keep the deterministic
    * fake feature — decoding them needs real codec libraries, absent
    * here; a production build swaps exactly this fallback.
    */
  def decodeBytes(row: Multimodal.MediaRow): Multimodal.MediaFeatures = {
    val h = fnv1a(row.payload)
    def mix(i: Int): Long = {
      var x = h + i.toLong * 0x9E3779B97F4A7C15L
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
      x
    }
    val realDims = imageDimensions(row.payload)
    val realDuration =
      if (realDims.isDefined) None
      else wavInfo(row.payload).map(_._2).orElse(mp4DurationMs(row.payload))
    def dim(fake: => Int) =
      if (realDuration.isDefined) 0 else fake
    val width = realDims.map(_._1).getOrElse(dim(64 + (math.abs(mix(1)) % 1920).toInt))
    val height = realDims.map(_._2).getOrElse(dim(64 + (math.abs(mix(2)) % 1080).toInt))
    val duration =
      if (row.kind == "image" || realDims.isDefined) 0L
      else realDuration.getOrElse(1000L + math.abs(mix(3)) % 600000L)
    val realFeature: Option[Seq[Float]] =
      wavPcmStats(row.payload).map { case (rms, peak, clip, zcr) =>
        Seq(rms.toFloat, peak.toFloat, clip.toFloat, zcr.toFloat, 0f, 0f, 0f, 0f)
      }.orElse(bmpPixelStats(row.payload).orElse(pnmPixelStats(row.payload))
        .orElse(pngPixelStats(row.payload))
        .orElse(JpegCodec.pixelStats(row.payload))
        .orElse(GifCodec.pixelStats(row.payload))
        .map { case (r, g, b) =>
          val luma = 0.299 * r + 0.587 * g + 0.114 * b
          Seq(r.toFloat, g.toFloat, b.toFloat, luma.toFloat, 0f, 0f, 0f, 0f)
        })
    val feature = realFeature.getOrElse((0 until 8).map(i =>
      (mix(4 + i).toDouble / Long.MaxValue.toDouble).toFloat))
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

  /** Magic-byte format sniff — the envelope-level classifier a crawl
    * pipeline runs before routing a payload to a decoder. Signature
    * peeks only; the formats are the crawl-dominant set plus the
    * codec-bound ones this engine deliberately refuses.
    */
  def sniffFormat(b: Array[Byte]): String = {
    def at(i: Int): Int = if (i >= 0 && i < b.length) b(i) & 0xFF else -1
    def ascii(i: Int, s: String): Boolean =
      i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)
    if (ascii(0, "RIFF") && ascii(8, "WAVE")) "wav"
    else if (ascii(0, "BM")) "bmp"
    else if (at(0) == 'P'.toInt && (at(1) == '5'.toInt || at(1) == '6'.toInt)) "pnm"
    else if (at(0) == 0x89 && ascii(1, "PNG")) "png"
    else if (at(0) == 0xFF && at(1) == 0xD8)
      // one marker walk deeper than a pure magic peek: the SOF process
      // decides which decoder path (and accounting bucket) a crawl
      // pipeline routes the payload to
      if (JpegCodec.isProgressive(b)) "jpeg_progressive" else "jpeg"
    else if (ascii(0, "GIF8")) "gif"
    else if (b.length >= 12 &&
      Set("ftyp", "styp", "moov", "mdat").contains(boxType(b, 0))) "mp4"
    else if (ascii(0, "ID3") || (at(0) == 0xFF && (at(1) & 0xE0) == 0xE0)) "mp3"
    else if ((at(0) == 0 && at(1) == 0 && at(2) == 0 && at(3) == 1) ||
      (at(0) == 0 && at(1) == 0 && at(2) == 1)) "h26x"
    else "unknown"
  }

  /** Per-payload decode audit: `(format, outcome)` where outcome is
    * `decoded` (a real sample decode produced the feature head),
    * `envelope_only` (real header metadata — dimensions/duration —
    * but the sample decode is REFUSED: codec-bound), or `refused`
    * (stub fallback end to end). Runs the SAME decoder chain as
    * [[decodeBytes]], so the accounting cannot drift from behavior.
    */
  def decodeOutcome(payload: Array[Byte]): (String, String) = {
    val sample = wavPcmStats(payload).isDefined ||
      bmpPixelStats(payload).isDefined || pnmPixelStats(payload).isDefined ||
      pngPixelStats(payload).isDefined || JpegCodec.pixelStats(payload).isDefined ||
      GifCodec.pixelStats(payload).isDefined
    val envelope = imageDimensions(payload).isDefined ||
      wavInfo(payload).isDefined || mp4DurationMs(payload).isDefined
    val outcome =
      if (sample) "decoded"
      else if (envelope) "envelope_only"
      else "refused"
    (sniffFormat(payload), outcome)
  }

  /** Deterministic zero-dependency real-format payload builders — tiny
    * valid 16-bit-PCM WAV and 24-bpp BMP byte arrays, so driver-visible
    * queries (q32) exercise the REAL sample-decode path
    * ([[wavPcmStats]]/[[bmpPixelStats]]) on genuine formats, not only
    * the unit specs.
    */
  object Fixtures {

    /** Minimal ISO-BMFF envelope (ftyp + moov{mvhd v0}): the header
      * walk reads a REAL duration, but there is no sample data any
      * codec could decode — the canonical `envelope_only` payload.
      */
    def minimalMp4(timescale: Int, durationTicks: Long): Array[Byte] = {
      def be32(v: Long): Array[Byte] =
        Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
          ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0x200)
      val mvhdPayload = be32(0) ++ // version 0 + flags
        be32(0) ++ be32(0) ++ // creation, modification
        be32(timescale.toLong) ++ be32(durationTicks)
      val mvhd = be32(8L + mvhdPayload.length) ++ "mvhd".getBytes ++ mvhdPayload
      val moov = be32(8L + mvhd.length) ++ "moov".getBytes ++ mvhd
      ftyp ++ moov
    }

    /** One MPEG-1 Layer III sync frame header + zero payload bytes —
      * the sample decode this engine REFUSES (needs a real codec lib).
      */
    def mp3Frame(): Array[Byte] =
      // sync 0xFFE, MPEG-1 layer III, 128 kbps, 44.1 kHz + dead air
      Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte) ++ Array.fill(412)(0.toByte)

    /** H.264 Annex-B start code + an SPS NAL header byte — refused
      * likewise (entropy-coded video needs a real codec lib).
      */
    def h264AnnexB(): Array[Byte] =
      Array(0x00, 0x00, 0x00, 0x01, 0x67).map(_.toByte) ++ Array.fill(32)(0x42.toByte)

    /** `seconds` of an `amp`-full-scale `freq` Hz mono sine at 16 kHz. */
    def sineWav(freq: Int, amp: Double, seconds: Double = 0.25): Array[Byte] = {
      val sr = 16000
      val n = (sr * seconds).toInt
      val out = new java.io.ByteArrayOutputStream(44 + 2 * n)
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
      out.write("RIFF".getBytes); le32(36 + 2 * n); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); le32(16); le16(1); le16(1)
      le32(sr); le32(sr * 2); le16(2); le16(16)
      out.write("data".getBytes); le32(2 * n)
      var i = 0
      while (i < n) {
        le16(math.round(amp * 32767.0 *
          math.sin(2 * math.Pi * freq * i / sr)).toInt & 0xFFFF)
        i += 1
      }
      out.toByteArray
    }

    /** Alternating burst/silence mono WAV at 16 kHz: `freq` Hz sine at
      * `amp` during even `burstMs` windows, digital silence during odd
      * ones — closed-form per-frame expectations when analyzed at a
      * frame length dividing `burstMs` (voiced frames: rms ≈ amp/√2,
      * zcr ≈ 2·freq/rate; silent frames: exactly 0 / 0 / 0).
      */
    def burstWav(freq: Int, amp: Double, seconds: Double = 0.4, burstMs: Int = 100): Array[Byte] = {
      val sr = 16000
      val n = (sr * seconds).toInt
      val out = new java.io.ByteArrayOutputStream(44 + 2 * n)
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
      out.write("RIFF".getBytes); le32(36 + 2 * n); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); le32(16); le16(1); le16(1)
      le32(sr); le32(sr * 2); le16(2); le16(16)
      out.write("data".getBytes); le32(2 * n)
      val perBurst = sr * burstMs / 1000
      var i = 0
      while (i < n) {
        val voiced = (i / perBurst) % 2 == 0
        le16(if (!voiced) 0
        else math.round(amp * 32767.0 *
          math.sin(2 * math.Pi * freq * i / sr)).toInt & 0xFFFF)
        i += 1
      }
      out.toByteArray
    }

    /** `w`×`h` 24-bpp BMP whose red channel ramps left→right and green
      * channel bottom→top (blue constant) — known channel means.
      */
    def gradientBmp(w: Int, h: Int, blue: Int = 32): Array[Byte] = {
      val stride = ((w * 3 + 3) / 4) * 4
      val out = new java.io.ByteArrayOutputStream(54 + stride * h)
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
      out.write("BM".getBytes); le32(54 + stride * h); le32(0); le32(54)
      le32(40); le32(w); le32(h); le16(1); le16(24)
      le32(0); le32(stride * h); le32(2835); le32(2835); le32(0); le32(0)
      // raster is bottom-up rows of B,G,R triples, zero-padded to stride
      val raster = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w) {
        raster(y * stride + 3 * x) = blue.toByte
        raster(y * stride + 3 * x + 1) =
          (if (h == 1) 0 else y * 255 / (h - 1)).toByte
        raster(y * stride + 3 * x + 2) =
          (if (w == 1) 0 else x * 255 / (w - 1)).toByte
      }
      out.write(raster)
      out.toByteArray
    }

    /** `w`×`h` binary PGM (P5, maxval 255) whose gray ramps left→right
      * — known mean: avg of x·255/(w−1) over columns.
      */
    def gradientPgm(w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(32 + w * h)
      out.write(s"P5\n# graft fixture\n$w $h\n255\n".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      for (_ <- 0 until h; x <- 0 until w)
        out.write(if (w == 1) 0 else x * 255 / (w - 1))
      out.toByteArray
    }

    /** `w`×`h` real 8-bit PNG: red ramps left→right, green top→bottom,
      * blue constant (`colorType` 0 = gray of the red ramp, 2 = RGB,
      * 6 = RGBA with opaque alpha). Each scanline is filtered with
      * filter `y % 5`, so decoding the fixture exercises ALL five PNG
      * filter reconstructions (None/Sub/Up/Average/Paeth), not just
      * the trivial one. Chunks carry correct CRCs — this is a valid
      * PNG any external tool opens.
      */
    def gradientPng(w: Int, h: Int, blue: Int = 32, colorType: Int = 2,
        depth: Int = 8): Array[Byte] = {
      require(Set(0, 2, 6).contains(colorType), s"unsupported colorType $colorType")
      require(depth == 8 || depth == 16, s"unsupported depth $depth")
      val channels = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
      // depth 16: each 8-bit sample v becomes the 16-bit v*257 = (v,v)
      // byte pair — the [0,1]-normalized means are IDENTICAL to the
      // 8-bit image's. Scanlines stay filter-0 (filters at bpp=2 are
      // exercised by the ImageIO-encoded cross-check instead).
      val rl = w * channels * (depth / 8)
      // raw scanlines
      def pix(x: Int, y: Int): Seq[Int] = {
        val r = if (w == 1) 0 else x * 255 / (w - 1)
        val g = if (h == 1) 0 else y * 255 / (h - 1)
        colorType match {
          case 0 => Seq(r)
          case 2 => Seq(r, g, blue)
          case _ => Seq(r, g, blue, 255)
        }
      }
      def paeth(a: Int, up: Int, c: Int): Int = {
        val p = a + up - c
        val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
      }
      val filtered = new java.io.ByteArrayOutputStream((rl + 1) * h)
      var prev = new Array[Int](rl)
      for (y <- 0 until h) {
        val cur =
          if (depth == 8) (0 until w).flatMap(x => pix(x, y)).toArray
          else (0 until w).flatMap(x => pix(x, y)).flatMap(v => Seq(v, v)).toArray
        val f = if (depth == 16) 0 else y % 5
        filtered.write(f)
        for (x <- 0 until rl) {
          val a = if (x >= channels) cur(x - channels) else 0
          val up = prev(x)
          val c = if (x >= channels) prev(x - channels) else 0
          val out = f match {
            case 0 => cur(x)
            case 1 => cur(x) - a
            case 2 => cur(x) - up
            case 3 => cur(x) - ((a + up) >> 1)
            case _ => cur(x) - paeth(a, up, c)
          }
          filtered.write(out & 0xFF)
        }
        prev = cur
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(filtered.toByteArray)
      deflater.finish()
      val zbuf = new Array[Byte](filtered.size() + 64)
      val zout = new java.io.ByteArrayOutputStream()
      while (!deflater.finished())
        zout.write(zbuf, 0, deflater.deflate(zbuf))
      deflater.end()

      val out = new java.io.ByteArrayOutputStream()
      def be32(v: Int): Unit = {
        out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
        out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
      }
      def chunk(typ: String, data: Array[Byte]): Unit = {
        be32(data.length)
        val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        be32(crc.getValue.toInt)
      }
      out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      val ihdr = new java.io.ByteArrayOutputStream()
      def ibe32(v: Int): Unit = {
        ihdr.write((v >>> 24) & 0xFF); ihdr.write((v >>> 16) & 0xFF)
        ihdr.write((v >>> 8) & 0xFF); ihdr.write(v & 0xFF)
      }
      ibe32(w); ibe32(h)
      ihdr.write(depth); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
      chunk("IHDR", ihdr.toByteArray)
      chunk("IDAT", zout.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** `w`×`h` real 8-bit PALETTE PNG (color type 3): a 4-entry PLTE
      * (red, green, blue, gray), pixel index = (x + y) % 4, each
      * scanline filtered with `y % 5` — all five filters exercised at
      * bpp = 1. Valid CRCs throughout. `paletteEntries < 4` emits a
      * deliberately SHORT PLTE while pixels still index 0..3 — the
      * index-past-palette refusal fixture.
      */
    def palettePng(w: Int, h: Int, paletteEntries: Int = 4): Array[Byte] = {
      require(paletteEntries >= 1 && paletteEntries <= 4)
      val palette = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 96, 96, 96)
        .take(3 * paletteEntries)
      def paeth(a: Int, up: Int, c: Int): Int = {
        val p = a + up - c
        val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
      }
      val filtered = new java.io.ByteArrayOutputStream((w + 1) * h)
      var prev = new Array[Int](w)
      for (y <- 0 until h) {
        val cur = (0 until w).map(x => (x + y) % 4).toArray
        val f = y % 5
        filtered.write(f)
        for (x <- 0 until w) {
          val a = if (x >= 1) cur(x - 1) else 0
          val up = prev(x)
          val c = if (x >= 1) prev(x - 1) else 0
          val out = f match {
            case 0 => cur(x)
            case 1 => cur(x) - a
            case 2 => cur(x) - up
            case 3 => cur(x) - ((a + up) >> 1)
            case _ => cur(x) - paeth(a, up, c)
          }
          filtered.write(out & 0xFF)
        }
        prev = cur
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(filtered.toByteArray)
      deflater.finish()
      val zbuf = new Array[Byte](filtered.size() + 64)
      val zout = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) zout.write(zbuf, 0, deflater.deflate(zbuf))
      deflater.end()
      val out = new java.io.ByteArrayOutputStream()
      def be32(v: Int): Unit = {
        out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
        out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
      }
      def chunk(typ: String, data: Array[Byte]): Unit = {
        be32(data.length)
        val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        be32(crc.getValue.toInt)
      }
      out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      val ihdr = new java.io.ByteArrayOutputStream()
      def ibe32(v: Int): Unit = {
        ihdr.write((v >>> 24) & 0xFF); ihdr.write((v >>> 16) & 0xFF)
        ihdr.write((v >>> 8) & 0xFF); ihdr.write(v & 0xFF)
      }
      ibe32(w); ibe32(h)
      ihdr.write(8); ihdr.write(3); ihdr.write(0); ihdr.write(0); ihdr.write(0)
      chunk("IHDR", ihdr.toByteArray)
      chunk("PLTE", palette.map(_.toByte))
      chunk("IDAT", zout.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** `w`×`h` binary PPM (P6, maxval 255): red ramps left→right,
      * green ramps top→bottom, blue constant — the [[gradientBmp]]
      * channel-mean profile on the netpbm raster layout.
      */
    def gradientPpm(w: Int, h: Int, blue: Int = 32): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(32 + 3 * w * h)
      out.write(s"P6\n$w $h\n255\n".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      for (y <- 0 until h; x <- 0 until w) {
        out.write(if (w == 1) 0 else x * 255 / (w - 1))
        out.write(if (h == 1) 0 else y * 255 / (h - 1))
        out.write(blue)
      }
      out.toByteArray
    }
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
