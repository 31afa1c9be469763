package graft.ext

/** Zero-dependency GIF pixel decode — the last of the three dominant
  * crawl image formats (JPEG/PNG/GIF) joins the REAL side of the
  * multimodal stub boundary. Implements the public GIF87a/89a spec:
  * logical-screen + global/local color tables, extension-block
  * skipping, and the GIF variant of LZW (LSB-first bit packing across
  * 255-byte sub-blocks, growing code width to 12 bits, clear/end
  * codes). Decodes the FIRST image of the stream (for animated GIFs
  * that is the first frame); channel means are taken over that frame's
  * pixels. Interlaced frames need no deinterlacing — a mean is
  * pixel-order-independent, so the four-pass row shuffle is
  * irrelevant. A transparent index (GCE) still resolves to its palette
  * color, consistent with PNG/alpha handling (alpha never enters the
  * means).
  *
  * Verified in GifSpec against the closed-form fixture distribution
  * AND against the JDK's independent ImageIO GIF codec in both
  * directions (ImageIO's writer emits real variable-width LZW, so the
  * decoder's table-growth path runs against foreign bytes).
  */
object GifCodec {

  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** Per-channel means of the first frame, normalized to [0,1]; None
    * for non-GIF payloads, malformed streams, frames with no color
    * table, out-of-palette indices, or frames past the 64 M pixel cap.
    */
  def pixelStats(b: Array[Byte]): Option[(Double, Double, Double)] =
    try decode(b)
    catch {
      case _: Bail | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }

  private def decode(b: Array[Byte]): Option[(Double, Double, Double)] = {
    if (b.length < 14 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != '8' || (b(4) != '7' && b(4) != '9') || b(5) != 'a') return None
    val flags = b(10) & 0xFF
    var i = 13
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 3 * (1 << ((flags & 0x07) + 1))
      if (i + n > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, i, i + n)
      i += n
    }
    // block walk to the first image descriptor
    while (true) {
      if (i >= b.length) return None
      (b(i) & 0xFF) match {
        case 0x21 => // extension: label byte + data sub-blocks
          i += 2
          while ({ if (i >= b.length) return None; b(i) != 0 })
            i += 1 + (b(i) & 0xFF)
          i += 1
        case 0x2C =>
          val iw = le16(b, i + 5)
          val ih = le16(b, i + 7)
          val iflags = b(i + 9) & 0xFF
          i += 10
          var table = gct
          if ((iflags & 0x80) != 0) {
            val n = 3 * (1 << ((iflags & 0x07) + 1))
            if (i + n > b.length) return None
            table = java.util.Arrays.copyOfRange(b, i, i + n)
            i += n
          }
          if (table == null || iw <= 0 || ih <= 0) return None
          if (iw.toLong * ih > (1L << 26)) return None // 64 M pixel cap
          return Some(frameMeans(b, i, iw, ih, table))
        case 0x3B => return None // trailer before any image
        case _ => return None
      }
    }
    None // unreachable
  }

  /** LZW-decode the frame's index stream and fold the palette sums. */
  private def frameMeans(
      b: Array[Byte], start: Int, iw: Int, ih: Int,
      table: Array[Byte]): (Double, Double, Double) = {
    val mcs = b(start) & 0xFF
    if (mcs < 2 || mcs > 8) bail()
    // concatenate data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var i = start + 1
    while ({ if (i >= b.length) bail(); b(i) != 0 }) {
      val n = b(i) & 0xFF
      if (i + 1 + n > b.length) bail()
      data.write(b, i + 1, n)
      i += 1 + n
    }
    val d = data.toByteArray
    val nColors = table.length / 3
    val total = iw.toLong * ih

    // LSB-first bit reader over d
    var pos = 0
    var acc = 0
    var nbits = 0
    def read(width: Int): Int = {
      while (nbits < width) {
        if (pos >= d.length) bail()
        acc |= (d(pos) & 0xFF) << nbits
        nbits += 8
        pos += 1
      }
      val v = acc & ((1 << width) - 1)
      acc >>>= width
      nbits -= width
      v
    }

    val clear = 1 << mcs
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = end + 1
    var codeSize = mcs + 1
    var prev = -1
    var emitted = 0L
    var sr = 0L; var sg = 0L; var sb = 0L

    def emitIndex(idx: Int): Unit = {
      if (idx >= nColors) bail() // index past the color table
      if (emitted < total) {
        sr += table(3 * idx) & 0xFF
        sg += table(3 * idx + 1) & 0xFF
        sb += table(3 * idx + 2) & 0xFF
        emitted += 1
      }
    }
    // expand a code's byte chain (root-first) via a temp stack
    val stack = new Array[Byte](4096)
    def emitCode(code: Int): Byte = {
      var sp = 0
      var c = code
      while (c >= clear) { // dictionary entry: walk the prefix chain
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      val first = c.toByte
      emitIndex(c)
      while (sp > 0) { sp -= 1; emitIndex(stack(sp) & 0xFF) }
      first
    }

    var done = false
    while (!done && emitted < total) {
      val code = read(codeSize)
      if (code == clear) {
        next = end + 1
        codeSize = mcs + 1
        prev = -1
      } else if (code == end) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) bail() // first code after clear must be a root
        emitIndex(code)
        prev = code
      } else {
        var firstByte: Byte = 0
        if (code < next && code != clear && code != end) {
          firstByte = emitCode(code)
        } else if (code == next) {
          // KwKwK: the not-yet-defined code = prev's chain + its first byte
          var sp = 0
          var c = prev
          while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
          firstByte = c.toByte
          emitIndex(c)
          while (sp > 0) { sp -= 1; emitIndex(stack(sp) & 0xFF) }
          emitIndex(firstByte & 0xFF)
        } else bail()
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = firstByte
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (emitted < total) bail() // stream ended short of the frame
    val n = total * 255L
    (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Deterministic fixture: `w`×`h` GIF89a with the palettePng profile
    * (4-entry table: red/green/blue/gray, pixel = (x+y)%4), written
    * with the classic "uncompressed GIF" technique — a CLEAR code
    * before every pixel code keeps the dictionary empty so every code
    * stays `mcs+1` bits wide. A valid file any external reader opens
    * (GifSpec feeds it to ImageIO).
    */
  object Fixtures {
    def gradientGif(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0 && w <= 4096 && h <= 4096)
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      le16(w); le16(h)
      out.write(0x80 | 0x01) // GCT present, 2^(1+1) = 4 entries
      out.write(0); out.write(0) // background, aspect
      Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 96, 96, 96).foreach(out.write)
      out.write(0x2C) // image descriptor
      le16(0); le16(0); le16(w); le16(h); out.write(0) // no LCT, no interlace
      val mcs = 2
      out.write(mcs)
      // bit-pack (clear, pixel) pairs LSB-first at a fixed 3-bit width
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0
      var nb = 0
      def put(code: Int): Unit = {
        acc |= code << nb
        nb += mcs + 1
        while (nb >= 8) { bits.write(acc & 0xFF); acc >>>= 8; nb -= 8 }
      }
      val clear = 1 << mcs
      for (y <- 0 until h; x <- 0 until w) { put(clear); put((x + y) % 4) }
      put(clear + 1) // end
      if (nb > 0) bits.write(acc & 0xFF)
      val payload = bits.toByteArray
      var off = 0
      while (off < payload.length) { // ≤255-byte sub-blocks
        val n = math.min(255, payload.length - off)
        out.write(n)
        out.write(payload, off, n)
        off += n
      }
      out.write(0) // block terminator
      out.write(0x3B) // trailer
      out.toByteArray
    }
  }
}
