package graft.ext

/** Zero-dependency JPEG (JFIF) pixel decode — the dominant crawl image
  * format joining PNG behind the REAL side of the multimodal stub
  * boundary ([[MediaCodec.decodeBytes]]). Implements the public ITU
  * T.81 processes a crawl actually meets:
  *
  *  - **baseline / extended sequential** (SOF0/SOF1): marker walk
  *    (DQT/DHT/DRI/SOS), canonical Huffman entropy decode with byte
  *    un-stuffing and restart markers, dequantization + inverse
  *    zigzag, separable floating IDCT — streamed block by block;
  *  - **progressive** (SOF2, T.81 Annex G): multi-scan coefficient
  *    accumulation — interleaved/single-component DC first+refinement,
  *    per-component AC spectral bands with EOB-run coding, successive-
  *    approximation AC refinement — then one dequantize+IDCT pass at
  *    EOI;
  *
  * with nearest-neighbor chroma upsampling for the standard
  * subsampling layouts and BT.601 YCbCr→RGB. Grayscale (1 component)
  * and YCbCr (3 components) frames; arithmetic coding, hierarchical,
  * 12-bit, and multi-scan SEQUENTIAL files return None and fall to the
  * deterministic stub like any unrecognized payload — the honest
  * boundary.
  *
  * Verified in JpegSpec against the JDK's independent ImageIO codec in
  * both directions (own encoder → ImageIO decode; ImageIO-encoded
  * baseline AND progressive files → own decoder) plus the closed-form
  * gradient round trip.
  */
object JpegCodec {

  /** Zigzag scan order: zigzag index → natural (row-major) position. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** C(u)·cos((2x+1)uπ/16) — the shared 1-D DCT basis, used by both
    * the decoder's IDCT and the fixture encoder's FDCT.
    */
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Decode failure: private control flow — every malformed-stream path
    * lands here and surfaces as None, never an exception to the caller.
    */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  /** Canonical Huffman table (T.81 Annex C): `bits(l-1)` codes of
    * length l, values in code order.
    */
  private final class Huff(bits: Array[Int], val vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxcode(l) = code - 1 // bits==0 → maxcode < mincode → no match
        code <<= 1
        l += 1
      }
      if (k != vals.length) bail()
    }
  }

  /** Entropy-segment bit reader: un-stuffs 0xFF00, stops (bails) at any
    * real marker — restart markers are consumed explicitly by the MCU
    * loop via [[restart]], never mid-block.
    */
  private final class Bits(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) bail()
        var v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) bail()
          val m = b(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed literal 0xFF
          else bail() // marker inside entropy data = truncated scan
        }
        acc = v
        cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align, skip fill bytes, consume one RSTn marker. */
    def restart(): Unit = {
      cnt = 0
      while (pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF &&
        (b(pos + 1) & 0xFF) == 0xFF) pos += 1 // fill
      if (pos + 1 >= b.length || (b(pos) & 0xFF) != 0xFF ||
        (b(pos + 1) & 0xF8) != 0xD0) bail()
      pos += 2
    }
    def decode(t: Huff): Int = {
      var code = nextBit()
      var l = 1
      while (code > t.maxcode(l)) {
        if (l >= 16) bail()
        code = (code << 1) | nextBit()
        l += 1
      }
      t.vals(t.valptr(l) + code - t.mincode(l))
    }
    /** DC-difference / AC-coefficient magnitude decode (T.81 F.2.2.1). */
    def extend(s: Int): Int = {
      if (s == 0) return 0
      val v = receive(s)
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
  }

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  private final case class Comp(id: Int, hi: Int, vi: Int, tq: Int)

  /** Per-channel means of a baseline JPEG, normalized to [0,1]:
    * (meanR, meanG, meanB); grayscale replicates the luma mean. None
    * for anything outside the baseline envelope or malformed streams.
    * The canvas is capped (64 M pixels) so a forged SOF cannot
    * allocation-bomb an executor scanning untrusted crawl bytes.
    */
  def pixelStats(b: Array[Byte]): Option[(Double, Double, Double)] =
    try decode(b)
    catch {
      // Bail = recognized-then-malformed; the index/size guards are
      // belt-and-suspenders for adversarial streams — untrusted crawl
      // bytes must never throw out of the feature head
      case _: Bail | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }

  private def decode(b: Array[Byte]): Option[(Double, Double, Double)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return None
    val qt = new Array[Array[Int]](4)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var restartInterval = 0
    var w = 0; var h = 0
    var comps: Array[Comp] = null
    var progressive = false
    // frame geometry (set at SOF — both paths and the output crop use it)
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0
    var planeW: Array[Int] = null; var planeH: Array[Int] = null
    // progressive coefficient accumulator: per component, one Int per
    // coefficient in ZIGZAG index order per block (quantized domain —
    // successive-approximation bits land on RAW coefficients; the
    // dequantize-and-IDCT pass runs once, after EOI)
    var coefStore: Array[Array[Int]] = null
    var nProgScans = 0
    var sawEoi = false
    var scanStart = -1
    var dcSel: Array[Int] = null
    var acSel: Array[Int] = null

    var i = 2
    while (scanStart < 0 && !sawEoi) {
      if (i + 1 >= b.length) return None
      if ((b(i) & 0xFF) != 0xFF) return None
      val marker = b(i + 1) & 0xFF
      if (marker == 0xFF) { i += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
      else if (marker == 0xD9) {
        // EOI: legal end only after at least one progressive scan
        if (progressive && nProgScans > 0) sawEoi = true else return None
      } else {
        if (i + 3 >= b.length) return None
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        marker match {
          case 0xDB => // DQT: one or more tables
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xF0) >> 4
              val tq = b(p) & 0x0F
              if (tq > 3 || pq > 1) return None
              val n = if (pq == 0) 64 else 128
              if (p + 1 + n > segEnd) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(k) = if (pq == 0) b(p + 1 + k) & 0xFF
                  else be16(b, p + 1 + 2 * k)
                k += 1
              }
              qt(tq) = t
              p += 1 + n
            }
          case 0xC4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xF0) >> 4
              val th = b(p) & 0x0F
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val bits = Array.tabulate(16)(k => b(p + 1 + k) & 0xFF)
              val nv = bits.sum
              if (nv > 256 || p + 17 + nv > segEnd) return None
              val vals = Array.tabulate(nv)(k => b(p + 17 + k) & 0xFF)
              val tbl = new Huff(bits, vals)
              if (tc == 0) dcTab(th) = tbl else acTab(th) = tbl
              p += 17 + nv
            }
          case 0xC0 | 0xC1 | 0xC2 => // sequential Huffman / progressive
            progressive = marker == 0xC2
            if (b(seg) != 8) return None // 12-bit precision unsupported
            h = be16(b, seg + 1)
            w = be16(b, seg + 3)
            val nc = b(seg + 5) & 0xFF
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            // canvas caps before any allocation: sequential streams
            // block-by-block (byte planes only); progressive must hold
            // every raw coefficient until EOI (4 B/sample), so its cap
            // is tighter
            if (w.toLong * h > (1L << 26)) return None // 64 M pixel cap
            if (progressive && w.toLong * h > (1L << 24)) return None
            if (seg + 6 + 3 * nc > segEnd) return None
            comps = Array.tabulate(nc) { c =>
              val p = seg + 6 + 3 * c
              val cc = Comp(b(p) & 0xFF, (b(p + 1) & 0xF0) >> 4,
                b(p + 1) & 0x0F, b(p + 2) & 0xFF)
              if (cc.hi < 1 || cc.hi > 4 || cc.vi < 1 || cc.vi > 4 ||
                cc.tq > 3) return None
              cc
            }
            hmax = comps.map(_.hi).max
            vmax = comps.map(_.vi).max
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            planeW = comps.map(c => mcusX * c.hi * 8)
            planeH = comps.map(c => mcusY * c.vi * 8)
            // cap the PADDED allocation, not only the nominal pixel
            // count: MCU padding scales a degenerate dimension by up
            // to 8·4 per axis (w=1 pads to 32 at 4×4 sampling), and
            // allocation size is Σ planeW·planeH over components —
            // up to 3× full resolution at 4:4:4 — so a forged header
            // could otherwise multiply far past the nominal cap into
            // an OutOfMemoryError no catch list below contains.
            // Budget = 4× the nominal cap per mode: admits every
            // previously-legal image (3 full-res components + padding
            // margin) while bounding what any header can demand.
            val padded = comps.indices
              .map(c => planeW(c).toLong * planeH(c)).sum
            if (padded > (1L << 28)) return None
            if (progressive && padded > (1L << 26)) return None
            if (progressive)
              coefStore = comps.indices.map(c =>
                new Array[Int](planeW(c) * planeH(c))).toArray
          case m if m >= 0xC3 && m <= 0xCF && m != 0xC4 && m != 0xC8 &&
              m != 0xCC =>
            return None // arithmetic / lossless / hierarchical / 12-bit
          case 0xDD =>
            if (len != 4) return None
            restartInterval = be16(b, seg)
          case 0xDA => // SOS
            if (comps == null) return None
            val ns = b(seg) & 0xFF
            if (seg + 1 + 2 * ns + 3 > segEnd) return None
            if (!progressive) {
              // multi-scan sequential (one component per scan) is legal
              // T.81 but rare; only the single interleaved scan every
              // mainstream encoder writes is supported
              if (ns != comps.length) return None
              dcSel = new Array[Int](comps.length)
              acSel = new Array[Int](comps.length)
              var k = 0
              while (k < ns) {
                val cs = b(seg + 1 + 2 * k) & 0xFF
                val ci = comps.indexWhere(_.id == cs)
                if (ci < 0) return None
                dcSel(ci) = (b(seg + 2 + 2 * k) & 0xF0) >> 4
                acSel(ci) = b(seg + 2 + 2 * k) & 0x0F
                k += 1
              }
              scanStart = segEnd
            } else {
              // progressive scan: any subset of components (AC scans
              // exactly one), a spectral band, one approximation step
              if (ns < 1 || ns > comps.length) return None
              val scanCis = new Array[Int](ns)
              val sDc = new Array[Huff](ns)
              val sAc = new Array[Huff](ns)
              var k = 0
              while (k < ns) {
                val cs = b(seg + 1 + 2 * k) & 0xFF
                val ci = comps.indexWhere(_.id == cs)
                if (ci < 0) return None
                scanCis(k) = ci
                sDc(k) = dcTab((b(seg + 2 + 2 * k) & 0xF0) >> 4)
                sAc(k) = acTab(b(seg + 2 + 2 * k) & 0x0F)
                k += 1
              }
              val ss = b(seg + 1 + 2 * ns) & 0xFF
              val se = b(seg + 2 + 2 * ns) & 0xFF
              val ahal = b(seg + 3 + 2 * ns) & 0xFF
              i = progressiveScan(b, segEnd, comps, scanCis, sDc, sAc,
                ss, se, ahal >> 4, ahal & 0x0F, coefStore,
                mcusX, mcusY, hmax, vmax, w, h, restartInterval)
              nProgScans += 1
            }
          case _ => // APPn / COM / DNL etc.: skip
        }
        // the progressive SOS case advances i past its entropy data
        // itself; every other segment advances to its own end
        if (scanStart < 0 && !(progressive && marker == 0xDA)) i = segEnd
      }
    }

    // ---- render ----
    val planes = comps.indices.map(c =>
      new Array[Byte](planeW(c) * planeH(c))).toArray
    comps.foreach { c => if (qt(c.tq) == null) bail() }

    if (progressive) {
      // one dequantize + IDCT pass over the accumulated coefficients
      val cof = new Array[Double](64)
      val tmp = new Array[Double](64)
      var ci = 0
      while (ci < comps.length) {
        val q = qt(comps(ci).tq)
        val store = coefStore(ci)
        val bw = planeW(ci) / 8
        val bh = planeH(ci) / 8
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            val base = (by * bw + bx) * 64
            var k = 0
            while (k < 64) {
              cof(Zigzag(k)) = store(base + k).toDouble * q(k)
              k += 1
            }
            idctToPlane(cof, tmp, planes(ci), planeW(ci), bx * 8, by * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      return Some(channelMeans(planes, comps, planeW, hmax, vmax, w, h))
    }

    val bits = new Bits(b, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)

    def decodeBlock(ci: Int, x0: Int, y0: Int): Unit = {
      val dc = dcTab(dcSel(ci)); val ac = acTab(acSel(ci))
      if (dc == null || ac == null) bail()
      val q = qt(comps(ci).tq)
      java.util.Arrays.fill(coef, 0.0)
      val t = bits.decode(dc)
      if (t > 11) bail()
      pred(ci) += bits.extend(t)
      coef(0) = pred(ci).toDouble * q(0)
      var k = 1
      var open = true
      while (open && k < 64) {
        val rs = bits.decode(ac)
        val r = rs >> 4
        val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else open = false // EOB
        } else {
          k += r
          if (k > 63) bail()
          coef(Zigzag(k)) = bits.extend(s).toDouble * q(k)
          k += 1
        }
      }
      idctToPlane(coef, tmp, planes(ci), planeW(ci), x0, y0)
    }

    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bits.restart()
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var by = 0
          while (by < c.vi) {
            var bx = 0
            while (bx < c.hi) {
              decodeBlock(ci, (mx * c.hi + bx) * 8, (my * c.vi + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    Some(channelMeans(planes, comps, planeW, hmax, vmax, w, h))
  }

  /** Dequantized natural-order coefficients → separable IDCT → samples
    * written into the 8×8 block of `plane` at (x0, y0). Shared by the
    * sequential streaming path and the progressive post-EOI render.
    */
  private def idctToPlane(
      coef: Array[Double], tmp: Array[Double],
      plane: Array[Byte], pw: Int, x0: Int, y0: Int): Unit = {
    // separable IDCT: rows (over u) then columns (over v)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) { sum += CosTab(x)(u) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = sum
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var vv = 0
        while (vv < 8) { sum += CosTab(y)(vv) * tmp(vv * 8 + x); vv += 1 }
        val s0 = math.round(sum / 4.0 + 128.0).toInt
        plane((y0 + y) * pw + x0 + x) =
          (if (s0 < 0) 0 else if (s0 > 255) 255 else s0).toByte
        x += 1
      }
      y += 1
    }
  }

  /** Channel sums over the w×h crop, nearest-neighbor chroma upsample,
    * BT.601 YCbCr→RGB; grayscale replicates luma.
    */
  private def channelMeans(
      planes: Array[Array[Byte]], comps: Array[Comp], planeW: Array[Int],
      hmax: Int, vmax: Int, w: Int, h: Int): (Double, Double, Double) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    if (comps.length == 1) {
      val p = planes(0); val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sr += p(y * pw + x) & 0xFF; x += 1 }
        y += 1
      }
      sg = sr; sb = sr
    } else {
      def sample(ci: Int, x: Int, y: Int): Int = {
        val c = comps(ci)
        val sx = x * c.hi / hmax
        val sy = y * c.vi / vmax
        planes(ci)(sy * planeW(ci) + sx) & 0xFF
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = sample(0, x, y)
          val cb = sample(1, x, y) - 128
          val cr = sample(2, x, y) - 128
          def clamp(v: Double): Int = {
            val r = math.round(v).toInt
            if (r < 0) 0 else if (r > 255) 255 else r
          }
          sr += clamp(yy + 1.402 * cr)
          sg += clamp(yy - 0.344136 * cb - 0.714136 * cr)
          sb += clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    val n = w.toLong * h * 255L
    (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** One progressive scan (T.81 Annex G): decodes the scan's entropy
    * segment into the zigzag-order coefficient store and returns the
    * position of the marker that follows it. Covers all four scan
    * kinds — DC first / DC refinement (interleaved or single-component)
    * and AC first / AC refinement (single-component, with EOB-run
    * coding) — plus restart markers.
    */
  private def progressiveScan(
      b: Array[Byte], start: Int,
      comps: Array[Comp], scanCis: Array[Int],
      sDc: Array[Huff], sAc: Array[Huff],
      ss: Int, se: Int, ah: Int, al: Int,
      coefStore: Array[Array[Int]],
      mcusX: Int, mcusY: Int, hmax: Int, vmax: Int, w: Int, h: Int,
      restartInterval: Int): Int = {
    // scan-header validity (T.81 B.2.3): DC band is exactly [0,0] and
    // may interleave; AC bands live in [1,63] and take ONE component
    if (ss == 0) { if (se != 0) bail() }
    else if (se < ss || se > 63 || scanCis.length != 1) bail()
    if (ah > 13 || al > 13 || (ah != 0 && ah != al + 1)) bail()
    val bits = new Bits(b, start)
    val pred = new Array[Int](scanCis.length)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -(1 << al)

    def correction(store: Array[Int], idx: Int): Unit = {
      val c = store(idx)
      if (bits.nextBit() == 1 && (c & p1) == 0)
        store(idx) = if (c >= 0) c + p1 else c + m1
    }

    def dcFirst(si: Int, store: Array[Int], off: Int): Unit = {
      val huff = sDc(si)
      if (huff == null) bail()
      val t = bits.decode(huff)
      if (t > 11) bail()
      pred(si) += bits.extend(t)
      store(off) = pred(si) << al
    }

    def dcRefine(store: Array[Int], off: Int): Unit =
      if (bits.nextBit() == 1) store(off) |= p1

    def acFirst(store: Array[Int], base: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      val huff = sAc(0)
      if (huff == null) bail()
      var k = ss
      while (k <= se) {
        val rs = bits.decode(huff)
        val r = rs >> 4
        val s = rs & 0x0F
        if (s == 0) {
          if (r < 15) { // EOBn: run of 2^r + ext blocks, this one first
            eobrun = (1 << r) - 1 + (if (r > 0) bits.receive(r) else 0)
            return
          }
          k += 16 // ZRL
        } else {
          k += r
          if (k > se) bail()
          store(base + k) = bits.extend(s) << al
          k += 1
        }
      }
    }

    // T.81 G.1.2.3 (the classic two-phase refinement walk): newly
    // significant coefficients arrive as ±1·2^al after a run of r
    // ZERO-HISTORY positions; every nonzero-history coefficient passed
    // on the way — and the band tail under an EOB run — takes one
    // correction bit.
    def acRefine(store: Array[Int], base: Int): Unit = {
      val huff = sAc(0)
      if (huff == null) bail()
      var k = ss
      if (eobrun == 0) {
        var broke = false
        while (!broke && k <= se) {
          val rs = bits.decode(huff)
          var r = rs >> 4
          val s = rs & 0x0F
          var newval = 0
          if (s == 0) {
            if (r < 15) {
              eobrun = (1 << r) + (if (r > 0) bits.receive(r) else 0)
              broke = true
            }
            // r == 15: ZRL — skip 16 zero-history positions below
          } else {
            if (s != 1) bail() // refinement introduces ±1 only
            newval = if (bits.nextBit() == 1) p1 else m1
          }
          if (!broke) {
            var placed = false
            while (!placed && k <= se) {
              if (store(base + k) != 0) correction(store, base + k)
              else {
                if (r == 0) {
                  if (newval != 0) store(base + k) = newval
                  placed = true
                } else r -= 1
              }
              k += 1
            }
            if (newval != 0 && !placed) bail() // ran off the band
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          if (store(base + k) != 0) correction(store, base + k)
          k += 1
        }
        eobrun -= 1
      }
    }

    def restartIfDue(unit: Int): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        bits.restart()
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }

    if (ss == 0 && scanCis.length > 1) {
      // interleaved DC scan: MCU order over the frame geometry
      var mcu = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          restartIfDue(mcu)
          var si = 0
          while (si < scanCis.length) {
            val ci = scanCis(si)
            val c = comps(ci)
            val rowStride = mcusX * c.hi
            var by = 0
            while (by < c.vi) {
              var bx = 0
              while (bx < c.hi) {
                val off =
                  ((my * c.vi + by) * rowStride + (mx * c.hi + bx)) * 64
                if (ah == 0) dcFirst(si, coefStore(ci), off)
                else dcRefine(coefStore(ci), off)
                bx += 1
              }
              by += 1
            }
            si += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component scan (DC or AC): raster order over the
      // component's own (non-MCU-padded) block grid, T.81 A.2.2
      val ci = scanCis(0)
      val c = comps(ci)
      val bw = ((w * c.hi + hmax - 1) / hmax + 7) / 8
      val bh = ((h * c.vi + vmax - 1) / vmax + 7) / 8
      val rowStride = mcusX * c.hi
      val store = coefStore(ci)
      var unit = 0
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          restartIfDue(unit)
          val off = (by * rowStride + bx) * 64
          if (ss == 0) {
            if (ah == 0) dcFirst(0, store, off) else dcRefine(store, off)
          } else {
            if (ah == 0) acFirst(store, off) else acRefine(store, off)
          }
          unit += 1
          bx += 1
        }
        by += 1
      }
    }

    // byte-align and locate the next marker (fill bytes and any
    // trailing RST are consumed by the caller's marker walk)
    var p = bits.pos
    while (p + 1 < b.length &&
      !((b(p) & 0xFF) == 0xFF && (b(p + 1) & 0xFF) != 0x00)) p += 1
    if (p + 1 >= b.length) bail()
    p
  }

  /** True iff the stream is a JPEG whose frame uses the progressive
    * DCT process (SOF2) — a marker sniff for format accounting
    * ([[MediaCodec.sniffFormat]]); decoding goes through [[pixelStats]].
    */
  def isProgressive(b: Array[Byte]): Boolean = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return false
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return false
      val m = b(i + 1) & 0xFF
      if (m == 0xFF) i += 1
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return false
        if (m == 0xC2) return true
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 &&
          m != 0xCC
        if (isSof || m == 0xDA) return false
        i += 2 + len
      }
    }
    false
  }

  // -------------------------------------------------------------------
  // Deterministic fixture ENCODER — a minimal but standards-valid
  // baseline JFIF writer (T.81 Annex K quantization + Huffman tables),
  // so driver queries and specs exercise the decoder on genuine
  // self-contained files. Correctness does not ride on the Annex K
  // constants being transcribed perfectly (the decoder reads tables
  // from the stream), and JpegSpec closes the self-consistency loop
  // against the JDK's independent ImageIO codec in both directions.
  // -------------------------------------------------------------------

  private val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val QChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChromBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).toArray
  private val AcLumBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)
  private val AcChromBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** (code, length) per symbol from a canonical (bits, vals) table. */
  private def encTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var code = 0
    var k = 0
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) {
        m(vals(k)) = (code, l)
        code += 1
        k += 1
      }
      code <<= 1
    }
    m.toMap
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0
          cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) put(0x7F, 8 - cnt) // pad with 1s
  }

  /** Magnitude category (bit length) of a DC difference / AC value. */
  private def cat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Deterministic fixture builders: `w`×`h` baseline JFIF of the
    * standard gradient (red ramps left→right, green top→bottom, blue
    * constant — the [[MediaCodec.Fixtures]] profile). `mode`: "gray"
    * (single component of the red ramp), "444" (no subsampling), "420"
    * (2×2 chroma subsampling — the dominant layout in the wild).
    */
  object Fixtures {

    /** Gradient Y/Cb/Cr planes for the fixture profile (chroma already
      * downsampled for "420"); (yP, cbD, crD) with null chroma for gray.
      */
    private def gradientPlanes(w: Int, h: Int, blue: Int, mode: String)
        : (Array[Array[Int]], Array[Array[Int]], Array[Array[Int]]) = {
      val gray = mode == "gray"
      val sub = if (mode == "420") 2 else 1
      def red(x: Int) = if (w == 1) 0 else x * 255 / (w - 1)
      def green(y: Int) = if (h == 1) 0 else y * 255 / (h - 1)
      def clamp255(v: Double): Int = {
        val r = math.round(v).toInt
        if (r < 0) 0 else if (r > 255) 255 else r
      }
      val yP = Array.tabulate(h, w) { (y, x) =>
        if (gray) red(x)
        else clamp255(0.299 * red(x) + 0.587 * green(y) + 0.114 * blue)
      }
      val cbP = if (gray) null else Array.tabulate(h, w) { (y, x) =>
        clamp255(128.0 - 0.168736 * red(x) - 0.331264 * green(y) + 0.5 * blue)
      }
      val crP = if (gray) null else Array.tabulate(h, w) { (y, x) =>
        clamp255(128.0 + 0.5 * red(x) - 0.418688 * green(y) - 0.081312 * blue)
      }
      // chroma downsample (mean of the sub×sub cell, edge-clamped)
      def down(p: Array[Array[Int]]): Array[Array[Int]] =
        if (sub == 1) p
        else Array.tabulate((h + 1) / 2, (w + 1) / 2) { (cy, cx) =>
          var s = 0; var n = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val y = cy * 2 + dy; val x = cx * 2 + dx
              if (y < h && x < w) { s += p(y)(x); n += 1 }
              dx += 1
            }
            dy += 1
          }
          (s + n / 2) / n
        }
      (yP, if (gray) null else down(cbP), if (gray) null else down(crP))
    }

    /** FDCT + quantization of the 8×8 block at (x0, y0), edge-replicated
      * past the plane border; quantized coefficients in ZIGZAG order.
      */
    private def fdctQuantZz(
        plane: Array[Array[Int]], x0: Int, y0: Int,
        q: Array[Int]): Array[Int] = {
      val block = new Array[Double](64)
      val tmp2 = new Array[Double](64)
      val fdct = new Array[Double](64)
      val ph = plane.length; val pw = plane(0).length
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val sy = math.min(y0 + y, ph - 1)
          val sx = math.min(x0 + x, pw - 1)
          block(y * 8 + x) = plane(sy)(sx) - 128.0
          x += 1
        }
        y += 1
      }
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var sum = 0.0
          var x = 0
          while (x < 8) { sum += CosTab(x)(u) * block(v * 8 + x); x += 1 }
          tmp2(v * 8 + u) = sum
          u += 1
        }
        v += 1
      }
      var u = 0
      while (u < 8) {
        var vv = 0
        while (vv < 8) {
          var sum = 0.0
          var y2 = 0
          while (y2 < 8) { sum += CosTab(y2)(vv) * tmp2(y2 * 8 + u); y2 += 1 }
          fdct(vv * 8 + u) = sum / 4.0
          vv += 1
        }
        u += 1
      }
      Array.tabulate(64)(k =>
        math.round(fdct(Zigzag(k)) / q(Zigzag(k))).toInt)
    }

    def gradientJpeg(w: Int, h: Int, blue: Int = 32, mode: String = "420"): Array[Byte] = {
      require(Set("gray", "444", "420").contains(mode), s"unsupported mode $mode")
      require(w > 0 && h > 0 && w <= 4096 && h <= 4096, s"bad dims ${w}x$h")
      val gray = mode == "gray"
      val sub = if (mode == "420") 2 else 1
      val (yP, cbD, crD) = gradientPlanes(w, h, blue, mode)

      val entropy = new java.io.ByteArrayOutputStream()
      val bw = new BitWriter(entropy)
      val dcLum = encTable(DcLumBits, DcLumVals)
      val acLum = encTable(AcLumBits, AcLumVals)
      val dcChrom = encTable(DcChromBits, DcChromVals)
      val acChrom = encTable(AcChromBits, AcChromVals)

      def encodeBlock(plane: Array[Array[Int]], x0: Int, y0: Int, q: Array[Int],
          dc: Map[Int, (Int, Int)], ac: Map[Int, (Int, Int)], pred: Int): Int = {
        // quantized in zigzag order: the quantizer for zigzag index k is
        // the NATURAL-order table entry at Zigzag(k), matching how DQT
        // serializes (zigzag) — the decoder and every external reader
        // multiply zigzag coefficient k by DQT entry k
        val zz = fdctQuantZz(plane, x0, y0, q)
        var k = 0
        // DC
        val diff = zz(0) - pred
        val s = cat(diff)
        val (c0, l0) = dc(s)
        bw.put(c0, l0)
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        // AC run-length
        var run = 0
        k = 1
        while (k < 64) {
          if (zz(k) == 0) run += 1
          else {
            while (run > 15) { val (cz, lz) = ac(0xF0); bw.put(cz, lz); run -= 16 }
            val sa = cat(zz(k))
            val (ca, la) = ac((run << 4) | sa)
            bw.put(ca, la)
            bw.put(if (zz(k) < 0) zz(k) + (1 << sa) - 1 else zz(k), sa)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ce, le) = ac(0x00); bw.put(ce, le) }
        zz(0)
      }

      // MCU loop
      val hY = if (gray) 1 else sub
      val mcuW = 8 * hY; val mcuH = 8 * hY
      val mcusX = (w + mcuW - 1) / mcuW
      val mcusY = (h + mcuH - 1) / mcuH
      var predY = 0; var predCb = 0; var predCr = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var by = 0
          while (by < hY) {
            var bx = 0
            while (bx < hY) {
              predY = encodeBlock(yP, (mx * hY + bx) * 8, (my * hY + by) * 8,
                QLum, dcLum, acLum, predY)
              bx += 1
            }
            by += 1
          }
          if (!gray) {
            predCb = encodeBlock(cbD, mx * 8, my * 8, QChrom, dcChrom, acChrom, predCb)
            predCr = encodeBlock(crD, mx * 8, my * 8, QChrom, dcChrom, acChrom, predCr)
          }
          mx += 1
        }
        my += 1
      }
      bw.flush()

      // assemble the file
      val out = new java.io.ByteArrayOutputStream()
      def m16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
      def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
      marker(0xD8) // SOI
      marker(0xE0); m16(16) // APP0 JFIF
      out.write("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.write(0); out.write(1); out.write(1); out.write(0)
      m16(1); m16(1); out.write(0); out.write(0)
      def dqt(tq: Int, q: Array[Int]): Unit = {
        marker(0xDB); m16(67); out.write(tq)
        var k = 0
        while (k < 64) { out.write(q(Zigzag(k))); k += 1 } // zigzag order
      }
      dqt(0, QLum)
      if (!gray) dqt(1, QChrom)
      marker(0xC0) // SOF0
      val nc = if (gray) 1 else 3
      m16(8 + 3 * nc); out.write(8); m16(h); m16(w); out.write(nc)
      out.write(1); out.write((hY << 4) | hY); out.write(0) // Y
      if (!gray) {
        out.write(2); out.write(0x11); out.write(1) // Cb
        out.write(3); out.write(0x11); out.write(1) // Cr
      }
      def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
        marker(0xC4); m16(19 + vals.length); out.write((tc << 4) | th)
        bits.foreach(out.write); vals.foreach(out.write)
      }
      dht(0, 0, DcLumBits, DcLumVals)
      dht(1, 0, AcLumBits, AcLumVals)
      if (!gray) {
        dht(0, 1, DcChromBits, DcChromVals)
        dht(1, 1, AcChromBits, AcChromVals)
      }
      marker(0xDA) // SOS
      m16(6 + 2 * nc); out.write(nc)
      out.write(1); out.write(0x00)
      if (!gray) { out.write(2); out.write(0x11); out.write(3); out.write(0x11) }
      out.write(0); out.write(63); out.write(0) // Ss/Se/Ah-Al
      entropy.writeTo(out)
      marker(0xD9) // EOI
      out.toByteArray
    }

    /** Progressive (SOF2) twin of [[gradientJpeg]]: the same gradient,
      * quantizers, and Huffman tables, laid out as a spectral-selection
      * scan script — one interleaved DC scan, then per-component AC
      * bands [1,5] and [6,63] (Ah=Al=0 throughout; EOB coded as an
      * EOB-run of one). Deterministic and self-contained like every
      * fixture here; successive-approximation scans are exercised via
      * ImageIO-ENCODED progressive files in JpegSpec (the JDK writer
      * emits the standard libjpeg refinement script).
      */
    def gradientJpegProgressive(
        w: Int, h: Int, blue: Int = 32, mode: String = "420"): Array[Byte] = {
      require(Set("gray", "444", "420").contains(mode), s"unsupported mode $mode")
      require(w > 0 && h > 0 && w <= 4096 && h <= 4096, s"bad dims ${w}x$h")
      val gray = mode == "gray"
      val (yP, cbD, crD) = gradientPlanes(w, h, blue, mode)
      val hY = if (gray) 1 else if (mode == "420") 2 else 1
      val mcusX = (w + 8 * hY - 1) / (8 * hY)
      val mcusY = (h + 8 * hY - 1) / (8 * hY)
      val nc = if (gray) 1 else 3
      // per component: (plane, quant, hi=vi, padded block grid,
      // non-padded block grid — AC scans traverse the latter, T.81 A.2.2)
      val planes = if (gray) Array(yP) else Array(yP, cbD, crD)
      val qs = if (gray) Array(QLum) else Array(QLum, QChrom, QChrom)
      val hv = if (gray) Array(1) else Array(hY, 1, 1)
      val padW = Array.tabulate(nc)(c => mcusX * hv(c))
      val padH = Array.tabulate(nc)(c => mcusY * hv(c))
      val niW = Array.tabulate(nc)(c => ((w * hv(c) + hY - 1) / hY + 7) / 8)
      val niH = Array.tabulate(nc)(c => ((h * hv(c) + hY - 1) / hY + 7) / 8)
      // quantized zigzag coefficients for every block of the padded grid
      val zz = Array.tabulate(nc)(c =>
        Array.tabulate(padH(c), padW(c))((by, bx) =>
          fdctQuantZz(planes(c), bx * 8, by * 8, qs(c))))

      val dcEnc = Array.tabulate(nc)(c =>
        if (c == 0) encTable(DcLumBits, DcLumVals)
        else encTable(DcChromBits, DcChromVals))
      val acEnc = Array.tabulate(nc)(c =>
        if (c == 0) encTable(AcLumBits, AcLumVals)
        else encTable(AcChromBits, AcChromVals))

      // ---- scan 1: interleaved DC, all components ----
      val dcBytes = new java.io.ByteArrayOutputStream()
      locally {
        val bw = new BitWriter(dcBytes)
        val pred = new Array[Int](nc)
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            var c = 0
            while (c < nc) {
              var by = 0
              while (by < hv(c)) {
                var bx = 0
                while (bx < hv(c)) {
                  val v = zz(c)(my * hv(c) + by)(mx * hv(c) + bx)(0)
                  val diff = v - pred(c)
                  pred(c) = v
                  val s = cat(diff)
                  val (c0, l0) = dcEnc(c)(s)
                  bw.put(c0, l0)
                  if (s > 0)
                    bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
                  bx += 1
                }
                by += 1
              }
              c += 1
            }
            mx += 1
          }
          my += 1
        }
        bw.flush()
      }

      // ---- AC band scan for one component over its non-padded grid ----
      def acScan(c: Int, ss: Int, se: Int): Array[Byte] = {
        val out2 = new java.io.ByteArrayOutputStream()
        val bw = new BitWriter(out2)
        var by = 0
        while (by < niH(c)) {
          var bx = 0
          while (bx < niW(c)) {
            val blk = zz(c)(by)(bx)
            var last = se
            while (last >= ss && blk(last) == 0) last -= 1
            var run = 0
            var k = ss
            while (k <= last) {
              if (blk(k) == 0) run += 1
              else {
                while (run > 15) {
                  val (cz, lz) = acEnc(c)(0xF0); bw.put(cz, lz); run -= 16
                }
                val s = cat(blk(k))
                val (ca, la) = acEnc(c)((run << 4) | s)
                bw.put(ca, la)
                bw.put(if (blk(k) < 0) blk(k) + (1 << s) - 1 else blk(k), s)
                run = 0
              }
              k += 1
            }
            if (last < se) { // EOB: an EOB-run of exactly one block
              val (ce, le) = acEnc(c)(0x00); bw.put(ce, le)
            }
            bx += 1
          }
          by += 1
        }
        bw.flush()
        out2.toByteArray
      }

      // ---- file assembly ----
      val out = new java.io.ByteArrayOutputStream()
      def m16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
      def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
      marker(0xD8)
      marker(0xE0); m16(16)
      out.write("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.write(0); out.write(1); out.write(1); out.write(0)
      m16(1); m16(1); out.write(0); out.write(0)
      def dqt(tq: Int, q: Array[Int]): Unit = {
        marker(0xDB); m16(67); out.write(tq)
        var k = 0
        while (k < 64) { out.write(q(Zigzag(k))); k += 1 }
      }
      dqt(0, QLum)
      if (!gray) dqt(1, QChrom)
      marker(0xC2) // SOF2: progressive DCT, Huffman
      m16(8 + 3 * nc); out.write(8); m16(h); m16(w); out.write(nc)
      out.write(1); out.write((hY << 4) | hY); out.write(0)
      if (!gray) {
        out.write(2); out.write(0x11); out.write(1)
        out.write(3); out.write(0x11); out.write(1)
      }
      def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
        marker(0xC4); m16(19 + vals.length); out.write((tc << 4) | th)
        bits.foreach(out.write); vals.foreach(out.write)
      }
      dht(0, 0, DcLumBits, DcLumVals)
      dht(1, 0, AcLumBits, AcLumVals)
      if (!gray) {
        dht(0, 1, DcChromBits, DcChromVals)
        dht(1, 1, AcChromBits, AcChromVals)
      }
      def sos(comps: Seq[Int], ss: Int, se: Int, entropy: Array[Byte]): Unit = {
        marker(0xDA)
        m16(6 + 2 * comps.length)
        out.write(comps.length)
        comps.foreach { c =>
          out.write(c + 1) // component id
          val td = if (c == 0) 0 else 1
          out.write((td << 4) | td)
        }
        out.write(ss); out.write(se); out.write(0) // Ah=Al=0
        out.write(entropy, 0, entropy.length)
      }
      sos(0 until nc, 0, 0, dcBytes.toByteArray)
      for (c <- 0 until nc; (ss, se) <- Seq((1, 5), (6, 63)))
        sos(Seq(c), ss, se, acScan(c, ss, se))
      marker(0xD9)
      out.toByteArray
    }
  }
}
