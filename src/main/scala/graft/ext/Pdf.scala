package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PDF text extraction — the last large crawl format the corpus
  * pipeline could not open (HTML: [[TextPipeline.extractText]], WARC:
  * [[Warc.parseRecords]]; PDF bodies arrive inside both). Zero
  * dependencies: FlateDecode rides the same `java.util.zip.Inflater`
  * the PNG decoder uses, and the object walk is structure-driven (xref
  * table → object offsets → /Root → page tree → content streams), never
  * a magic-scan for `obj` — a content stream that embeds literal
  * `"endobj"` or `"%PDF-"` bytes cannot confuse it (the [[Warc]]
  * length-walk principle applied to PDF).
  *
  * Honest-refusal boundary (the [[JpegCodec]] precedent — refuse
  * loudly, never emit garbage):
  *  - encrypted documents (`/Encrypt` in the trailer) → `encrypted`
  *  - cross-reference STREAMS (PDF 1.5 compressed xref, `/Type/XRef`)
  *    and object streams → `xref_stream` (the classic xref table is
  *    what the fixture and the long tail of generated PDFs use)
  *  - filters other than none / `/FlateDecode` (DCT, LZW, ASCII85…) →
  *    per-page `filter:<name>`
  *  - text shown through composite (Type0/CID) fonts is NOT remapped:
  *    extraction is byte-level, decoded as UTF-8 with Latin-1 fallback
  *    — correct for the simple single-byte fonts that dominate
  *    machine-generated Latin-text PDFs, documented-wrong for CJK CID
  *    streams (those need CMap tables, out of scope).
  *
  * Shape at scale: files are the unit of parallelism (binaryFile scan →
  * one row per PDF), parsing is per-payload CPU in a typed flatMap —
  * no shuffle, no plan surface, page rows stream narrow downstream
  * (the [[Multimodal.decodeFeatures]] / [[Warc.parseRecords]] class).
  * A single PDF must fit an Array[Byte] (< 2 GiB) — same boundary as
  * WARC, same escape hatch (streaming reader) if ever hit.
  */
object Pdf {

  /** One extracted page. Refusals surface as a single row per file
    * with `page = -1`, `text = null` and the reason in `refused` —
    * never a silent empty result.
    */
  final case class PdfPage(
      file_id: String,
      n_pages: Int,
      page: Int, // 1-based; -1 on refusal
      n_chars: Int,
      text: String,
      refused: String) // null on success

  private val Latin = java.nio.charset.StandardCharsets.ISO_8859_1
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  // -------------------------------------------------------------------
  // Minimal object model + tokenizer. PDF objects: numbers, names,
  // strings, arrays, dicts, booleans/null, indirect refs `N G R`,
  // streams. Only what the page-tree walk needs.
  // -------------------------------------------------------------------

  private sealed trait Obj
  private final case class PNum(v: Double) extends Obj
  private final case class PName(v: String) extends Obj
  private final case class PStr(bytes: Array[Byte]) extends Obj
  private final case class PArr(items: Vector[Obj]) extends Obj
  private final case class PDict(m: Map[String, Obj]) extends Obj
  private final case class PRef(num: Int, gen: Int) extends Obj
  private case object PNull extends Obj

  /** Tokenizing cursor over the raw bytes. */
  private final class Lexer(val b: Array[Byte], var i: Int) {
    def ws(): Unit = {
      while (i < b.length && (b(i) == ' ' || b(i) == '\r' || b(i) == '\n' ||
        b(i) == '\t' || b(i) == '\f' || b(i) == 0 || b(i) == '%')) {
        if (b(i) == '%') { // comment to EOL
          while (i < b.length && b(i) != '\r' && b(i) != '\n') i += 1
        } else i += 1
      }
    }
    def peek: Int = if (i < b.length) b(i) & 0xff else -1
    def startsWith(s: String): Boolean = {
      val n = s.length
      if (i + n > b.length) return false
      var k = 0
      while (k < n) { if (b(i + k) != s.charAt(k)) return false; k += 1 }
      true
    }
    def expect(s: String): Boolean = { if (startsWith(s)) { i += s.length; true } else false }
  }

  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'
  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == '\f' || c == 0

  private def parseName(lx: Lexer): PName = {
    lx.i += 1 // '/'
    val sb = new StringBuilder
    while (lx.peek >= 0 && !isWs(lx.peek) && !isDelim(lx.peek)) {
      if (lx.peek == '#' && lx.i + 2 < lx.b.length) {
        val hex = new String(lx.b, lx.i + 1, 2, Latin)
        sb.append(Integer.parseInt(hex, 16).toChar); lx.i += 3
      } else { sb.append(lx.peek.toChar); lx.i += 1 }
    }
    PName(sb.toString)
  }

  /** Literal string `( ... )`: balanced parens, backslash escapes
    * (\n \r \t \b \f \( \) \\ \ddd, line-continuation). Returns raw
    * BYTES — encoding is the caller's concern.
    */
  private def parseLiteralString(lx: Lexer): PStr = {
    lx.i += 1 // '('
    val out = new java.io.ByteArrayOutputStream()
    var depth = 1
    while (depth > 0 && lx.i < lx.b.length) {
      val c = lx.b(lx.i) & 0xff
      if (c == '\\' && lx.i + 1 < lx.b.length) {
        val e = lx.b(lx.i + 1) & 0xff
        lx.i += 2
        e match {
          case 'n' => out.write('\n')
          case 'r' => out.write('\r')
          case 't' => out.write('\t')
          case 'b' => out.write('\b')
          case 'f' => out.write('\f')
          case '(' => out.write('(')
          case ')' => out.write(')')
          case '\\' => out.write('\\')
          case '\r' => if (lx.peek == '\n') lx.i += 1 // line continuation
          case '\n' => // line continuation
          case d if d >= '0' && d <= '7' =>
            var v = d - '0'
            var k = 0
            while (k < 2 && lx.peek >= '0' && lx.peek <= '7') {
              v = v * 8 + (lx.peek - '0'); lx.i += 1; k += 1
            }
            out.write(v & 0xff)
          case other => out.write(other) // unknown escape: the char itself
        }
      } else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        if (depth > 0) out.write(c)
        lx.i += 1
      }
    }
    PStr(out.toByteArray)
  }

  private def parseHexString(lx: Lexer): PStr = {
    lx.i += 1 // '<'
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    while (lx.i < lx.b.length && lx.b(lx.i) != '>') {
      val c = lx.b(lx.i) & 0xff
      val d = Character.digit(c, 16)
      if (d >= 0) { if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 } }
      lx.i += 1
    }
    if (hi >= 0) out.write(hi * 16) // odd digit: trailing 0 per spec
    lx.i += 1 // '>'
    PStr(out.toByteArray)
  }

  /** One object at the cursor. `refOk` enables `N G R` lookahead (off
    * inside content streams, where bare integers are operands).
    */
  private def parseObj(lx: Lexer, refOk: Boolean = true): Obj = {
    lx.ws()
    lx.peek match {
      case '/' => parseName(lx)
      case '(' => parseLiteralString(lx)
      case '[' =>
        lx.i += 1
        val items = Vector.newBuilder[Obj]
        lx.ws()
        while (lx.peek != ']' && lx.peek >= 0) { items += parseObj(lx, refOk); lx.ws() }
        lx.i += 1
        PArr(items.result())
      case '<' =>
        if (lx.startsWith("<<")) {
          lx.i += 2
          val m = Map.newBuilder[String, Obj]
          lx.ws()
          while (!lx.startsWith(">>") && lx.peek >= 0) {
            val k = parseObj(lx, refOk)
            val v = parseObj(lx, refOk)
            k match { case PName(n) => m += n -> v; case _ => }
            lx.ws()
          }
          lx.i += 2
          PDict(m.result())
        } else parseHexString(lx)
      case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
        val start = lx.i
        lx.i += 1
        while (lx.peek >= 0 && !isWs(lx.peek) && !isDelim(lx.peek)) lx.i += 1
        val tok = new String(lx.b, start, lx.i - start, Latin)
        val num = tok.toDoubleOption.getOrElse(0.0)
        if (refOk && num >= 0 && num == num.floor) {
          // `N G R` lookahead without consuming on mismatch
          val save = lx.i
          lx.ws()
          val gStart = lx.i
          if (lx.peek >= '0' && lx.peek <= '9') {
            while (lx.peek >= '0' && lx.peek <= '9') lx.i += 1
            val gen = new String(lx.b, gStart, lx.i - gStart, Latin).toInt
            lx.ws()
            if (lx.peek == 'R' &&
              (lx.i + 1 >= lx.b.length || isWs(lx.b(lx.i + 1) & 0xff) || isDelim(lx.b(lx.i + 1) & 0xff))) {
              lx.i += 1
              return PRef(num.toInt, gen)
            }
          }
          lx.i = save
        }
        PNum(num)
      case _ =>
        if (lx.expect("true") || lx.expect("false") || lx.expect("null")) PNull
        else { lx.i += 1; PNull } // skip unknown byte; malformed input
    }
  }

  // -------------------------------------------------------------------
  // Document structure: xref table → objects → page tree.
  // -------------------------------------------------------------------

  private final class Refused(val reason: String) extends Exception(reason)

  private def lastIndexOf(b: Array[Byte], s: String): Int = {
    val pat = s.getBytes(Latin)
    var i = b.length - pat.length
    while (i >= 0) {
      var k = 0
      while (k < pat.length && b(i + k) == pat(k)) k += 1
      if (k == pat.length) return i
      i -= 1
    }
    -1
  }

  /** Classic xref table(s) at `off` (+ /Prev chain) → (objnum →
    * offset), plus the merged trailer dict. Xref streams refuse.
    */
  private def readXref(b: Array[Byte], off: Int): (Map[Int, Int], Map[String, Obj]) = {
    var offsets = Map.empty[Int, Int]
    var trailer = Map.empty[String, Obj]
    var next = off
    var guard = 0
    while (next >= 0 && guard < 64) {
      guard += 1
      val lx = new Lexer(b, next)
      lx.ws()
      if (!lx.expect("xref")) throw new Refused("xref_stream")
      lx.ws()
      while (lx.peek >= '0' && lx.peek <= '9') {
        // subsection header: `first count`
        val first = parseObj(lx, refOk = false) match { case PNum(v) => v.toInt; case _ => 0 }
        val count = parseObj(lx, refOk = false) match { case PNum(v) => v.toInt; case _ => 0 }
        lx.ws()
        var k = 0
        while (k < count) {
          // fixed 20-byte entries: `oooooooooo ggggg n\r\n`
          val entry = new String(b, lx.i, 18, Latin)
          if (entry.charAt(17) == 'n') {
            val objNum = first + k
            if (!offsets.contains(objNum)) // first xref in chain wins
              offsets += objNum -> entry.substring(0, 10).trim.toInt
          }
          lx.i += 20
          k += 1
        }
        lx.ws()
      }
      if (!lx.expect("trailer")) throw new Refused("malformed_trailer")
      parseObj(lx) match {
        case PDict(m) =>
          m.foreach { case (k, v) => if (!trailer.contains(k)) trailer += k -> v }
          next = m.get("Prev") match { case Some(PNum(v)) => v.toInt; case _ => -1 }
        case _ => throw new Refused("malformed_trailer")
      }
    }
    (offsets, trailer)
  }

  /** Parse the indirect object at `off`; streams return (dict, data). */
  private def objAt(b: Array[Byte], off: Int): (Obj, Option[(PDict, Int)]) = {
    val lx = new Lexer(b, off)
    lx.ws()
    parseObj(lx, refOk = false) // obj number
    parseObj(lx, refOk = false) // generation
    lx.ws()
    if (!lx.expect("obj")) throw new Refused("malformed_object")
    val value = parseObj(lx)
    lx.ws()
    if (lx.startsWith("stream")) {
      lx.i += "stream".length
      if (lx.peek == '\r') lx.i += 1
      if (lx.peek == '\n') lx.i += 1
      value match {
        case d: PDict => (value, Some((d, lx.i)))
        case _ => throw new Refused("malformed_stream")
      }
    } else (value, None)
  }

  private final class Doc(val bytes: Array[Byte], val offsets: Map[Int, Int]) {
    private val cache = scala.collection.mutable.Map.empty[Int, (Obj, Option[(PDict, Int)])]
    def resolve(o: Obj): Obj = o match {
      case PRef(n, _) => resolve(obj(n)._1)
      case other => other
    }
    def obj(num: Int): (Obj, Option[(PDict, Int)]) =
      cache.getOrElseUpdate(num,
        offsets.get(num) match {
          case Some(off) => objAt(bytes, off)
          case None => (PNull, None)
        })
    def dict(o: Obj): Map[String, Obj] = resolve(o) match {
      case PDict(m) => m
      case _ => Map.empty
    }
    def num(o: Obj): Option[Int] = resolve(o) match {
      case PNum(v) => Some(v.toInt)
      case _ => None
    }
  }

  /** Decode one content stream: /Length (possibly indirect), then the
    * filter chain — none or FlateDecode only, everything else refuses
    * with the filter's name.
    */
  private def streamData(doc: Doc, streamObjNum: Int): Array[Byte] = {
    val (_, s) = doc.obj(streamObjNum)
    val (d, dataOff) = s.getOrElse(throw new Refused("not_a_stream"))
    val len = doc.num(d.m.getOrElse("Length", PNull))
      .getOrElse(throw new Refused("missing_length"))
    val raw = java.util.Arrays.copyOfRange(doc.bytes, dataOff, dataOff + len)
    val filters: Seq[String] = doc.resolve(d.m.getOrElse("Filter", PNull)) match {
      case PName(n) => Seq(n)
      case PArr(items) => items.map(doc.resolve).collect { case PName(n) => n }
      case _ => Seq.empty
    }
    filters.foldLeft(raw) { (data, f) =>
      f match {
        case "FlateDecode" => inflate(data)
        case other => throw new Refused(s"filter:$other")
      }
    }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n =
        try inf.inflate(buf)
        catch { case _: java.util.zip.DataFormatException => throw new Refused("bad_flate") }
      if (n == 0 && !inf.finished()) throw new Refused("bad_flate") // starved
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Depth-first page-tree walk → content-stream object numbers per
    * page (a page's /Contents may be one stream ref or an array).
    */
  private def pageContents(doc: Doc, nodeRef: Obj): Vector[Vector[Int]] = {
    val node = doc.dict(nodeRef)
    doc.resolve(node.getOrElse("Type", PNull)) match {
      case PName("Pages") =>
        doc.resolve(node.getOrElse("Kids", PNull)) match {
          case PArr(kids) => kids.toVector.flatMap(k => pageContents(doc, k))
          case _ => Vector.empty
        }
      case PName("Page") =>
        val streams = node.get("Contents").map(doc.resolve) match {
          case Some(PArr(items)) => items.toVector.collect { case PRef(n, _) => n }
          case _ => node.get("Contents") match {
            case Some(PRef(n, _)) => Vector(n)
            case _ => Vector.empty
          }
        }
        Vector(streams)
      case _ => Vector.empty
    }
  }

  // -------------------------------------------------------------------
  // Content-stream text extraction: BT..ET blocks, Tj / TJ / ' / "
  // show operators, Td/TD/T*/'/" line breaks. TJ kerns more negative
  // than -180 (thousandths of an em) render as a space — the standard
  // word-gap heuristic.
  // -------------------------------------------------------------------

  private def decodeTextBytes(bytes: Array[Byte]): String = {
    // UTF-8 first (what machine-generated Latin PDFs and the fixture
    // write), Latin-1 fallback on malformed sequences — never throws.
    val dec = Utf8.newDecoder()
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => new String(bytes, Latin) }
  }

  /** Extract shown text from one decoded content stream. */
  def extractContentText(content: Array[Byte]): String = {
    val lx = new Lexer(content, 0)
    val sb = new StringBuilder
    val operands = scala.collection.mutable.ArrayBuffer.empty[Obj]
    var inText = false
    def newline(): Unit =
      if (sb.nonEmpty && !sb.endsWith("\n")) sb.append('\n')
    def show(o: Obj): Unit = o match {
      case PStr(b) => sb.append(decodeTextBytes(b))
      case _ =>
    }
    while ({ lx.ws(); lx.peek >= 0 }) {
      val c = lx.peek
      if (c == '/' || c == '(' || c == '[' || c == '<' ||
        c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        operands += parseObj(lx, refOk = false)
      } else {
        // operator token
        val start = lx.i
        while (lx.peek >= 0 && !isWs(lx.peek) && !isDelim(lx.peek)) lx.i += 1
        if (lx.i == start) lx.i += 1 // lone delimiter (e.g. ']'): skip
        val op = new String(lx.b, start, lx.i - start, Latin)
        op match {
          case "BT" => inText = true
          case "ET" => inText = false; newline()
          case "Tj" if inText => operands.lastOption.foreach(show)
          case "'" if inText => newline(); operands.lastOption.foreach(show)
          case "\"" if inText => newline(); operands.lastOption.foreach(show)
          case "TJ" if inText =>
            operands.lastOption match {
              case Some(PArr(items)) =>
                items.foreach {
                  case s: PStr => show(s)
                  case PNum(v) if v <= -180 => sb.append(' ')
                  case _ =>
                }
              case _ =>
            }
          case "Td" | "TD" | "T*" if inText => newline()
          case _ => // positioning/state ops: no text effect
        }
        operands.clear()
      }
    }
    sb.toString
  }

  /** Parse one PDF payload into its page texts (see object doc for the
    * refusal contract).
    */
  def parseFile(fileId: String, bytes: Array[Byte]): Seq[PdfPage] = {
    try {
      if (bytes.length < 8 || !new String(bytes, 0, 5, Latin).startsWith("%PDF-"))
        throw new Refused("not_pdf")
      val sx = lastIndexOf(bytes, "startxref")
      if (sx < 0) throw new Refused("missing_startxref")
      val lx = new Lexer(bytes, sx + "startxref".length)
      val xrefOff = parseObj(lx, refOk = false) match {
        case PNum(v) => v.toInt
        case _ => throw new Refused("missing_startxref")
      }
      val (offsets, trailer) = readXref(bytes, xrefOff)
      if (trailer.contains("Encrypt")) throw new Refused("encrypted")
      val doc = new Doc(bytes, offsets)
      val root = trailer.getOrElse("Root", throw new Refused("missing_root"))
      val pagesRef = doc.dict(root).getOrElse("Pages", throw new Refused("missing_pages"))
      val pages = pageContents(doc, pagesRef)
      pages.zipWithIndex.map { case (streams, idx) =>
        try {
          val content = streams.map(n => streamData(doc, n))
            .foldLeft(Array.emptyByteArray)(_ ++ _)
          val text = extractContentText(content)
          PdfPage(fileId, pages.size, idx + 1, text.length, text, null)
        } catch {
          case r: Refused => PdfPage(fileId, pages.size, idx + 1, 0, null, r.reason)
        }
      }
    } catch {
      case r: Refused => Seq(PdfPage(fileId, 0, -1, 0, null, r.reason))
      case _: Exception => Seq(PdfPage(fileId, 0, -1, 0, null, "malformed"))
    }
  }

  /** Pages of every PDF in `files` (`fileIdCol` string, `payloadCol`
    * binary). Typed flatMap — per-file linear CPU in the scan
    * projection, no shuffle (the [[Warc.parseRecords]] shape).
    */
  def parsePages(files: DataFrame, fileIdCol: String, payloadCol: String): Dataset[PdfPage] = {
    val s = files.sparkSession
    import s.implicits._
    files
      .select(col(fileIdCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .flatMap { case (id, payload) => parseFile(id, payload) }
  }

  /** Adapt parsed PDFs to the corpus schema [[TextPipeline.cleanCorpus]]
    * consumes: one row per successfully-extracted DOCUMENT (pages
    * joined in order with newlines), `(doc_id = file_id, n_pages,
    * text)` — the container-format input mode beside `Config.htmlInput`
    * (binary→text needs the typed parse, so it is an upstream adapter,
    * not a column flag). Refused files yield no row here; surface them
    * separately from [[parsePages]] (`refused` non-null) — a corpus
    * build must COUNT refusals, not silently absorb them.
    */
  def textCorpus(files: DataFrame, fileIdCol: String, payloadCol: String): DataFrame =
    parsePages(files, fileIdCol, payloadCol).toDF()
      .where(col("refused").isNull)
      .groupBy(col("file_id").as("doc_id"))
      .agg(
        max(col("n_pages")).as("n_pages"),
        array_join(sort_array(collect_list(struct(col("page"), col("text"))))
          .getField("text"), "\n").as("text"))

  // -------------------------------------------------------------------
  // Fixture builder — real multi-page PDFs (classic xref, FlateDecode
  // content streams, byte-exact offsets) from any keyed text table.
  // Used by the q row and the round-trip specs; production replaces
  // this with binaryFile reads of crawled PDFs.
  // -------------------------------------------------------------------

  private def escapeLiteral(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    s.getBytes(Utf8).foreach {
      case b @ ('(' | ')' | '\\') => out.write('\\'); out.write(b.toInt)
      case '\n' => out.write('\\'); out.write('n')
      case '\r' => out.write('\\'); out.write('r')
      case b => out.write(b & 0xff)
    }
    out.toByteArray
  }

  /** One complete PDF: a page per input string, each page's content a
    * FlateDecode stream showing the text as ONE literal-string `Tj`
    * (escape round-trip exercises every escape class) followed by a
    * kerned `TJ` salt — so extraction must get Tj, TJ-with-kern,
    * nested-paren escapes, Flate, AND the xref walk right to reproduce
    * the input. Extracted page text is exactly
    * `pageText + (if (pageText endsWith "\n") "" else "\n") + "(pdf) (salt)\n"`
    * ([[extractContentText]]'s T-star/ET newline + TJ word-gap rules)
    * — SQL-expressible, so the q row oracles end-to-end.
    */
  def buildPdf(pageTexts: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def writeObj(body: Array[Byte]): Unit = {
      offsets += out.size()
      out.write(body)
    }
    def s(str: String): Array[Byte] = str.getBytes(Latin)
    out.write(s("%PDF-1.4\n%âãÏÓ\n"))
    val nPages = pageTexts.size
    // object numbering: 1 catalog, 2 pages, 3 font, then per page i:
    // 4+2i page, 5+2i content stream
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    writeObj(s("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"))
    writeObj(s(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n"))
    writeObj(s("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"))
    pageTexts.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 4 + 2 * i
      val streamNum = 5 + 2 * i
      writeObj(s(s"$pageNum 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents $streamNum 0 R >>\nendobj\n"))
      val content = new java.io.ByteArrayOutputStream()
      content.write(s("BT /F1 12 Tf 72 720 Td ("))
      content.write(escapeLiteral(text))
      // TJ salt: kern -250 renders as the word gap; the strings carry
      // balanced parens so nested-paren literal parsing is exercised
      content.write(s(") Tj T* [ ((pdf)) -250 ((salt)) ] TJ ET\n"))
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(content.toByteArray)
      deflater.finish()
      val comp = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val data = comp.toByteArray
      writeObj(s(s"$streamNum 0 obj\n<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n"))
      out.write(data)
      out.write(s("\nendstream\nendobj\n"))
    }
    val xrefOff = out.size()
    out.write(s(s"xref\n0 ${offsets.size + 1}\n"))
    out.write(s("0000000000 65535 f \n")) // 20 bytes: space+LF is a legal 2-byte EOL
    offsets.foreach(o => out.write(s(f"$o%010d 00000 n\r\n")))
    out.write(s(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n"))
    out.toByteArray
  }

  /** Deterministic PDF files from `(idCol, textCol)` rows: `numFiles`
    * files keyed by `id % numFiles`, pages in ascending id order, each
    * page's text prefixed `"doc <id>\n"` so the extractor output keys
    * back to its source row (the [[Warc.responseFixture]] URI-regexp
    * convention). Grouping is one hash aggregation; the byte assembly
    * (offset arithmetic + Flate) runs in a typed map over the grouped
    * rows — per-file CPU, no extra shuffle. Output: `(file_id string,
    * payload binary)`.
    */
  def textFixture(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val s = df.sparkSession
    import s.implicits._
    df.select(
        pmod(col(idCol), lit(numFiles)).cast("string").as("file_id"),
        struct(col(idCol).cast("long").as("_1"),
          concat(lit("doc "), col(idCol).cast("string"), lit("\n"),
            col(textCol)).as("_2")).as("__p"))
      .groupBy(col("file_id"))
      .agg(sort_array(collect_list(col("__p"))).as("__pages"))
      .as[(String, Seq[(Long, String)])]
      .map { case (fileId, pages) => (fileId, buildPdf(pages.map(_._2))) }
      .toDF("file_id", "payload")
  }
}
