package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S3 (SURVEY.md §2.1): direct `.xlsx` ingest for dimension-scale
  * workbooks — the reference reads four workbook sheets natively
  * (`/root/reference/clean_encounterids.py:40,67`,
  * `parse_ICNARC_xml.py:53`, `dataset_curation.ipynb:cell 53`), and
  * this closes the one capability gap the pre-convert-to-CSV contract
  * left open.
  *
  * An `.xlsx` file is an OPC zip (ECMA-376 SpreadsheetML): sheet names
  * live in `xl/workbook.xml`, the name→part mapping in
  * `xl/_rels/workbook.xml.rels`, de-duplicated cell text in
  * `xl/sharedStrings.xml`, and cell data in `xl/worksheets/sheetN.xml`.
  * The JDK's zip + StAX cover all of that, so there is no external
  * dependency — deliberate, since the engine ships to a cluster where a
  * spreadsheet library has no other use.
  *
  * Scale contract (same as [[Readers.dimensionCsv]]): workbooks are
  * DIMENSION data — broadcast-sized lookup tables parsed once on the
  * driver, never a distributed scan. Fact-scale data arrives as
  * parquet/CSV/JDBC. Parsing is streaming (StAX, one pass, O(cells)
  * memory for the materialized rows only).
  *
  * Fidelity notes:
  *  - every cell is surfaced as a string, then (optionally) run through
  *    Spark's own CSV schema inference so `interventionId` comes back
  *    int-typed exactly as `spark.read.csv` would type it — one
  *    inference implementation, not two;
  *  - empty/absent cells → null (the reference's NaN-for-missing);
  *  - numeric cells keep their raw stored lexeme (Excel stores
  *    integers without a decimal point);
  *  - date-styled numeric cells ARE decoded: the style table
  *    (`xl/styles.xml`) maps each cell's style index to a number
  *    format, and formats that are date/time-shaped (builtin ids
  *    14–22/27–36/45–47/50–58, or a custom code containing y/m/d/h/s
  *    tokens outside quotes and brackets) trigger serial→ISO
  *    conversion under the workbook's declared date system (1900 or
  *    1904). Whole serials render as `yyyy-MM-dd`, fractional ones as
  *    `yyyy-MM-dd HH:mm:ss` — the lexeme Spark's CSV inference then
  *    types as date/timestamp, exactly as a CSV export would carry;
  *  - rows are anchored to their `r` attribute: a workbook whose first
  *    stored non-empty row is not row 1 fails loudly (a blank or
  *    skipped first row would otherwise silently promote a data row to
  *    header), and duplicate header names fail loudly rather than
  *    yielding ambiguous duplicate DataFrame columns.
  */
object Xlsx {

  /** DTD-free, external-entity-free StAX factory: workbook parts are
    * untrusted input, so XXE is disabled outright. */
  private def staxFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f
  }

  private def withPart[A](zip: ZipFile, name: String)(f: XMLStreamReader => A): Option[A] = {
    Option(zip.getEntry(name)).map { e =>
      val in = zip.getInputStream(e)
      val r = staxFactory().createXMLStreamReader(in)
      try f(r) finally { r.close(); in.close() }
    }
  }

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zip = new ZipFile(path)
    try sheetParts(zip).map(_._1) finally zip.close()
  }

  /** (name, zip-entry path) per sheet, resolving r:id through the
    * workbook relationships part. */
  private def sheetParts(zip: ZipFile): Seq[(String, String)] = {
    val rels = withPart(zip, "xl/_rels/workbook.xml.rels") { r =>
      val m = mutable.Map[String, String]()
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship")
          m(r.getAttributeValue(null, "Id")) = r.getAttributeValue(null, "Target")
      }
      m.toMap
    }.getOrElse(Map.empty)
    // rel targets are relative to xl/ unless rooted ("/xl/…")
    def resolve(target: String): String =
      if (target.startsWith("/")) target.drop(1) else "xl/" + target
    withPart(zip, "xl/workbook.xml") { r =>
      val out = mutable.ArrayBuffer[(String, String)]()
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          // r:id is namespaced; match by local name to tolerate prefix choice
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          rid.flatMap(rels.get).foreach(t => out += ((name, resolve(t))))
        }
      }
      out.toSeq
    }.getOrElse(Seq.empty)
  }

  /** Shared-string table: one entry per `<si>`, concatenating every
    * `<t>` run (rich-text cells split one string across `<r><t>` runs).
    * Runs inside `<rPh>` phonetic-guide blocks (furigana annotations
    * written by Japanese-locale Excel) are NOT cell text and are
    * skipped — including them would corrupt the value vs the CSV twin. */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] =
    withPart(zip, "xl/sharedStrings.xml") { r =>
      val out = mutable.ArrayBuffer[String]()
      val cur = new StringBuilder
      var inSi = false
      var inT = false
      var phoneticDepth = 0
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "rPh" | "phoneticPr" => phoneticDepth += 1
            case "t" if inSi && phoneticDepth == 0 => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "rPh" | "phoneticPr" => phoneticDepth -= 1
            case "si" => inSi = false; out += cur.toString
            case _ => ()
          }
        case _ => ()
      }
      out.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** "C" of "C7" → 2 (0-based). */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1

  /** "C7" → 7 (1-based row), or None when no digits present. */
  private def rowIndex(ref: String): Option[Int] =
    Option(ref.dropWhile(_.isLetter)).filter(_.nonEmpty).flatMap(_.toIntOption)

  /** Builtin SpreadsheetML number-format ids that render dates/times
    * (ECMA-376 §18.8.30 implied table). */
  private val builtinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** Heuristic for CUSTOM format codes: date-shaped iff any y/m/d/h/s
    * token survives after stripping quoted literals ("…"), bracketed
    * sections ([Red], [$-409]) and backslash escapes — the standard
    * detection every spreadsheet reader uses (the code cannot say
    * whether `m` means month or minute, but both imply a date/time). */
  private[graft] def isDateFormatCode(code: String): Boolean = {
    val sb = new StringBuilder
    var i = 0
    while (i < code.length) code.charAt(i) match {
      case '"'  => i += 1; while (i < code.length && code.charAt(i) != '"') i += 1; i += 1
      case '['  => i += 1; while (i < code.length && code.charAt(i) != ']') i += 1; i += 1
      case '\\' => i += 2
      case c    => sb.append(c); i += 1
    }
    sb.toString.toLowerCase.exists("ymdhs".contains(_))
  }

  /** Style indexes (positions in `cellXfs`) whose number format is
    * date-shaped. One streaming pass over `xl/styles.xml`: custom
    * `<numFmt>` codes first (they appear before `<cellXfs>` in the
    * part), then each `<xf>`'s numFmtId in order. */
  private def dateStyles(zip: ZipFile): Set[Int] =
    withPart(zip, "xl/styles.xml") { r =>
      val customDate = mutable.Set[Int]()
      val out = mutable.Set[Int]()
      var inCellXfs = false
      var xfIdx = 0
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            val id = Option(r.getAttributeValue(null, "numFmtId")).flatMap(_.toIntOption)
            val code = Option(r.getAttributeValue(null, "formatCode"))
            if (id.isDefined && code.exists(isDateFormatCode)) customDate += id.get
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            val fmt = Option(r.getAttributeValue(null, "numFmtId"))
              .flatMap(_.toIntOption).getOrElse(0)
            if (builtinDateFmts(fmt) || customDate(fmt)) out += xfIdx
            xfIdx += 1
          case _ => ()
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ => ()
      }
      out.toSet
    }.getOrElse(Set.empty)

  /** Workbook date system: true iff `<workbookPr date1904="1"/>`. */
  private def isDate1904(zip: ZipFile): Boolean =
    withPart(zip, "xl/workbook.xml") { r =>
      var found = false
      while (r.hasNext && !found) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "workbookPr") {
          val v = Option(r.getAttributeValue(null, "date1904")).getOrElse("0")
          found = v == "1" || v == "true"
        }
      }
      found
    }.getOrElse(false)

  /** Excel serial → ISO lexeme. 1900 system: serial 1 = 1900-01-01,
    * with the famous phantom 1900-02-29 at serial 60 (Lotus 1-2-3
    * compatibility bug carried by every implementation) — serials < 60
    * anchor at 1899-12-31, ≥ 60 at 1899-12-30, which lands the phantom
    * serial 60 itself on 1900-02-28. 1904 system: serial 0 =
    * 1904-01-01.
    * Whole serials → `yyyy-MM-dd`; fractional → `yyyy-MM-dd HH:mm:ss`
    * (fraction = time of day, rounded to the second). Non-numeric raw
    * text passes through untouched. */
  private[graft] def serialToIso(raw: String, date1904: Boolean): String =
    raw.toDoubleOption match {
      case None => raw
      case Some(d) =>
        val days0 = math.floor(d).toLong
        val secs0 = math.round((d - days0) * 86400.0)
        // carry a rounded-up 24:00:00 into the next day
        val (days, secs) = if (secs0 >= 86400) (days0 + 1, 0L) else (days0, secs0)
        val base =
          if (date1904) java.time.LocalDate.of(1904, 1, 1)
          else if (days >= 60) java.time.LocalDate.of(1899, 12, 30)
          else java.time.LocalDate.of(1899, 12, 31)
        val date = base.plusDays(days)
        if (secs == 0) date.toString
        else f"$date ${secs / 3600}%02d:${secs / 60 % 60}%02d:${secs % 60}%02d"
    }

  /** One worksheet part → rows of (possibly null) cell strings.
    * Rows are anchored to their 1-based `r` attribute: the first
    * emitted (non-empty) row must be row 1 — otherwise the caller
    * would silently promote a data row to header — and that is a loud
    * `require` failure, not a compaction. Interleaved all-empty rows
    * are skipped, matching what Spark's CSV reader does with blank
    * lines in the pre-converted-CSV twin. */
  private def sheetRows(zip: ZipFile, part: String, sst: IndexedSeq[String],
                        dateStyleIdx: Set[Int], date1904: Boolean): Seq[Array[String]] =
    withPart(zip, part) { r =>
      val rows = mutable.ArrayBuffer[Array[String]]()
      val cells = mutable.ArrayBuffer[(Int, String)]()
      var col = -1              // running index for <c> without an r attr
      var rowR = 0              // running 1-based row number
      var firstEmittedR = -1
      var cellType = ""
      var cellStyle = -1
      var inV = false
      var inIsT = false
      val v = new StringBuilder
      def flushCell(): Unit = {
        val raw = v.toString
        val value = cellType match {
          case "s" => raw.toIntOption.flatMap(sst.lift).orNull
          case "b" => if (raw == "1") "true" else "false"
          case "e" => null                      // formula error → missing
          case _ =>                             // n / str / inlineStr
            if (raw.isEmpty) null
            else if (cellType == "n" && dateStyleIdx(cellStyle))
              serialToIso(raw, date1904)
            else raw
        }
        if (value != null) cells += ((col, value))
      }
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" =>
            cells.clear(); col = -1
            rowR = Option(r.getAttributeValue(null, "r"))
              .flatMap(_.toIntOption).getOrElse(rowR + 1)
          case "c" =>
            val ref = Option(r.getAttributeValue(null, "r"))
            col = ref.map(colIndex).getOrElse(col + 1)
            // a cell ref like "C7" also carries the row — trust it over
            // the running counter if the <row> element lacked r
            ref.flatMap(rowIndex).foreach(rowR = _)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            cellStyle = Option(r.getAttributeValue(null, "s"))
              .flatMap(_.toIntOption).getOrElse(-1)
            v.clear()
          case "v" => inV = true
          case "t" if cellType == "inlineStr" => inIsT = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          v.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => inV = false
          case "t" => inIsT = false
          case "c" => flushCell()
          case "row" =>
            if (cells.nonEmpty) {
              if (firstEmittedR < 0) firstEmittedR = rowR
              val width = cells.map(_._1).max + 1
              val arr = new Array[String](width)
              cells.foreach { case (i, s) => arr(i) = s }
              rows += arr
            }
          case _ => ()
        }
        case _ => ()
      }
      require(rows.isEmpty || firstEmittedR == 1,
        s"worksheet part '$part': first non-empty row is row $firstEmittedR, not row 1 — " +
          "a blank or skipped first row would silently promote the wrong row to header; " +
          "clean the sheet so the header occupies row 1")
      rows.toSeq
    }.getOrElse(Seq.empty)

  /** Read one sheet (by name) into a DataFrame. First row is the
    * header; `inferSchema` delegates typing to Spark's CSV inference
    * over the in-memory rows, so xlsx and pre-converted-CSV ingest of
    * the same table produce identical schemas. */
  def readSheet(spark: SparkSession, path: String, sheet: String,
                inferSchema: Boolean = true): DataFrame = {
    val zip = new ZipFile(path)
    val (header, data) =
      try {
        val part = sheetParts(zip).collectFirst { case (`sheet`, p) => p }
          .getOrElse(throw new IllegalArgumentException(
            s"sheet '$sheet' not found in $path (has: ${sheetParts(zip).map(_._1).mkString(", ")})"))
        val rows = sheetRows(zip, part, sharedStrings(zip),
          dateStyles(zip), isDate1904(zip))
        require(rows.nonEmpty, s"sheet '$sheet' in $path is empty")
        (rows.head, rows.tail)
      } finally zip.close()
    // width covers the WIDEST row, not just the header: a data row with
    // cells beyond the last named header column must surface those
    // values (as _cN columns, matching what the CSV twin would show),
    // never drop them silently. Bounded: one stray note cell parked at
    // column BZ must fail loudly, not silently inflate the schema to
    // hundreds of mostly-null columns
    val width = (header.length +: data.map(_.length)).max
    require(width - header.length <= 64,
      s"sheet '$sheet' in $path has data ${width - header.length} columns wider " +
        s"than its ${header.length}-column header — a stray far-right cell? " +
        "Clean the sheet or name the columns in the header row")
    val names = (0 until width).map { i =>
      val h = if (i < header.length) header(i) else null
      if (h == null || h.isEmpty) s"_c$i" else h
    }
    // duplicate header names would yield ambiguous duplicate DataFrame
    // columns (any later select fails with AMBIGUOUS_REFERENCE) while
    // the CSV twin's inference silently renames — fail loudly instead
    val dupNames = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    require(dupNames.isEmpty,
      s"sheet '$sheet' in $path has duplicate header names: ${dupNames.mkString(", ")} — " +
        "rename the columns so every header is unique")
    if (inferSchema && data.nonEmpty) {
      // serialize to CSV lines and let spark.read.csv type the columns —
      // the same inference path dimensionCsv uses (one implementation)
      def csvEscape(s: String): String =
        if (s == null) ""
        else if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
          "\"" + s.replace("\"", "\"\"") + "\""
        else s
      import spark.implicits._
      val lines = data.map(row =>
        (0 until width).map(i => csvEscape(row.lift(i).flatMap(Option(_)).orNull))
          .mkString(","))
      spark.read
        .option("header", "false").option("inferSchema", "true")
        .csv(lines.toDS())
        .toDF(names.toIndexedSeq: _*)
    } else {
      val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
      val rows = data.map(row =>
        Row.fromSeq((0 until width).map(i => row.lift(i).flatMap(Option(_)).orNull)))
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schema)
    }
  }
}
