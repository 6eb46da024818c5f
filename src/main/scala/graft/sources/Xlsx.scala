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
  *    integers without a decimal point); date-styled numerics are NOT
  *    decoded to dates (none of the reference's dimension sheets use
  *    them — they carry dates as text).
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

  /** One worksheet part → rows of (possibly null) cell strings. */
  private def sheetRows(zip: ZipFile, part: String,
                        sst: IndexedSeq[String]): Seq[Array[String]] =
    withPart(zip, part) { r =>
      val rows = mutable.ArrayBuffer[Array[String]]()
      val cells = mutable.ArrayBuffer[(Int, String)]()
      var col = -1              // running index for <c> without an r attr
      var cellType = ""
      var inV = false
      var inIsT = false
      val v = new StringBuilder
      def flushCell(): Unit = {
        val raw = v.toString
        val value = cellType match {
          case "s" => raw.toIntOption.flatMap(sst.lift).orNull
          case "b" => if (raw == "1") "true" else "false"
          case "e" => null                      // formula error → missing
          case _   => if (raw.isEmpty) null else raw // n / str / inlineStr
        }
        if (value != null) cells += ((col, value))
      }
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => cells.clear(); col = -1
          case "c" =>
            col = Option(r.getAttributeValue(null, "r"))
              .map(colIndex).getOrElse(col + 1)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
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
              val width = cells.map(_._1).max + 1
              val arr = new Array[String](width)
              cells.foreach { case (i, s) => arr(i) = s }
              rows += arr
            }
          case _ => ()
        }
        case _ => ()
      }
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
        val rows = sheetRows(zip, part, sharedStrings(zip))
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
