package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

import graft.sources.{Readers, Xlsx}

/** S3 direct xlsx ingest.
  *
  * Two fixture classes: the REFERENCE's real workbook
  * (`/root/reference/interventions_and_attributes.xlsx`, produced by a
  * real spreadsheet app — shared strings, styles, the lot) proves
  * against the wild format; a test-built workbook (inline strings,
  * gaps, booleans, multiple sheets) pins the edge cases. The
  * end-to-end check packages the pipeline's three dimension fixtures as
  * the sheets the reference actually reads (`WW`, `encounterId`, `key`
  * — `clean_encounterids.py:40,67`, `ipynb:cell 53`) and demands
  * schema+content equality with the pre-converted-CSV ingest path.
  */
class XlsxSpec extends SparkSpec {

  private val refWorkbook = "/root/reference/interventions_and_attributes.xlsx"
  private val domainDir = getClass.getResource("/domain").getPath

  // ---- minimal test-side workbook writer (inline strings + numbers) ----
  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val numeric = """-?\d+(\.\d+)?""".r

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def sheetXml(rows: Seq[Seq[String]]): String = {
    val body = rows.zipWithIndex.map { case (cells, ri) =>
      val cs = cells.zipWithIndex.collect {
        case (v, ci) if v != null =>
          val ref = s"${colRef(ci)}${ri + 1}"
          if (numeric.matches(v)) s"""<c r="$ref"><v>$v</v></c>"""
          else s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${ri + 1}">$cs</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""".stripMargin
  }

  /** Cell XML with an explicit style index (s attribute) — used by the
    * date-styled-numeric fixtures; style < 0 means no s attribute. */
  private def styledSheetXml(rows: Seq[Seq[(String, Int)]]): String = {
    val body = rows.zipWithIndex.map { case (cells, ri) =>
      val cs = cells.zipWithIndex.collect {
        case ((v, style), ci) if v != null =>
          val ref = s"${colRef(ci)}${ri + 1}"
          val sAttr = if (style >= 0) s""" s="$style"""" else ""
          if (numeric.matches(v)) s"""<c r="$ref"$sAttr><v>$v</v></c>"""
          else s"""<c r="$ref" t="inlineStr"$sAttr><is><t>${xmlEscape(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${ri + 1}">$cs</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""".stripMargin
  }

  /** Write a multi-sheet workbook; each sheet is (name, rows). */
  private def writeWorkbook(path: Path, sheets: Seq[(String, Seq[Seq[String]])]): Unit =
    writeWorkbookXml(path, sheets.map { case (n, rows) => (n, sheetXml(rows)) })

  /** Write a workbook from pre-rendered worksheet XML, with optional
    * extra parts (styles.xml, a date1904 workbookPr, …). */
  private def writeWorkbookXml(path: Path, sheets: Seq[(String, String)],
                               extraParts: Seq[(String, String)] = Nil,
                               date1904: Boolean = false): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    val n = sheets.size
    put("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |${(1 to n).map(i => s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n")}
         |</Types>""".stripMargin)
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |${if (date1904) """<workbookPr date1904="1"/>""" else ""}
         |<sheets>${sheets.zipWithIndex.map { case ((name, _), i) =>
           s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
         }.mkString}</sheets>
         |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |${(1 to n).map(i => s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString("\n")}
         |</Relationships>""".stripMargin)
    sheets.zipWithIndex.foreach { case ((_, xml), i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", xml)
    }
    extraParts.foreach { case (name, content) => put(name, content) }
    zos.close()
  }

  /** CSV fixture → rows-of-strings (driver-side, tiny). */
  private def csvRows(path: String): Seq[Seq[String]] =
    scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(java.nio.file.Paths.get(path))).asScala.toSeq
      .map(_.split(",", -1).toSeq)

  private def canon(df: DataFrame): (Seq[(String, String)], Seq[Seq[String]]) = (
    df.schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString)),
    df.collect().toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")))

  describe("Xlsx on the reference's real workbook") {
    it("lists sheet names") {
      Xlsx.sheetNames(refWorkbook) shouldBe Seq("key")
    }

    it("reads the key sheet with CSV-identical typing") {
      val df = Readers.dimensionXlsx(spark, refWorkbook, "key")
      df.columns.toSeq shouldBe Seq("Variable", "Intervention name (longLabel)",
        "interventionId", "Attribute name (shortLabel)", "attributeId",
        "Back end location (ICCA table)", "Frontend Source")
      df.count() shouldBe 96
      // ids came back numeric through the shared CSV-inference path
      df.schema("interventionId").dataType.simpleString shouldBe "int"
      df.schema("attributeId").dataType.simpleString shouldBe "int"
      // 96 (interventionId, attributeId) pairs harmonize to 33 variables
      // (checked against an independent python/ElementTree parse of the
      // workbook; SURVEY §1.1's "28 distinct" undercounts)
      df.select("Variable").distinct().count() shouldBe 33
    }

    it("fails loudly on a missing sheet") {
      val e = intercept[IllegalArgumentException] {
        Xlsx.readSheet(spark, refWorkbook, "nope")
      }
      e.getMessage should include("has: key")
    }
  }

  describe("Xlsx edge cases (test-built workbook)") {
    it("handles gaps, empty trailing cells, booleans, and string typing") {
      val p = Files.createTempFile("graft-edge", ".xlsx")
      // row 3 has a gap in column b; row 4 omits trailing cell c
      writeWorkbook(p, Seq(("edge", Seq(
        Seq("a", "b", "c"),
        Seq("1", "x", "2.5"),
        Seq("2", null, "3.5"),
        Seq("3", "y")))))
      val df = Xlsx.readSheet(spark, p.toString, "edge")
      canon(df) shouldBe ((
        Seq(("a", "int"), ("b", "string"), ("c", "double")),
        Seq(Seq("1", "x", "2.5"), Seq("2", "null", "3.5"), Seq("3", "y", "null"))))
      // raw mode: everything is a nullable string
      val raw = Xlsx.readSheet(spark, p.toString, "edge", inferSchema = false)
      raw.schema.fields.map(_.dataType.simpleString).distinct.toSeq shouldBe Seq("string")
      Files.delete(p)
    }

    it("surfaces data columns wider than the header instead of dropping them") {
      val p = Files.createTempFile("graft-wide", ".xlsx")
      writeWorkbook(p, Seq(("wide", Seq(
        Seq("a", "b"),
        Seq("1", "x", "extra")))))
      val df = Xlsx.readSheet(spark, p.toString, "wide")
      df.columns.toSeq shouldBe Seq("a", "b", "_c2")
      df.head().getString(2) shouldBe "extra"
      Files.delete(p)
    }
  }

  describe("Xlsx end-to-end against the pipeline's dimension fixtures") {
    it("WW/encounterId/key sheets ≡ the pre-converted CSV ingest") {
      val sheets = Seq(
        "WW" -> csvRows(s"$domainDir/issue_list.ww.csv"),
        "encounterId" -> csvRows(s"$domainDir/issue_list.encounterId.csv"),
        "key" -> csvRows(s"$domainDir/interventions_key.csv"))
      val p = Files.createTempFile("graft-dims", ".xlsx")
      writeWorkbook(p, sheets)
      Xlsx.sheetNames(p.toString) shouldBe Seq("WW", "encounterId", "key")
      val csvTwin = Map(
        "WW" -> s"$domainDir/issue_list.ww.csv",
        "encounterId" -> s"$domainDir/issue_list.encounterId.csv",
        "key" -> s"$domainDir/interventions_key.csv")
      sheets.map(_._1).foreach { name =>
        val fromXlsx = Readers.dimensionXlsx(spark, p.toString, name)
        val fromCsv = Readers.dimensionCsv(spark, csvTwin(name))
        withClue(s"sheet $name: ") { canon(fromXlsx) shouldBe canon(fromCsv) }
      }
      Files.delete(p)
    }
  }

  describe("Xlsx date-styled numerics") {
    it("serial→ISO conversion pins the 1900 phantom-leap-day anchors and 1904") {
      Xlsx.serialToIso("1", date1904 = false) shouldBe "1900-01-01"
      Xlsx.serialToIso("59", date1904 = false) shouldBe "1900-02-28"
      // Lotus phantom 1900-02-29: collapses onto the 28th
      Xlsx.serialToIso("60", date1904 = false) shouldBe "1900-02-28"
      Xlsx.serialToIso("61", date1904 = false) shouldBe "1900-03-01"
      Xlsx.serialToIso("45292", date1904 = false) shouldBe "2024-01-01"
      Xlsx.serialToIso("45292.25", date1904 = false) shouldBe "2024-01-01 06:00:00"
      Xlsx.serialToIso("0", date1904 = true) shouldBe "1904-01-01"
      Xlsx.serialToIso("366", date1904 = true) shouldBe "1905-01-01"
      Xlsx.serialToIso("not-a-number", date1904 = false) shouldBe "not-a-number"
    }

    it("classifies format codes: quoted/bracketed text never counts as a date token") {
      Xlsx.isDateFormatCode("yyyy-mm-dd") shouldBe true
      Xlsx.isDateFormatCode("[$-409]h:mm AM/PM") shouldBe true
      Xlsx.isDateFormatCode("0.00") shouldBe false
      Xlsx.isDateFormatCode("""0.00"kg"""") shouldBe false       // quoted s/y/m
      Xlsx.isDateFormatCode("""[Red]0.0""") shouldBe false       // bracketed d
      Xlsx.isDateFormatCode("""#,##0\m""") shouldBe false        // escaped m
    }

    it("decodes builtin and custom date styles through the style table, leaving plain numerics") {
      val styles =
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<numFmts count="2">
          |<numFmt numFmtId="164" formatCode="yyyy\-mm\-dd"/>
          |<numFmt numFmtId="165" formatCode="0.00&quot;kg&quot;"/>
          |</numFmts>
          |<cellXfs count="4">
          |<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/><xf numFmtId="165"/>
          |</cellXfs>
          |</styleSheet>""".stripMargin
      val rows: Seq[Seq[(String, Int)]] = Seq(
        Seq(("id", -1), ("admit", -1), ("review", -1), ("weight", -1)),
        // 45292 = 2024-01-01; .25 = 06:00:00; weight style 165 is custom NON-date
        Seq(("1", -1), ("45292", 1), ("45292.25", 2), ("72.5", 3)),
        Seq(("2", -1), ("45658", 1), ("45658.75", 2), ("64.25", 3)))
      val p = Files.createTempFile("graft-dates", ".xlsx")
      writeWorkbookXml(p, Seq(("d", styledSheetXml(rows))),
        extraParts = Seq("xl/styles.xml" -> styles))
      val df = Xlsx.readSheet(spark, p.toString, "d", inferSchema = false)
      df.collect().map(_.toSeq.map(String.valueOf)).toSeq shouldBe Seq(
        Seq("1", "2024-01-01", "2024-01-01 06:00:00", "72.5"),
        Seq("2", "2025-01-01", "2025-01-01 18:00:00", "64.25"))
      Files.delete(p)
    }

    it("honors the workbook 1904 date system") {
      val styles =
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs>
          |</styleSheet>""".stripMargin
      val rows: Seq[Seq[(String, Int)]] = Seq(
        Seq(("d", -1)), Seq(("366", 1)))
      val p = Files.createTempFile("graft-1904", ".xlsx")
      writeWorkbookXml(p, Seq(("s", styledSheetXml(rows))),
        extraParts = Seq("xl/styles.xml" -> styles), date1904 = true)
      Xlsx.readSheet(spark, p.toString, "s", inferSchema = false)
        .head().getString(0) shouldBe "1905-01-01"
      Files.delete(p)
    }
  }

  describe("Xlsx loud failures on malformed sheet shape") {
    it("rejects a workbook whose first non-empty row is not row 1") {
      // row 1 exists but holds no cells → the would-be header is row 2
      val p = Files.createTempFile("graft-blankrow", ".xlsx")
      writeWorkbook(p, Seq(("b", Seq(
        Seq(null, null),
        Seq("a", "b"),
        Seq("1", "x")))))
      val e = intercept[IllegalArgumentException] {
        Xlsx.readSheet(spark, p.toString, "b")
      }
      e.getMessage should include("first non-empty row is row 2")
      Files.delete(p)
    }

    it("rejects duplicate header names instead of emitting ambiguous columns") {
      val p = Files.createTempFile("graft-duphdr", ".xlsx")
      writeWorkbook(p, Seq(("h", Seq(
        Seq("a", "a", "b"),
        Seq("1", "2", "x")))))
      val e = intercept[IllegalArgumentException] {
        Xlsx.readSheet(spark, p.toString, "h")
      }
      e.getMessage should include("duplicate header names: a")
      Files.delete(p)
    }
  }
}
