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

  /** Write a multi-sheet workbook; each sheet is (name, rows). */
  private def writeWorkbook(path: Path, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
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
         |<sheets>${sheets.zipWithIndex.map { case ((name, _), i) =>
           s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
         }.mkString}</sheets>
         |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |${(1 to n).map(i => s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString("\n")}
         |</Relationships>""".stripMargin)
    sheets.zipWithIndex.foreach { case ((_, rows), i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(rows))
    }
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
}
