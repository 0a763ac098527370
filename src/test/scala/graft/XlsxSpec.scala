package graft

import java.io.{ByteArrayOutputStream, File}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Excel, Xlsx}

/** The core-JVM `.xlsx` reader (SURVEY §2.1 S6). The committed python
  * generator writes the oracle-checked fixtures; this spec authors
  * workbook bytes INDEPENDENTLY with java.util.zip, so the parser is
  * pinned against a second producer, not its own fixture generator.
  */
class XlsxSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private val FixtureDir = "/root/repo/fixtures/xlsx"

  // ── minimal in-test workbook writer ────────────────────────────────

  private def wb(sheetXml: String,
                 sst: Seq[String] = Nil,
                 stylesXml: String = "",
                 extraSheetXml: String = "",
                 date1904: Boolean = false): Array[Byte] = {
    val sheets =
      if (extraSheetXml.isEmpty) Seq("ws1.xml" -> sheetXml)
      else Seq("ws1.xml" -> sheetXml, "ws2.xml" -> extraSheetXml)
    val wbPr = if (date1904) """<workbookPr date1904="1"/>""" else ""
    val wbXml =
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""".stripMargin +
        wbPr + "<sheets>" +
        sheets.zipWithIndex.map { case (_, i) =>
          s"""<sheet name="s${i + 1}" sheetId="${i + 1}" r:id="x${i + 1}"/>"""
        }.mkString + "</sheets></workbook>"
    val rels =
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<Relationship Id="x${i + 1}" Type="t" Target="worksheets/$name"/>"""
        }.mkString + "</Relationships>"
    val sstXml =
      s"""<sst xmlns="x" count="${sst.size}" uniqueCount="${sst.size}">""" +
        sst.map(s => s"<si><t>$s</t></si>").mkString + "</sst>"
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("xl/workbook.xml", wbXml)
    put("xl/_rels/workbook.xml.rels", rels)
    if (sst.nonEmpty) put("xl/sharedStrings.xml", sstXml)
    if (stylesXml.nonEmpty) put("xl/styles.xml", stylesXml)
    sheets.foreach { case (name, body) =>
      put(s"xl/worksheets/$name", s"<worksheet><sheetData>$body</sheetData></worksheet>")
    }
    z.close()
    bos.toByteArray
  }

  private def cellsOf(bytes: Array[Byte]): Vector[Vector[String]] =
    Xlsx.parse(bytes).map(_.cells.toVector)

  // ── parser unit behavior ───────────────────────────────────────────

  test("cell kinds: shared/inline strings, numbers, bool, error, formula cache") {
    val rows = cellsOf(wb(
      """<row r="1">
        |<c r="A1" t="s"><v>0</v></c>
        |<c r="B1" t="inlineStr"><is><r><t>ин</t></r><r><t>лайн</t></r></is></c>
        |<c r="C1"><v>42.5</v></c>
        |<c r="D1" t="b"><v>1</v></c>
        |<c r="E1" t="e"><v>#DIV/0!</v></c>
        |<c r="F1"><f>C1*2</f><v>85</v></c>
        |<c r="G1" t="str"><f>CONCAT("a","b")</f><v>ab</v></c>
        |</row>""".stripMargin,
      sst = Seq("общий")))
    assert(rows == Vector(Vector("общий", "инлайн", "42.5", "true", null, "85", "ab")))
  }

  test("sparse rows: absent cells and gaps resolve by cell reference") {
    val rows = cellsOf(wb(
      """<row r="1"><c r="A1"><v>1</v></c><c r="D1"><v>4</v></c></row>
        |<row r="3"><c r="B3"><v>2</v></c></row>""".stripMargin))
    assert(Xlsx.parse(wb(
      """<row r="1"><c r="A1"><v>1</v></c></row>
        |<row r="3"><c r="B3"><v>2</v></c></row>""".stripMargin)).map(_.rowNum) == Vector(1L, 3L))
    assert(rows(0) == Vector("1", null, null, "4"))
    assert(rows(1) == Vector(null, "2"))
  }

  test("date-styled serials convert via builtin and custom formats; plain numbers do not") {
    val styles =
      """<styleSheet xmlns="x">
        |<numFmts count="1"><numFmt numFmtId="165" formatCode="[$-409]dd\-mmm\-yy"/></numFmts>
        |<cellXfs count="3">
        |<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="165"/>
        |</cellXfs></styleSheet>""".stripMargin
    val rows = cellsOf(wb(
      """<row r="1">
        |<c r="A1" s="1"><v>45852</v></c>
        |<c r="B1" s="2"><v>45853</v></c>
        |<c r="C1" s="1"><v>45852.5</v></c>
        |<c r="D1"><v>45852</v></c>
        |<c r="E1" s="0"><v>45852</v></c>
        |</row>""".stripMargin,
      stylesXml = styles))
    assert(rows == Vector(Vector(
      "2025-07-14", "2025-07-15", "2025-07-14 12:00:00", "45852", "45852")))
  }

  test("date1904 workbooks shift the serial epoch to 1904-01-01") {
    val styles =
      """<styleSheet xmlns="x"><cellXfs count="2">
        |<xf numFmtId="0"/><xf numFmtId="14"/>
        |</cellXfs></styleSheet>""".stripMargin
    val sheet = """<row r="1"><c r="A1" s="1"><v>10000</v></c></row>"""
    val d1900 = cellsOf(wb(sheet, stylesXml = styles))(0)(0)
    val d1904 = cellsOf(wb(sheet, stylesXml = styles, date1904 = true))(0)(0)
    assert(d1900 == java.time.LocalDate.of(1899, 12, 30).plusDays(10000).toString)
    assert(d1904 == java.time.LocalDate.of(1904, 1, 1).plusDays(10000).toString)
  }

  test("custom format codes: bracketed sections and quoted literals are not date tokens") {
    assert(Xlsx.isDateFormatCode("dd.mm.yyyy"))
    assert(Xlsx.isDateFormatCode("hh:mm:ss"))
    assert(!Xlsx.isDateFormatCode("#,##0.00"))
    assert(!Xlsx.isDateFormatCode("""[Red]#,##0 "meters""""))
    assert(!Xlsx.isDateFormatCode("General"))
  }

  test("only the first sheet is read, resolved through rels indirection") {
    val rows = cellsOf(wb(
      """<row r="1"><c r="A1"><v>first</v></c></row>""",
      extraSheetXml = """<row r="1"><c r="A1"><v>decoy</v></c></row>"""))
    assert(rows == Vector(Vector("first")))
  }

  test("column reference arithmetic covers multi-letter columns") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA12") == 26)
    assert(Xlsx.colIndex("BC3") == 54)
  }

  // ── the Spark-facing reader over the committed fixtures ────────────

  test("readXlsx: glob union carries header + provenance, all-string schema") {
    val df = Excel.readXlsx(spark, s"$FixtureDir/*rders*.xlsx")
    assert(df.columns.toSeq == Seq(
      "№ заказа", "Дата поступления заказа", "Название товара в Kaspi Магазине",
      "Артикул", "Сумма", "Дата изменения статуса", "Статус", "Количество",
      "_file", "_row"))
    val rows = df.collect()
    assert(rows.length == 7) // 4 active + 3 archive data rows
    assert(rows.map(_.getAs[String]("_file")).distinct.sorted.toSeq ==
      Seq("ActiveOrders 31.7.25.xlsx", "ArchiveOrders since 1.7.25.xlsx"))
    // sparse row: short row padded with nulls at the tail
    val sparse = rows.find(_.getAs[String]("№ заказа") == "700100201").get
    assert(sparse.getAs[String]("Количество") == null)
  }

  test("readXlsx: purchase workbook surfaces ISO dates and booleans") {
    val df = Excel.readXlsx(spark, s"$FixtureDir/Purchase inquiry*.xlsx")
    val first = df.filter(df("SKU_KEY") === "TSHIRT-BLK-L" && df("_row") === 2).collect().head
    assert(first.getAs[String]("PO_Date") == "2025-07-14")
    assert(first.getAs[String]("Ast_arrival_date") == "2025-07-31")
    assert(first.getAs[String]("Paid") == "true")
    assert(first.getAs[String]("Unit_COGS_KZT") == "1234.5")
  }

  // ── property tests (seeded-random, house style) ────────────────────

  private def lettersOf(idx: Int): String = {
    var i = idx + 1
    val sb = new StringBuilder
    while (i > 0) {
      val r = (i - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      i = (i - 1) / 26
    }
    sb.toString
  }

  test("colIndex inverts letter encoding for any column (property)") {
    val rnd = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val idx = rnd.nextInt(18278) // through ZZZ
      assert(Xlsx.colIndex(s"${lettersOf(idx)}${1 + rnd.nextInt(99999)}") == idx)
    }
  }

  test("serialToIso matches java.time date arithmetic (property)") {
    val rnd = new scala.util.Random(13)
    val epoch = java.time.LocalDate.of(1899, 12, 30)
    (0 until 300).foreach { _ =>
      val days = 61 + rnd.nextInt(80000)
      assert(Xlsx.serialToIso(days.toString) == epoch.plusDays(days).toString)
      // half-day fraction carries the time part
      assert(Xlsx.serialToIso(s"$days.5") == s"${epoch.plusDays(days)} 12:00:00")
    }
  }

  test("random sparse grids roundtrip through write+parse (property)") {
    val rnd = new scala.util.Random(17)
    (0 until 30).foreach { _ =>
      val nRows = 1 + rnd.nextInt(8)
      val nCols = 1 + rnd.nextInt(8)
      // model: row -> col -> value (None = absent cell)
      val grid = (1 to nRows).map { r =>
        r -> (0 until nCols).map { c =>
          c -> (rnd.nextInt(4) match {
            case 0 => None
            case 1 => Some(("num", (rnd.nextInt(100000) / 10.0).toString))
            case 2 => Some(("inline", s"s${rnd.nextInt(1000)} текст"))
            case 3 => Some(("shared", s"sh${rnd.nextInt(5)}"))
          })
        }.toMap
      }.toMap
      val sst = grid.values.flatMap(_.values.flatten)
        .collect { case ("shared", v) => v }.toSeq.distinct
      val sheetXml = grid.toSeq.sortBy(_._1).map { case (r, cols) =>
        val cells = cols.toSeq.sortBy(_._1).flatMap { case (c, cell) =>
          val ref = s"${lettersOf(c)}$r"
          cell.map {
            case ("num", v)    => s"""<c r="$ref"><v>$v</v></c>"""
            case ("inline", v) => s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
            case ("shared", v) => s"""<c r="$ref" t="s"><v>${sst.indexOf(v)}</v></c>"""
            case other         => fail(s"unexpected $other")
          }
        }
        s"""<row r="$r">${cells.mkString}</row>"""
      }.mkString("\n")
      val parsed = Xlsx.parse(wb(sheetXml, sst = sst))
      val byRow = parsed.map(sr => sr.rowNum -> sr.cells).toMap
      grid.foreach { case (r, cols) =>
        val present = cols.collect { case (c, Some(_)) => c }
        if (present.isEmpty) assert(!byRow.contains(r.toLong) || byRow(r.toLong).forall(_ == null))
        else {
          val cells = byRow(r.toLong)
          cols.foreach {
            case (c, Some((_, v))) => assert(cells(c) == v, s"row $r col $c")
            case (c, None) => assert(c >= cells.length || cells(c) == null, s"row $r col $c null")
          }
        }
      }
    }
  }

  // ── the writer: import/export round trip (PRICEBOT_SPEC_V2.md:114-121) ──

  test("writeXlsx → readXlsx round-trips a typed frame with pinned column order") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("xlsx_rt")
    try {
      val src = spark.range(5).select(
        concat(lit("SKU-"), col("id")).as("sku"),
        (col("id") * 100 + 50).as("price"),          // long → numeric cell
        (col("id") / 4.0).as("ratio"),               // double → numeric cell
        (col("id") % 2 === 0).as("active"),          // boolean → t="b"
        when(col("id") === 3, null)
          .otherwise(concat(lit("примечание <&> "), col("id"))).as("note"))
      val path = s"$dir/export.xlsx"
      Excel.writeXlsx(src, path)

      val back = Excel.readXlsx(spark, path)
      assert(back.columns.toSeq == Seq("sku", "price", "ratio", "active", "note", "_file", "_row"))
      val rows = back.orderBy("_row").drop("_file", "_row").collect()
      val expect = src.collect().map(_.toSeq.map {
        case null          => null
        case b: Boolean    => b.toString
        case v             => v.toString
      })
      assert(rows.map(_.toSeq).toSeq == expect.toSeq)
    } finally {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.delete(p); () })
    }
  }

  test("writeXlsx output is byte-stable for identical content") {
    val b1 = new ByteArrayOutputStream(); val b2 = new ByteArrayOutputStream()
    val data = Seq(Seq[Any]("a", 1L, true), Seq[Any]("b", null, 2.5))
    Xlsx.write(Seq("x", "y", "z"), data.iterator, b1)
    Xlsx.write(Seq("x", "y", "z"), data.iterator, b2)
    assert(b1.toByteArray.sameElements(b2.toByteArray))
  }

  test("writer round-trips random grids through its own reader (property)") {
    val rnd = new scala.util.Random(19)
    (0 until 30).foreach { _ =>
      val nCols = 1 + rnd.nextInt(6)
      val header = (0 until nCols).map(i => s"col_$i")
      val rows = (0 until 1 + rnd.nextInt(10)).map { _ =>
        (0 until nCols).map { _ =>
          rnd.nextInt(5) match {
            case 0 => null
            case 1 => java.lang.Long.valueOf(rnd.nextLong() % 100000)
            case 2 => java.lang.Double.valueOf(rnd.nextInt(10000) / 8.0)
            case 3 => java.lang.Boolean.valueOf(rnd.nextBoolean())
            case 4 => s"текст ${rnd.nextInt(1000)} <&\" '>"
          }
        }: Seq[Any]
      }
      val bos = new ByteArrayOutputStream()
      Xlsx.write(header, rows.iterator, bos)
      val parsed = Xlsx.parse(bos.toByteArray)
      assert(parsed.head.cells.toSeq == header)
      parsed.tail.zip(rows).foreach { case (got, want) =>
        want.zipWithIndex.foreach { case (v, c) =>
          val g = if (c < got.cells.length) got.cells(c) else null
          if (v == null) assert(g == null)
          else assert(g == v.toString, s"col $c: $g vs $v")
        }
      }
    }
  }

  test("readXlsx fails fast on inconsistent headers across the glob") {
    val dir = Files.createTempDirectory("xlsx_mismatch").toFile
    try {
      Files.write(new File(dir, "a_orders.xlsx").toPath,
        wb("""<row r="1"><c r="A1" t="inlineStr"><is><t>h1</t></is></c></row>
             |<row r="2"><c r="A2"><v>1</v></c></row>""".stripMargin))
      Files.write(new File(dir, "b_orders.xlsx").toPath,
        wb("""<row r="1"><c r="A1" t="inlineStr"><is><t>OTHER</t></is></c></row>
             |<row r="2"><c r="A2"><v>2</v></c></row>""".stripMargin))
      val ex = intercept[org.apache.spark.SparkException] {
        Excel.readXlsx(spark, s"${dir.getAbsolutePath}/*orders*.xlsx").collect()
      }
      assert(ex.getMessage.contains("header mismatch") ||
        Option(ex.getCause).exists(_.getMessage.contains("header mismatch")))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
