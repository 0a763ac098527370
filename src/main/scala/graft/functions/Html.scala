package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML / scraped-text parsing combinators (SURVEY.md §2.1 S10 + §2.7
  * X9/X10/X13): the reference's row-splitting and Russian-date parsing
  * (server/parse.ts:5-53, server/scrape.ts:399-432,510-532) as pure
  * Catalyst expressions over captured page fixtures. The scraper itself
  * (browser, network) is a source boundary outside the engine; the
  * engine parses whatever the capture layer landed.
  */
object Html {

  /** Russian month-name genitive → month number (scrape.ts:399-412). */
  val RuMonths: Seq[(String, Int)] = Seq(
    "января" -> 1, "февраля" -> 2, "марта" -> 3, "апреля" -> 4,
    "мая" -> 5, "июня" -> 6, "июля" -> 7, "августа" -> 8,
    "сентября" -> 9, "октября" -> 10, "ноября" -> 11, "декабря" -> 12)

  /** X9 — `"12 сентября"` → date in `year` (null on unknown month /
    * missing day). Map-literal lookup + regex — no UDF.
    */
  def ruMonthDate(text: Column, year: Int): Column = {
    val monthMap = map(RuMonths.flatMap { case (n, m) =>
      Seq(lit(n), lit(m)) }: _*)
    // one combined pattern: the month name must FOLLOW the day number
    // ("Постамат: 12 сентября" would otherwise match "остамат" as the
    // first lowercase-cyrillic run)
    val day = regexp_extract(text, "(\\d{1,2})\\s*([а-яё]+)", 1)
    val monthName = regexp_extract(text, "(\\d{1,2})\\s*([а-яё]+)", 2)
    val month = element_at(monthMap, monthName)
    when(day =!= "" && month.isNotNull,
      F.dayFirstDate(concat(day, lit("."), month, lit(s".$year"))))
      .otherwise(lit(null).cast("date"))
  }

  /** Extract the text of `<span class="cls">…</span>` within a chunk
    * (S10 row splitting itself lives in Parsing.parseSellers, where the
    * chunks keep their page positions for deterministic row ids).
    */
  def spanText(chunk: Column, cls: String): Column =
    regexp_extract(chunk, "class=\"" + cls + "\">([^<]*)<", 1)

  /** X10 — delivery-text normalization (scrape.ts:414-432): from a
    * multi-line delivery blurb, pick the postamat and courier lines,
    * parse their Russian dates, emit the reference's compact
    * `"postamat - <date>, delivery - <date>"` form ("—" when absent).
    * Pure higher-order array expressions — no UDF.
    */
  def normalizeDeliveryText(text: Column, year: Int): Column = {
    val lines = split(text, "\n")
    // try_element_at: the filtered array is empty when no line matches,
    // and plain element_at throws under ANSI mode
    def firstLineWith(needle: String): Column =
      try_element_at(filter(lines, l => instr(lower(l), needle) > 0), lit(1))
    def fmt(line: Column): Column =
      coalesce(date_format(ruMonthDate(line, year), "d.M.yyyy"), lit("—"))
    format_string("postamat - %s, delivery - %s",
      fmt(firstLineWith("постамат")), fmt(firstLineWith("доставка")))
  }

  /** X13 — numeric size from labels like `"42/M RUS"` (scrape.ts:510-516). */
  def sizeNumber(label: Column): Column =
    regexp_extract(label, "(\\d{2,3})", 1).try_cast("int")

  /** X13/X14 — first-upper color normalization (scrape.ts:524-532,481). */
  def colorCap(color: Column): Column = initcap(color)
}
