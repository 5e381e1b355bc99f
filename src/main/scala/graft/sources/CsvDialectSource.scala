package graft.sources

import graft.model.{ColumnMeta, DialectMeta}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** CSVW-dialect-aware CSV scan (SURVEY.md §2.1 S1/S5), re-expressing the
  * reference's `each_row` (`/root/reference/lib/rdf/tabular/metadata.rb:856-906`).
  *
  * Two paths:
  *  - [[read]]: the common dialect subset mapped straight onto Spark's
  *    distributed CSV source (splittable, pushdown-friendly) — the scale path.
  *  - [[readExact]]: full dialect semantics (skipRows, multi-row headers,
  *    comment collection, logical vs source row numbers) over
  *    `textFile.zipWithIndex` — CSVW metadata-driven files are config-scale
  *    inputs, so exact per-line bookkeeping beats splittability here; the
  *    100 TB path is the parquet/Iceberg transcript source, not CSV.
  */
object CsvDialectSource extends Serializable {

  /** Dialect → Spark CSV options (fast path; header ≤ 1, skipRows = 0).
    * `multiLine` makes quoted fields containing line terminators parse as
    * one record (the reference's Ruby CSV semantics) at the cost of
    * splittability — each file becomes one read unit, the standard Spark
    * trade-off for embedded-newline CSV.
    */
  def read(spark: SparkSession, path: String, dialect: DialectMeta): DataFrame = {
    var r = spark.read
      .option("sep", dialect.delimiter)
      .option("quote", dialect.quoteChar)
      .option("escape", if (dialect.doubleQuote) dialect.quoteChar else "\\")
      .option("encoding", dialect.encoding)
      .option("header", dialect.effectiveHeaderRowCount == 1)
      .option("multiLine", true)
      .option("mode", "PERMISSIVE")
    // Spark's default record separator already accepts \r\n and \n; a
    // single explicit custom terminator maps onto lineSep
    dialect.lineTerminators match {
      case one :: Nil if one != "\n" && one != "\r\n" => r = r.option("lineSep", one)
      case _ => ()
    }
    dialect.commentPrefix.foreach(p => r = r.option("comment", p.take(1)))
    val trim = dialect.effectiveTrim
    if (trim == "true" || trim == "start") r = r.option("ignoreLeadingWhiteSpace", true)
    if (trim == "true" || trim == "end") r = r.option("ignoreTrailingWhiteSpace", true)
    r.csv(path)
  }

  final case class ExactResult(
      rows: DataFrame,         // _row, _sourceRow, _c1.._cN (post-skipColumns)
      headerTitles: List[List[String]], // per physical column, one per header row
      comments: List[String])

  /** Exact `each_row` semantics with logical/source row numbering and
    * embedded-metadata header extraction (`metadata.rb:1794-1888`).
    *
    * Dialect `encoding` and custom `lineTerminators` are honored via a
    * driver-side decode leg, and quoted fields containing line terminators
    * are assembled into full records before numbering — the reference's
    * Ruby CSV counts RECORDS, not physical lines (`metadata.rb:887-902`:
    * `number + skipped` advance per `csv.shift`), so source numbers here are
    * record-based too. Multiline assembly is a sequential per-file fold;
    * CSVW metadata-driven files are config-scale inputs (the 100 TB path is
    * parquet/Iceberg), and the common no-embedded-newline case keeps the
    * distributed per-line scan after one cheap open-quote probe pass.
    */
  def readExact(spark: SparkSession, path: String, dialect: DialectMeta): ExactResult = {
    val defaultFraming =
      dialect.encoding.equalsIgnoreCase("utf-8") &&
        (dialect.lineTerminators == List("\r\n", "\n") || dialect.lineTerminators == List("\n"))
    val quoteCh = dialect.quoteChar.headOption.getOrElse('"')
    val delimCh = dialect.delimiter.head
    val dq = dialect.doubleQuote
    def multiline(physical: Seq[String]): Seq[(Long, String)] =
      assembleRecords(physical, delimCh, quoteCh, dq).zipWithIndex
        .map { case (rec, idx) => ((idx + 1).toLong, rec) }
    val lines =
      if (defaultFraming) {
        val raw = spark.sparkContext.textFile(path)
        val anyOpen = raw
          .mapPartitions(it => Iterator.single(it.exists(l => quoteOpenAtEnd(l, delimCh, quoteCh, dq))))
          .filter(identity).take(1).nonEmpty
        if (!anyOpen)
          // every line is a complete record: line number == record number
          raw.zipWithIndex().map { case (l, i) => (i + 1, l) }
        else
          // embedded line terminators: sequential record assembly (exact)
          spark.sparkContext.parallelize(multiline(raw.collect().toSeq))
      } else {
        // non-default charset / terminators: decode on the driver, then
        // distribute (single-document scale by construction)
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
        val text = new String(bytes, java.nio.charset.Charset.forName(dialect.encoding))
        val terms = dialect.lineTerminators.sortBy(-_.length)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var start = 0
        var i = 0
        while (i < text.length) {
          terms.find(t => text.startsWith(t, i)) match {
            case Some(t) => out += text.substring(start, i); i += t.length; start = i
            case None => i += 1
          }
        }
        if (start < text.length) out += text.substring(start)
        spark.sparkContext.parallelize(multiline(out.toSeq),
          math.max(out.size / 100000, 1))
      }
    val skip = dialect.skipRows
    val headerRows = dialect.effectiveHeaderRowCount
    val commentPfx = dialect.commentPrefix
    val delim = dialect.delimiter
    val quote = dialect.quoteChar.headOption.getOrElse('"')
    val doubleQuote = dialect.doubleQuote
    val trim = dialect.effectiveTrim
    val skipCols = dialect.skipColumns
    val skipBlank = dialect.skipBlankRows

    def parseLine(l: String): Array[String] = parseCsvLine(l, delim, quote, doubleQuote)
    def applyTrim(s: String): String = trim match {
      case "true" => s.trim
      case "start" => s.replaceAll("^\\s+", "")
      case "end" => s.replaceAll("\\s+$", "")
      case _ => s
    }

    // header region (driver-side; bounded by skipRows + headerRowCount)
    val headRegion = lines.filter(_._1 <= skip + headerRows).collect().sortBy(_._1)
    def commentOf(l0: String): Option[String] = {
      // dialect trim, then EXACTLY ONE leading character dropped and the
      // rest stripped (metadata.rb:1859 and :891 do value[1..-1].strip
      // regardless of the declared prefix length); in the skipRows region
      // EVERY non-empty line is a comment annotation, prefixed or not
      val l = applyTrim(l0)
      val v = commentPfx.filter(l.startsWith).map(_ => l.drop(1).trim).getOrElse(l)
      Some(v).filter(_.nonEmpty)
    }
    val headComments = headRegion.collect {
      case (n, l) if n <= skip => commentOf(l)
      case (_, l) if commentPfx.exists(l.startsWith) => commentOf(l)
    }.flatten.toList
    // data-region comment rows also annotate the table (metadata.rb:890-893)
    // — a driver collect bounded by the number of comment lines, and only
    // when the dialect declares a prefix at all
    val dataComments = commentPfx match {
      case None => Nil
      case Some(p) => lines
        .filter { case (n, l) => n > skip + headerRows && l.startsWith(p) }
        .collect().sortBy(_._1)
        .flatMap { case (_, l) => commentOf(l) }.toList
    }
    val comments = headComments ++ dataComments
    val headerLines = headRegion
      .filter { case (n, l) => n > skip && !commentPfx.exists(l.startsWith) }
      .map(_._2).toList
    val headerTitles: List[List[String]] =
      if (headerLines.isEmpty) Nil
      else {
        val parsed = headerLines.map(l => parseLine(l).drop(skipCols).map(applyTrim))
        val width = parsed.map(_.length).max
        (0 until width).toList.map(i => parsed.flatMap(r => r.lift(i)).filter(_.nonEmpty))
      }

    val dataLines = lines.filter(_._1 > skip + headerRows)
      .filter { case (_, l) => !commentPfx.exists(l.startsWith) }
      .map { case (n, l) => (n, parseLine(l).drop(skipCols).map(applyTrim)) }
      .filter { case (_, cells) => !skipBlank || cells.exists(_.nonEmpty) }
    // logical row number: 1-based among surviving rows — zipWithIndex after
    // filters; source order preserved because textFile partitions are
    // file-offset ordered
    val numbered = dataLines.zipWithIndex().map { case ((src, cells), i) =>
      Row.fromSeq((i + 1) +: src +: cells.toSeq)
    }
    val dataWidth = if (numbered.isEmpty()) 0
      else numbered.map(_.length - 2).max()
    // a header-only table is valid CSVW (zero row triples, clean
    // validation): it must still expose one _c slot per header column, or
    // downstream cell binding fails ANALYSIS instead of yielding zero rows
    val width = math.max(dataWidth, headerTitles.length)
    val padded = numbered.map { r =>
      val cells = r.toSeq.drop(2).map(_.asInstanceOf[String])
      Row.fromSeq(r.toSeq.take(2) ++ cells.padTo(width, ""))
    }
    val schema = StructType(
      StructField("_row", LongType) :: StructField("_sourceRow", LongType) ::
      (1 to width).map(i => StructField(s"_c$i", StringType)).toList)
    ExactResult(spark.createDataFrame(padded, schema), headerTitles, comments)
  }

  /** Embedded metadata: header titles → ColumnMeta list (`metadata.rb:1794-1888`);
    * titles carry the content language when declared (`metadata.rb:1812`).
    */
  def embeddedColumns(headerTitles: List[List[String]], lang: String = "und"): List[ColumnMeta] =
    headerTitles.map(ts => ColumnMeta(titles = ts.map(lang -> _)))

  /** True when `text` ends inside an open quoted region (same state machine
    * as [[parseCsvLine]]: a quote opens a region only at field start).
    */
  def quoteOpenAtEnd(text: String, delim: Char, quote: Char, doubleQuote: Boolean): Boolean = {
    var i = 0
    var inQ = false
    var fieldLen = 0
    while (i < text.length) {
      val c = text(i)
      if (inQ) {
        if (!doubleQuote && c == '\\' && i + 1 < text.length) { i += 1; fieldLen += 1 }
        else if (c == quote) {
          if (doubleQuote && i + 1 < text.length && text(i + 1) == quote) { i += 1; fieldLen += 1 }
          else inQ = false
        } else fieldLen += 1
      } else {
        if (c == quote && fieldLen == 0) inQ = true
        else if (c == delim) fieldLen = 0
        else fieldLen += 1
      }
      i += 1
    }
    inQ
  }

  /** Merge physical lines into CSV records: while a line leaves a quote
    * open, the next line continues the record (the swallowed terminator is
    * reinstated as "\n", matching Ruby CSV's row value for quoted embedded
    * newlines). An unterminated final quote emits the partial record as-is.
    */
  def assembleRecords(lines: Seq[String], delim: Char, quote: Char,
                      doubleQuote: Boolean): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur: StringBuilder = null
    lines.foreach { l =>
      if (cur == null) cur = new StringBuilder(l)
      else { cur += '\n'; cur ++= l }
      if (!quoteOpenAtEnd(cur.toString, delim, quote, doubleQuote)) {
        out += cur.toString; cur = null
      }
    }
    if (cur != null) out += cur.toString
    out.toSeq
  }

  /** Minimal RFC 4180 line parser honoring quoteChar/doubleQuote. With
    * `doubleQuote = false` the escape character is backslash instead of a
    * doubled quote (CSVW tabular-data-model dialect `doubleQuote`; the
    * reference defines the same mapping, `metadata.rb:1766-1770`
    * `escape_character = doubleQuote ? '"' : '\\'`) — inside a quoted
    * region `\x` yields `x` literally, matching the fast path's
    * Spark `escape` option ([[read]]).
    */
  def parseCsvLine(line: String, delim: String, quote: Char, doubleQuote: Boolean): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    val d = delim.head
    while (i < line.length) {
      val c = line(i)
      if (inQ) {
        if (!doubleQuote && c == '\\' && i + 1 < line.length) { sb += line(i + 1); i += 1 }
        else if (c == quote) {
          if (doubleQuote && i + 1 < line.length && line(i + 1) == quote) { sb += quote; i += 1 }
          else inQ = false
        } else sb += c
      } else {
        if (c == quote && sb.isEmpty) inQ = true
        else if (c == d) { out += sb.toString; sb.clear() }
        else sb += c
      }
      i += 1
    }
    out += sb.toString
    out.toArray
  }
}
