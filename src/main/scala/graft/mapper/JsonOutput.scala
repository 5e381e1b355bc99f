package graft.mapper

import graft.expr.CsvwFunctions
import graft.model.{ResolvedColumn, ResolvedTable}
import graft.core.Xsd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CSVW→JSON output (SURVEY.md §2.1 S7 / §2.7 T6), the analog of the
  * reference's `to_hash` (`/root/reference/lib/rdf/tabular/reader.rb:456-637`):
  * minimal mode emits one "describes" object per row — keys are column
  * names, values typed (numbers unboxed, booleans native, lists as arrays),
  * null cells omitted, `@id` present when the row has an aboutUrl.
  *
  * Built as a single `to_json(struct(...))` projection — stays in codegen,
  * no driver-side assembly; standard-mode nesting (tables→rows→describes)
  * is a driver-side wrap of this same per-row output for document-sized
  * results.
  */
object JsonOutput {

  /** JSON-escape an arbitrary string column: render `{"v":…}` compactly and
    * strip the fixed 5-char prefix and closing brace, leaving the quoted
    * escaped JSON string literal.
    */
  private def jsonEscaped(s: Column): Column = {
    val j = to_json(struct(s.as("v")))
    j.substr(lit(6), length(j) - 6)
  }

  /** Per-cell value as a VARIANT so each *cell* carries its own JSON type,
    * matching the reference's `to_hash` (`reader.rb:565-617`): valid
    * numeric/boolean cells are bare JSON literals (integers beyond Long
    * range stay numbers — no silent null from a lossy cast), while invalid
    * cells (`ok=false`) and non-JSON lexicals (NaN/INF) degrade to JSON
    * strings instead of being dropped.
    */
  private def typedValue(c: ResolvedColumn, cell: Column): Column = {
    val vals = cell.getField("vals")
    def variantOf(v: Column): Column = {
      val lex = v.getField("lex")
      val ok = v.getField("ok")
      if (Xsd.NumericBases.contains(c.datatypeBase) || c.datatypeBase == "boolean")
        coalesce(when(ok, try_parse_json(lex)), try_parse_json(jsonEscaped(lex)))
      else try_parse_json(jsonEscaped(lex))
    }
    if (c.separator.isDefined) transform(vals, variantOf(_))
    else when(cell.getField("isNull"), lit(null)).otherwise(variantOf(element_at(vals, 1)))
  }

  /** Minimal-mode JSON rows: one JSON document string per input row. */
  def minimalRows(df: DataFrame, table: ResolvedTable,
                  inputs: Map[String, Column],
                  skolem: Column, rownum: Column, sourceNum: Column): DataFrame =
    minimalStaged(df, table, inputs, skolem, rownum, sourceNum).select("json")

  /** json + row metadata (for standard-mode assembly). */
  def describedRows(df: DataFrame, table: ResolvedTable,
                    inputs: Map[String, Column],
                    skolem: Column, rownum: Column, sourceNum: Column): DataFrame =
    minimalStaged(df, table, inputs, skolem, rownum, sourceNum)
      .select(col("json"), col("__rownum").as("__rn"), col("__srcnum").as("__src"))

  private def minimalStaged(df: DataFrame, table: ResolvedTable,
                  inputs: Map[String, Column],
                  skolem: Column, rownum: Column, sourceNum: Column): DataFrame = {
    var staged = df
      .withColumn("__skolem", skolem.cast("string"))
      .withColumn("__rownum", rownum.cast("long"))
      .withColumn("__srcnum", sourceNum.cast("long"))
    table.columns.foreach { c =>
      val in = if (c.virtual) lit("") else inputs.getOrElse(c.name, col(c.name)).cast("string")
      staged = staged.withColumn(s"__cell_${c.name}", CsvwFunctions.csvwCell(in, c))
    }
    val emitted = table.columns.filterNot(_.suppressOutput)
    // @id from the first column's aboutUrl template when present
    val aboutCols: Seq[Column] = table.columns.find(c => c.aboutUrl.isDefined).map { c =>
      val colVars = table.columns.map { cc =>
        val cell = col(s"__cell_${cc.name}")
        val v =
          if (cc.separator.isDefined) transform(cell.getField("vals"), x => x.getField("lex"))
          else coalesce(element_at(cell.getField("vals"), 1).getField("lex"), lit(""))
        cc.name -> v
      }
      val rowVars = Seq(
        "_row" -> col("__rownum").cast("string"),
        "_sourceRow" -> col("__srcnum").cast("string"),
        "_name" -> lit(graft.core.Iri.pctDecode(c.name)))
      val t = c.aboutUrl.get
      val used = t.parts.collect { case graft.core.UriTemplate.Expr(_, vs) => vs.map(_.name) }.flatten.toSet
      CsvwFunctions.uriTemplate(t, table.url,
        (colVars ++ rowVars).filter(v => used.contains(v._1))).as("@id")
    }.toSeq
    val fields = aboutCols ++ emitted.map { c =>
      typedValue(c, col(s"__cell_${c.name}")).as(c.name)
    }
    staged.select(
      to_json(struct(fields: _*), Map("ignoreNullFields" -> "true")).as("json"),
      col("__rownum"), col("__srcnum"))
  }

  /** Standard-mode JSON document (`reader.rb:456-637` `to_hash`):
    * `{"tables":[{"url":…,"row":[{"url":"#row=N","rownum":n,"describes":[…]}]}]}`.
    * Driver-side assembly — the reference's standard output is a single
    * document, so this is inherently document-sized; the per-row describes
    * objects are still computed distributed via [[minimalRows]].
    */
  def standardDocument(tables: Seq[(ResolvedTable, DataFrame)]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val tablesArr = root.putArray("tables")
    tables.foreach { case (t, described) =>
      val tNode = tablesArr.addObject()
      tNode.put("url", t.url)
      val rowArr = tNode.putArray("row")
      described.select(col("json"), col("__rn"), col("__src"))
        .collect().sortBy(_.getLong(1))
        .foreach { r =>
          val rowNode = rowArr.addObject()
          rowNode.put("url", s"${t.url}#row=${r.getLong(2)}")
          rowNode.put("rownum", r.getLong(1))
          rowNode.putArray("describes").add(mapper.readTree(r.getString(0)))
        }
    }
    mapper.writeValueAsString(root)
  }
}
