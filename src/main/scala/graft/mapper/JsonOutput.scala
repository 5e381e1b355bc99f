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

  private def typedValue(c: ResolvedColumn, cell: Column): Column = {
    val vals = cell.getField("vals")
    def one = element_at(vals, 1)
    def typed(lex: Column): Column = c.datatypeBase match {
      case b if Xsd.NumericBases.contains(b) &&
        Set("double", "float", "number").contains(b) => lex.cast("double")
      case b if Xsd.NumericBases.contains(b) && b == "decimal" => lex.cast("decimal(38,12)")
      case b if Xsd.NumericBases.contains(b) => lex.cast("long")
      case "boolean" => lex.cast("boolean")
      case _ => lex
    }
    if (c.separator.isDefined) transform(vals, v => typed(v.getField("lex")))
    else when(cell.getField("isNull"), lit(null)).otherwise(typed(one.getField("lex")))
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
