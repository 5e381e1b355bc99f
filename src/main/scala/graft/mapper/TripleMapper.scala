package graft.mapper

import graft.core.{Iri, Xsd}
import graft.expr.CsvwFunctions
import graft.model.{ResolvedColumn, ResolvedTable}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One RDF statement. Blank nodes are encoded as `_:`-prefixed strings with
  * `objIsIri = true`; literals carry optional `lang`/`dtype`. A plain literal
  * (RDF 1.1 xsd:string) has both null.
  */
final case class Triple(
    subj: String, pred: String, obj: String,
    obj_iri: Boolean, lang: String, dtype: String)

object Vocab {
  val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val Csvw = "http://www.w3.org/ns/csvw#"
  val Prov = "http://www.w3.org/ns/prov#"
  val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  val RdfType = Rdf + "type"
  val RdfFirst = Rdf + "first"
  val RdfRest = Rdf + "rest"
  val RdfNil = Rdf + "nil"
}

/** Compiles a [[ResolvedTable]] mapping into a Catalyst plan fragment:
  * input rows → `Dataset`-shaped triples DataFrame with columns
  * `(subj, pred, obj, obj_iri, lang, dtype)`.
  *
  * Design (SURVEY.md §2.7): everything stays in expression land —
  * per-column [[graft.expr.CsvwCellExpr]] structs, URI-template expressions,
  * per-column `array<triple>` construction, one `flatten` + `explode`.
  * No Scala closures in the hot path, so the whole mapper is a single
  * WholeStageCodegen stage over the scan. Blank nodes are deterministically
  * skolemized from the caller-supplied per-row key (north rule: derived from
  * `(conv_id, turn_idx)` for transcripts), unlike the reference's fresh
  * process-local bnodes (`reader.rb:301-302`), so output is reproducible and
  * graph-isomorphism comparison reduces to set equality.
  */
object TripleMapper {

  val tripleStruct: StructType = StructType(Seq(
    StructField("subj", StringType),
    StructField("pred", StringType),
    StructField("obj", StringType),
    StructField("obj_iri", BooleanType),
    StructField("lang", StringType),
    StructField("dtype", StringType)))
  private val tripleArray = ArrayType(tripleStruct)

  private def tr(subj: Column, pred: Column, obj: Column, objIri: Column,
                 lang: Column, dtype: Column): Column =
    struct(subj.cast("string").as("subj"), pred.cast("string").as("pred"),
      obj.cast("string").as("obj"), objIri.cast("boolean").as("obj_iri"),
      lang.cast("string").as("lang"), dtype.cast("string").as("dtype"))

  private val nullS: Column = lit(null).cast("string")
  private def iriTr(s: Column, p: Column, o: Column): Column =
    tr(s, p, o, lit(true), nullS, nullS)
  private def emptyTriples: Column = array().cast(tripleArray)

  /** @param df      source rows
    * @param table   resolved CSVW mapping
    * @param inputs  source column per non-virtual CSVW column name
    *                (virtual columns receive empty string input)
    * @param skolem  per-row unique string key (drives bnode skolemization)
    * @param rownum  logical row number (`_row`, csvw:rownum)
    * @param sourceNum physical row number (`_sourceRow`, row URL fragment)
    * @param minimal minimal vs standard mode (`reader.rb:90`)
    * @param tableResource subject for table-level triples in standard mode
    */
  def triples(
      df: DataFrame,
      table: ResolvedTable,
      inputs: Map[String, Column],
      skolem: Column,
      rownum: Column,
      sourceNum: Column,
      minimal: Boolean = true,
      tableResource: String = "_:table1",
      withCellErrors: Boolean = false,
      carry: Seq[String] = Nil): DataFrame = {

    val base = table.url
    val cols = table.columns

    // stage 1: evaluate every cell once
    val cellNames = cols.map(c => s"__cell_${c.name}")
    var staged = df
      .withColumn("__skolem", skolem.cast("string"))
      .withColumn("__rownum", rownum.cast("long"))
      .withColumn("__srcnum", sourceNum.cast("long"))
    cols.zip(cellNames).foreach { case (c, cn) =>
      val in = if (c.virtual) lit("") else inputs.getOrElse(c.name, col(c.name)).cast("string")
      staged = staged.withColumn(cn, CsvwFunctions.csvwCell(in, c))
    }

    // backticks: unnamed (virtual) columns default to `_col.N` — a bare
    // col() reference would parse the dot as struct-field access
    def cell(c: ResolvedColumn): Column = col(s"`__cell_${c.name}`")
    def vals(c: ResolvedColumn): Column = cell(c).getField("vals")
    def isNullCell(c: ResolvedColumn): Column = cell(c).getField("isNull")

    // template variable map (metadata.rb:2050, 2120-2126): column name →
    // string (scalar; "" when null) or array<string> (list columns)
    val colVars: Seq[(String, Column)] = cols.map { c =>
      val v =
        if (c.separator.isDefined) transform(vals(c), x => x.getField("lex"))
        else coalesce(element_at(vals(c), 1).getField("lex"), lit(""))
      c.name -> v
    }
    val rowVars: Seq[(String, Column)] = Seq(
      "_row" -> col("__rownum").cast("string"),
      "_sourceRow" -> col("__srcnum").cast("string"))

    def expandTemplate(t: graft.core.UriTemplate.Compiled, c: ResolvedColumn): Column = {
      val cellVars = Seq(
        "_name" -> lit(Iri.pctDecode(c.name)),
        "_column" -> lit(c.number.toString),
        "_sourceColumn" -> lit(c.sourceNumber.toString))
      // only pass variables the template actually uses (keeps expr narrow)
      val used = t.parts.collect { case graft.core.UriTemplate.Expr(_, vs) => vs.map(_.name) }.flatten.toSet
      val vars = (colVars ++ rowVars ++ cellVars).filter(v => used.contains(v._1))
      CsvwFunctions.uriTemplate(t, base, vars)
    }

    val rowRes = concat(lit("_:r"), col("__skolem"))
    val defaultSubject = concat(lit("_:d"), col("__skolem"))

    // Hoist each distinct aboutUrl template into ONE staged column: the
    // expansion would otherwise be re-evaluated inside every per-column
    // triple lambda (visible as N copies of uritemplateexpandexpr in the
    // Generate node — lambda scopes defeat common-subexpression elimination).
    // only templates without per-cell variables (_name/_column/_sourceColumn)
    // are hoistable — those expand identically for every column
    def usesCellVars(t: graft.core.UriTemplate.Compiled): Boolean =
      t.parts.exists {
        case graft.core.UriTemplate.Expr(_, vs) =>
          vs.exists(v => v.name == "_name" || v.name == "_column" || v.name == "_sourceColumn")
        case _ => false
      }
    // staged-column names keyed by position in the deduplicated template
    // list — hashCode-keyed names could collide across distinct templates
    // (second withColumn silently wins → wrong subjects)
    val aboutTemplates: Map[String, String] = cols
      .flatMap(c => c.aboutUrl.filterNot(usesCellVars).map(_.template))
      .distinct.zipWithIndex
      .map { case (tmpl, i) => tmpl -> s"__about_$i" }
      .toMap
    aboutTemplates.foreach { case (tmpl, colName) =>
      val c = cols.find(_.aboutUrl.exists(_.template == tmpl)).get
      staged = staged.withColumn(colName, expandTemplate(c.aboutUrl.get, c))
    }

    // per-column subject / predicate / valueUrl
    def aboutOf(c: ResolvedColumn): Column =
      c.aboutUrl.map { t =>
        aboutTemplates.get(t.template).map(col).getOrElse(expandTemplate(t, c))
      }.getOrElse(defaultSubject)
    def predOf(c: ResolvedColumn): Column =
      c.propertyUrl.map(expandTemplate(_, c))
        .getOrElse(lit(Iri.recompose(Iri.parse(base).copy(fragment = Some(c.name)))))

    // literal lang/dtype rendering per element (metadata.rb:2091-2096, 2263-2276).
    // The plain-literal carve-out keys on the EXPANDED datatype, not the base:
    // a custom `@id` over base "string" emits a typed literal with that IRI
    // (`metadata.rb:2090` expanded_dt = datatype.id || expand(base), :2270).
    def litTr(c: ResolvedColumn, subj: Column, pred: Column, v: Column): Column = {
      val ok = v.getField("ok")
      val langLit = if (c.lang != "und") lit(c.lang) else nullS
      val (langC, dtypeC) =
        if (c.datatypeIri == Xsd.expandedIri("string")) (langLit, nullS)
        else (when(!ok, langLit).otherwise(nullS),
              when(ok, lit(c.datatypeIri)).otherwise(nullS))
      tr(subj, pred, v.getField("lex"), lit(false), langC, dtypeC)
    }

    // triples for one column
    def columnTriples(c: ResolvedColumn): Option[Column] = {
      if (c.suppressOutput) return None
      val about = aboutOf(c)
      val pred = predOf(c)
      val entity: Column = c.valueUrl match {
        case Some(vu) =>
          // valueUrl skipped when cell null and column non-virtual
          // (metadata.rb:1960-1961)
          val cond = if (c.virtual) lit(true) else !isNullCell(c)
          when(cond, array(iriTr(about, pred, expandTemplate(vu, c)))).otherwise(emptyTriples)
        case None if c.ordered && c.separator.isDefined =>
          // rdf:List emission (reader.rb:332-338): deterministic cons bnodes
          val n = size(vals(c))
          val bn: Column => Column = pos =>
            concat(lit("_:l"), col("__skolem"), lit("." + c.name + "."), pos.cast("string"))
          val head = when(n === 0, array(iriTr(about, pred, lit(Vocab.RdfNil))))
            .otherwise(array(iriTr(about, pred, bn(lit(0)))))
          val conses = flatten(zip_with(
            vals(c), sequence(lit(0), n - 1),
            (v, pos) => array(
              litTr(c, bn(pos), lit(Vocab.RdfFirst), v),
              iriTr(bn(pos), lit(Vocab.RdfRest),
                when(pos === n - 1, lit(Vocab.RdfNil)).otherwise(bn(pos + 1))))))
          concat(head, when(n > 0, conses).otherwise(emptyTriples))
        case None =>
          transform(vals(c), v => litTr(c, about, pred, v)).cast(tripleArray)
      }
      Some(entity)
    }

    // standard mode: one csvw:describes per *distinct* cell subject
    // (the reference emits one per cell, reader.rb:328, but RDF graph set
    // semantics collapse them; emitting distinct keeps row output exact)
    val describesTriples: Option[Column] =
      if (minimal) None
      else {
        val subjects = array_distinct(array(
          cols.filterNot(_.suppressOutput).map(c => aboutOf(c).cast("string")): _*))
        Some(transform(subjects,
          a => iriTr(rowRes, lit(Vocab.Csvw + "describes"), a)).cast(tripleArray))
      }

    // standard-mode row-level triples (reader.rb:301-311)
    val rowTriples: Option[Column] =
      if (minimal) None
      else {
        // the row url REPLACES any fragment the table url carries
        // (`metadata.rb:2134` `u.fragment = "row=#{sourceNumber}"` — an HTML
        // fragment table's rows live at <doc>#row=N, not <doc>#frag#row=N)
        val rowUrl = concat(lit(base.takeWhile(_ != '#') + "#row="),
          col("__srcnum").cast("string"))
        val titleTrs = table.rowTitles.flatMap { tn =>
          cols.find(_.name == tn).map { c =>
            transform(vals(c), v => litTr(c, rowRes, lit(Vocab.Csvw + "title"), v))
              .cast(tripleArray)
          }
        }
        val fixed = array(
          iriTr(lit(tableResource), lit(Vocab.Csvw + "row"), rowRes),
          tr(rowRes, lit(Vocab.Csvw + "rownum"), col("__rownum").cast("string"),
            lit(false), nullS, lit(Vocab.XsdInteger)),
          iriTr(rowRes, lit(Vocab.RdfType), lit(Vocab.Csvw + "Row")),
          iriTr(rowRes, lit(Vocab.Csvw + "url"), rowUrl))
        Some(titleTrs.foldLeft(fixed)((acc, t) => concat(acc, t)))
      }

    // Fused fast path: plain-literal columns (no valueUrl, no list emission)
    // whose predicate folds to a plan-time constant and whose subject is
    // either the default skolem or a hoisted aboutUrl column emit through
    // ONE LitTriplesExpr per subject group — a single preallocated array
    // fill per row instead of k transform lambdas + flatten intermediates.
    def staticPred(c: ResolvedColumn): Option[String] = c.propertyUrl match {
      case None => Some(Iri.recompose(Iri.parse(base).copy(fragment = Some(c.name))))
      case Some(t) => CsvwFunctions.constTemplate(t, base, Map(
        "_name" -> Iri.pctDecode(c.name),
        "_column" -> c.number.toString,
        "_sourceColumn" -> c.sourceNumber.toString))
    }
    val fusedCandidates: Seq[(String, ResolvedColumn, String)] =
      cols.filterNot(_.suppressOutput).flatMap { c =>
        val plainLit = c.valueUrl.isEmpty && !(c.ordered && c.separator.isDefined)
        val aboutKey: Option[String] = c.aboutUrl match {
          case None => Some("__default__")
          case Some(t) => aboutTemplates.get(t.template) // hoisted = row-constant
        }
        if (!plainLit) None
        else for {
          key <- aboutKey
          p <- staticPred(c)
        } yield (key, c, p)
      }
    val fusedNames = fusedCandidates.map(_._2.name).toSet
    val fusedParts: Seq[Column] = fusedCandidates.groupBy(_._1).toSeq
      .sortBy(_._1).map { case (key, entries) =>
        val about = if (key == "__default__") defaultSubject else col(key)
        graft.expr.CsvwFunctions.litTriples(
          about,
          entries.map { case (_, c, _) => vals(c) },
          entries.map { case (_, c, p) =>
            graft.expr.LitTripleSpec(
              pred = p,
              lang = if (c.lang != "und") c.lang else null,
              dtypeIri = if (c.datatypeIri == Xsd.expandedIri("string")) null
                         else c.datatypeIri,
              isString = c.datatypeIri == Xsd.expandedIri("string"))
          }).cast(tripleArray)
      }

    val allParts: Seq[Column] =
      rowTriples.toSeq ++ describesTriples.toSeq ++ fusedParts ++
        cols.filterNot(c => fusedNames.contains(c.name)).flatMap(columnTriples)
    val all = flatten(array(allParts: _*))

    // `carry` threads input columns (e.g. an event-time timestamp for
    // streaming-state TTL) through the explode unchanged
    val exploded = staged
      .select(Seq(col("__skolem"), explode(all).as("__t")) ++ carry.map(col): _*)
      .select(Seq(
        col("__t.subj").as("subj"), col("__t.pred").as("pred"),
        col("__t.obj").as("obj"), col("__t.obj_iri").as("obj_iri"),
        col("__t.lang").as("lang"), col("__t.dtype").as("dtype")) ++ carry.map(col): _*)
    exploded
  }

  /** Table/group-level boilerplate triples (standard mode, `reader.rb:183-276`),
    * driver-side constants to be unioned with the row triples.
    */
  def boilerplate(table: ResolvedTable, tableResource: String = "_:table1",
                  groupResource: String = "_:tg"): Seq[Triple] = Seq(
    Triple(groupResource, Vocab.RdfType, Vocab.Csvw + "TableGroup", obj_iri = true, null, null),
    Triple(groupResource, Vocab.Csvw + "table", tableResource, obj_iri = true, null, null),
    Triple(tableResource, Vocab.RdfType, Vocab.Csvw + "Table", obj_iri = true, null, null),
    Triple(tableResource, Vocab.Csvw + "url", table.url, obj_iri = true, null, null))

  /** Per-row cell errors as a side-output DataFrame (A5/error semantics):
    * `(skolem, column, error)`. Shares the staged cell computation shape.
    */
  def cellErrors(
      df: DataFrame,
      table: ResolvedTable,
      inputs: Map[String, Column],
      skolem: Column): DataFrame = {
    var staged = df.withColumn("__skolem", skolem.cast("string"))
    table.columns.foreach { c =>
      val in = if (c.virtual) lit("") else inputs.getOrElse(c.name, col(c.name)).cast("string")
      staged = staged.withColumn(s"__cell_${c.name}", CsvwFunctions.csvwCell(in, c))
    }
    val errCols = table.columns.map { c =>
      transform(col(s"`__cell_${c.name}`").getField("errs"),
        e => struct(lit(c.name).as("column"), e.as("error")))
    }
    staged
      .select(col("__skolem").as("row_key"), explode(flatten(array(errCols: _*))).as("e"))
      .select(col("row_key"), col("e.column").as("column"), col("e.error").as("error"))
  }
}
