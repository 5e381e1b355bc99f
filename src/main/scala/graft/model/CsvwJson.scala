package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Driver-side CSVW metadata JSON(-LD) parser, using the Jackson that ships
  * with Spark. Mirrors the reference's type-dispatch on `@type` / property
  * fingerprint (`/root/reference/lib/rdf/tabular/metadata.rb:255-310`):
  * `tables` → TableGroup, `url` → Table, `columns` → Schema.
  */
object CsvwJson {

  private val mapper = new ObjectMapper()

  def parseTableGroup(json: String): TableGroupMeta = fromNode(mapper.readTree(json))

  /** Accepts a TableGroup, a bare Table, or a bare Schema document and
    * normalizes to a TableGroup (as the reference's `for_input` does).
    */
  def fromNode(n: JsonNode): TableGroupMeta = {
    val tpe = optText(n, "@type")
    val ctxLang = contextLanguage(n)
    // the context @language applies to natural-language properties parsed
    // anywhere in this document (reference normalize!/set_nl), so it is the
    // default tag for bare (string/array) titles below
    val dl = ctxLang.getOrElse("und")
    if (n.has("tables") || tpe.contains("TableGroup")) {
      TableGroupMeta(
        tables = n.get("tables").elements().asScala.map(tableFrom(_, dl)).toList,
        dialect = Option(n.get("dialect")).map(dialectFrom),
        id = optText(n, "@id"),
        inherited = inheritedFrom(n),
        common = commonFrom(n),
        transformations = transformationsFrom(n, dl),
        contextLang = ctxLang)
    } else if (n.has("url") || tpe.contains("Table")) {
      TableGroupMeta(tables = List(tableFrom(n, dl)), contextLang = ctxLang)
    } else if (n.has("columns") || tpe.contains("Schema")) {
      TableGroupMeta(tables = List(TableMeta(url = "", tableSchema = Some(schemaFrom(n, dl)))),
        contextLang = ctxLang)
    } else throw new IllegalArgumentException("unrecognized CSVW metadata document")
  }

  /** Default language from the JSON-LD context: `"@context":
    * ["http://www.w3.org/ns/csvw", {"@language": "en"}]`
    * (`metadata.rb:1196-1207`). Applies to natural-language and common
    * properties, NOT to cell values (those use the inherited `lang`).
    */
  def contextLanguage(n: JsonNode): Option[String] =
    Option(n.get("@context")).toList.flatMap { c =>
      val objs = if (c.isArray) c.elements().asScala.toList else List(c)
      objs.filter(_.isObject).flatMap(o => optText(o, "@language"))
    }.headOption

  def tableFrom(n: JsonNode, dl: String = "und"): TableMeta = TableMeta(
    url = optText(n, "url").getOrElse(""),
    tableSchema = Option(n.get("tableSchema")).filter(_.isObject).map(schemaFrom(_, dl)),
    schemaRef = optText(n, "tableSchema"),
    suppressOutput = optBool(n, "suppressOutput").getOrElse(false),
    dialect = Option(n.get("dialect")).map(dialectFrom),
    notes = Option(n.get("notes")).map(strings).getOrElse(Nil),
    id = optText(n, "@id"),
    inherited = inheritedFrom(n),
    common = commonFrom(n),
    transformations = transformationsFrom(n, dl))

  /** `transformations` array → Template metadata objects
    * (`metadata.rb:1663-1672` PROPERTIES). Parsed, validated, surfaced —
    * never executed (parity with the reference, which yields them as
    * metadata without running scripts).
    */
  def transformationsFrom(n: JsonNode, dl: String = "und"): List[TransformationMeta] =
    Option(n.get("transformations")).filter(_.isArray).toList
      .flatMap(_.elements().asScala)
      .map(t => TransformationMeta(
        url = optText(t, "url").getOrElse(""),
        targetFormat = optText(t, "targetFormat"),
        scriptFormat = optText(t, "scriptFormat"),
        source = optText(t, "source"),
        titles = Option(t.get("titles")).map(titleStrings(_, dl)).getOrElse(Nil),
        id = optText(t, "@id")))

  /** Common properties: any key containing ':' plus `notes`
    * (`metadata.rb:923-981` / `reader.rb:186-192`). */
  def commonFrom(n: JsonNode): List[(String, String)] =
    n.properties().asScala.toList
      .filter(e => e.getKey.contains(":") || e.getKey == "notes")
      .map(e => e.getKey -> e.getValue.toString)

  def schemaFrom(n: JsonNode, dl: String = "und"): SchemaMeta = SchemaMeta(
    columns = Option(n.get("columns"))
      .map(_.elements().asScala.map(columnFrom(_, dl)).toList).getOrElse(Nil),
    primaryKey = Option(n.get("primaryKey")).map(strings).getOrElse(Nil),
    foreignKeys = Option(n.get("foreignKeys"))
      .map(_.elements().asScala.map(fkFrom).toList).getOrElse(Nil),
    rowTitles = Option(n.get("rowTitles")).map(strings).getOrElse(Nil),
    inherited = inheritedFrom(n))

  def columnFrom(n: JsonNode, dl: String = "und"): ColumnMeta = ColumnMeta(
    name = optText(n, "name"),
    titles = Option(n.get("titles")).map(titleStrings(_, dl)).getOrElse(Nil),
    virtual = optBool(n, "virtual").getOrElse(false),
    suppressOutput = optBool(n, "suppressOutput").getOrElse(false),
    inherited = inheritedFrom(n))

  def fkFrom(n: JsonNode): ForeignKeyMeta = {
    val ref = n.get("reference")
    ForeignKeyMeta(
      columnReference = strings(n.get("columnReference")),
      resource = optText(ref, "resource").orElse(optText(ref, "schemaReference")).getOrElse(""),
      referencedColumns = strings(ref.get("columnReference")))
  }

  def dialectFrom(n: JsonNode): DialectMeta = DialectMeta(
    delimiter = optText(n, "delimiter").getOrElse(","),
    quoteChar = optText(n, "quoteChar").getOrElse("\""),
    doubleQuote = optBool(n, "doubleQuote").getOrElse(true),
    encoding = optText(n, "encoding").getOrElse("utf-8"),
    header = optBool(n, "header").getOrElse(true),
    headerRowCount = optInt(n, "headerRowCount"),
    skipRows = optInt(n, "skipRows").getOrElse(0),
    skipColumns = optInt(n, "skipColumns").getOrElse(0),
    skipBlankRows = optBool(n, "skipBlankRows").getOrElse(false),
    skipInitialSpace = optBool(n, "skipInitialSpace").getOrElse(false),
    trim = optText(n, "trim").orElse(optBool(n, "trim").map(_.toString)),
    commentPrefix = optText(n, "commentPrefix"),
    lineTerminators = Option(n.get("lineTerminators")).map(strings)
      .getOrElse(List("\r\n", "\n")))

  def inheritedFrom(n: JsonNode): Inherited = Inherited(
    aboutUrl = optText(n, "aboutUrl"),
    datatype = Option(n.get("datatype")).map(datatypeFrom),
    default = optText(n, "default"),
    lang = optText(n, "lang"),
    nulls = Option(n.get("null")).map(strings),
    ordered = optBool(n, "ordered"),
    propertyUrl = optText(n, "propertyUrl"),
    required = optBool(n, "required"),
    separator = optText(n, "separator"),
    textDirection = optText(n, "textDirection"),
    valueUrl = optText(n, "valueUrl"))

  def datatypeFrom(n: JsonNode): DatatypeMeta =
    if (n.isTextual) DatatypeMeta(base = n.asText())
    else DatatypeMeta(
      base = optText(n, "base").getOrElse("string"),
      format = Option(n.get("format")).map { f =>
        if (f.isTextual) FormatSpec(pattern = Some(f.asText()))
        else FormatSpec(
          pattern = optText(f, "pattern"),
          groupChar = optText(f, "groupChar"),
          decimalChar = optText(f, "decimalChar"))
      },
      length = optInt(n, "length"),
      minLength = optInt(n, "minLength"),
      maxLength = optInt(n, "maxLength"),
      minimum = optNumText(n, "minimum"),
      maximum = optNumText(n, "maximum"),
      minInclusive = optNumText(n, "minInclusive"),
      maxInclusive = optNumText(n, "maxInclusive"),
      minExclusive = optNumText(n, "minExclusive"),
      maxExclusive = optNumText(n, "maxExclusive"),
      id = optText(n, "@id"))

  private def optText(n: JsonNode, f: String): Option[String] =
    Option(n).flatMap(x => Option(x.get(f))).filter(_.isTextual).map(_.asText())
  private def optNumText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filter(v => v.isTextual || v.isNumber).map(_.asText())
  private def optBool(n: JsonNode, f: String): Option[Boolean] =
    Option(n.get(f)).filter(_.isBoolean).map(_.asBoolean())
  private def optInt(n: JsonNode, f: String): Option[Int] =
    Option(n.get(f)).filter(_.isNumber).map(_.asInt())

  /** String or array-of-strings → list. */
  private def strings(n: JsonNode): List[String] =
    if (n == null) Nil
    else if (n.isTextual) List(n.asText())
    else if (n.isArray) n.elements().asScala.filter(_.isTextual).map(_.asText()).toList
    else Nil

  /** titles may be a string, array, or language map (`metadata.rb:1138-1139`);
    * normalized to ordered (lang, title) pairs. Bare (string / array) titles
    * take the document's context @language (`dl`), "und" when none — the
    * reference's normalize!/set_nl applies the context default to every
    * natural-language property; language-map keys are always explicit.
    */
  private def titleStrings(n: JsonNode, dl: String = "und"): List[(String, String)] =
    if (n.isTextual) List(dl -> n.asText())
    else if (n.isArray) n.elements().asScala.filter(_.isTextual).map(dl -> _.asText()).toList
    else if (n.isObject) n.properties().asScala.toList
      .flatMap(e => strings(e.getValue).map(e.getKey -> _))
    else Nil
}
