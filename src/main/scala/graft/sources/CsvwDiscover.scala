package graft.sources

import graft.model.{CsvwJson, TableGroupMeta, TableMeta}
import java.nio.file.{Files, Path, Paths}

/** Metadata discovery for local files (SURVEY.md §2.1 S4), the file-system
  * subset of the reference's precedence (`/root/reference/lib/rdf/tabular/metadata.rb:180-251`):
  * user-supplied metadata → site-wide config templates
  * (`.well-known/csvm`, RFC 6570-expanded with `{+url}`) → defaults
  * (`{+url}-metadata.json`, `csv-metadata.json`, `tabular.rb:31-35`) →
  * synthesized TableGroup from the tabular file alone. HTTP legs are out of
  * scope (§7.5).
  */
object CsvwDiscover {

  val DefaultTemplates = List("{+url}-metadata.json", "csv-metadata.json")

  /** Resolve the metadata document for a tabular input file. */
  def forInput(csvPath: String, userMetadata: Option[String] = None): TableGroupMeta = {
    userMetadata match {
      case Some(m) => withTableUrl(CsvwJson.parseTableGroup(readFile(Paths.get(m))), csvPath)
      case None =>
        val p = Paths.get(csvPath)
        val dir = Option(p.getParent).getOrElse(Paths.get("."))
        val templates = siteWideTemplates(dir)
        val candidates = templates.flatMap { t =>
          val expanded = graft.core.UriTemplate.compile(t)
            .expand(Map("url" -> csvPath))
          val cand = if (expanded.startsWith("/")) Paths.get(expanded)
                     else dir.resolve(Paths.get(expanded).getFileName)
          // {+url}-metadata.json expands against the full path; plain names
          // resolve next to the tabular file
          val full = if (t.contains("{+url}")) Paths.get(expanded) else cand
          if (Files.exists(full)) Some(full) else None
        }
        candidates.headOption match {
          case Some(m) => withTableUrl(CsvwJson.parseTableGroup(readFile(m)), csvPath)
          case None => // synthesized TableGroup (embedded metadata fills columns later)
            TableGroupMeta(tables = List(TableMeta(url = csvPath)))
        }
    }
  }

  /** `.well-known/csvm` template list, falling back to the spec defaults. */
  def siteWideTemplates(dir: Path): List[String] = {
    val wk = dir.resolve(".well-known").resolve("csvm")
    if (Files.exists(wk))
      readFile(wk).linesIterator.map(_.trim).filter(_.nonEmpty).toList
    else DefaultTemplates
  }

  /** A discovered group may omit table urls (bare-schema docs); point the
    * first table at the input.
    */
  private def withTableUrl(tg: TableGroupMeta, csvPath: String): TableGroupMeta =
    if (tg.tables.exists(_.url.nonEmpty)) tg
    else tg.copy(tables = tg.tables match {
      case head :: rest => head.copy(url = csvPath) :: rest
      case Nil => List(TableMeta(url = csvPath))
    })

  private def readFile(p: Path): String = new String(Files.readAllBytes(p), "UTF-8")
}
