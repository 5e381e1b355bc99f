package graft.mapper

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core.Iri
import scala.jdk.CollectionConverters._

/** Driver-side annotation triples (SURVEY.md §2.7 T4/T5): metadata-sized,
  * emitted as small Triple seqs and unioned with the row triples.
  */
object Annotations {

  private val mapper = new ObjectMapper()
  private val RdfType = Vocab.RdfType
  private val XsdNs = "http://www.w3.org/2001/XMLSchema#"

  /** Common-property expansion (`/root/reference/lib/rdf/tabular/metadata.rb:923-981`):
    * JSON-LD-ish values → triples. `key` is a prefixed name (contains ':')
    * or "notes" (→ csvw:note).
    */
  def commonProperty(subject: String, key: String, valueJson: String,
                     bnodeSeed: String, defaultLang: Option[String] = None): Seq[Triple] = {
    val pred =
      if (key == "notes") Vocab.Csvw + "note"
      else Iri.expand("", key)
    // bnode counter is scoped to this call: a JVM-global counter would make
    // repeated runs emit different labels, breaking determinism
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    expandValue(subj = subject, pred = pred, n = mapper.readTree(valueJson),
      bnodeBase = s"_:cp$bnodeSeed", counter = counter, defaultLang = defaultLang)
  }

  private def expandValue(subj: String, pred: String, n: JsonNode,
                          bnodeBase: String,
                          counter: java.util.concurrent.atomic.AtomicInteger,
                          defaultLang: Option[String] = None): Seq[Triple] = {
    if (n.isArray) {
      n.elements().asScala.toSeq.flatMap(e =>
        expandValue(subj, pred, e, bnodeBase, counter, defaultLang))
    } else if (n.isTextual) {
      // JSON-LD: a bare string under a context @language is a language-tagged
      // literal (`metadata.rb:940-942`); @value objects opt out unless they
      // carry their own @language
      Seq(Triple(subj, pred, n.asText(), obj_iri = false, defaultLang.orNull, null))
    } else if (n.isNumber) {
      val dt = if (n.isIntegralNumber) XsdNs + "integer" else XsdNs + "double"
      Seq(Triple(subj, pred, n.asText(), obj_iri = false, null, dt))
    } else if (n.isBoolean) {
      Seq(Triple(subj, pred, n.asText(), obj_iri = false, null, XsdNs + "boolean"))
    } else if (n.isObject) {
      if (n.has("@value")) {
        val v = n.get("@value").asText()
        val lang = Option(n.get("@language")).map(_.asText()).orNull
        val dt = Option(n.get("@type")).map(t => Iri.expand("", t.asText())).orNull
        Seq(Triple(subj, pred, v, obj_iri = false, lang, dt))
      } else {
        val nodeId = Option(n.get("@id")).map(i => Iri.expand("", i.asText()))
          .getOrElse(s"$bnodeBase.${counter.incrementAndGet()}")
        val head = Triple(subj, pred, nodeId, obj_iri = true, null, null)
        val typeTrs = Option(n.get("@type")).toSeq.flatMap { t =>
          val types = if (t.isArray) t.elements().asScala.toSeq else Seq(t)
          types.map(x => Triple(nodeId, RdfType, Iri.expand("", x.asText()), obj_iri = true, null, null))
        }
        val rest = n.properties().asScala.toSeq
          .filterNot(e => e.getKey.startsWith("@"))
          .flatMap { e =>
            val p = Iri.expand("", e.getKey)
            expandValue(nodeId, p, e.getValue, bnodeBase, counter, defaultLang)
          }
        head +: (typeTrs ++ rest)
      }
    } else Nil
  }

  /** Provenance activity (`reader.rb:234-261`): deterministic when given
    * fixed timestamps (the reference uses wall-clock; we inject for
    * reproducibility).
    */
  def provenance(groupResource: String, tableUrls: Seq[String],
                 metadataFiles: Seq[String],
                 startedAt: String, endedAt: String): Seq[Triple] = {
    val P = Vocab.Prov
    val a = "_:prov_activity"
    val base = Seq(
      Triple(groupResource, P + "wasGeneratedBy", a, obj_iri = true, null, null),
      Triple(a, RdfType, P + "Activity", obj_iri = true, null, null),
      Triple(a, P + "wasAssociatedWith", "https://example.org/graft-spark",
        obj_iri = true, null, null),
      Triple(a, P + "startedAtTime", startedAt, obj_iri = false, null, XsdNs + "dateTime"),
      Triple(a, P + "endedAtTime", endedAt, obj_iri = false, null, XsdNs + "dateTime"))
    def usage(id: String, entities: Seq[String], role: String) =
      if (entities.isEmpty) Nil
      else Seq(
        Triple(a, P + "qualifiedUsage", id, obj_iri = true, null, null),
        Triple(id, RdfType, P + "Usage", obj_iri = true, null, null),
        Triple(id, P + "hadRole", Vocab.Csvw + role, obj_iri = true, null, null)) ++
        entities.map(u => Triple(id, P + "entity", u, obj_iri = true, null, null))
    base ++
      usage("_:prov_usage1", tableUrls, "csvEncodedTabularData") ++
      usage("_:prov_usage2", metadataFiles, "tabularMetadata")
  }
}
