package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards: the round-2 performance work lives or dies
  * on these properties, so they are asserted, not just benchmarked.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = graft.mapper.TestSpark.spark
  import spark.implicits._

  // multi-partition source: a single-partition LocalTableScan would let the
  // planner elide the exchange entirely
  private def tripleDf = spark.range(0, 100, 1, 4).selectExpr(
    "CAST(id AS STRING) AS subj", "'p' AS pred",
    "CAST(id % 7 AS STRING) AS obj", "true AS obj_iri",
    "CAST(NULL AS STRING) AS lang", "CAST(NULL AS STRING) AS dtype")

  test("fused text/embedding expressions stay inside WholeStageCodegen") {
    import graft.functions.{AnnFunctions, TextFunctions}
    // parquet-backed source: LocalTableScan collapses projections and would
    // hide a codegen fallback
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // native array cast — a transform(cast) lambda would itself break the
    // codegen property this test guards
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    // a codegen'd Project prints with the `*(n)` stage marker; a fallback
    // (e.g. a no-codegen HOF in the tree — the round-3 tokens() bug) loses
    // it, silently interpreting the whole projection
    def codegenProject(plan: String, expr: String): Boolean =
      plan.linesIterator.exists(l =>
        l.contains("Project") && l.contains(expr) && l.trim.startsWith("*("))
    val pTok = docs.select(TextFunctions.shingles(col("text"), 3))
      .queryExecution.executedPlan.toString
    assert(codegenProject(pTok, "shinglesexpr(tokensexpr"), pTok)
    val pSig = docs.select(graft.functions.DedupFunctions.simhash(col("text")))
      .queryExecution.executedPlan.toString
    assert(codegenProject(pSig, "simhash64expr(tokensexpr"), pSig)
    val pIvf = emb.select(AnnFunctions.ivfCells(col("emb"), Array(Array(1.0, 0.0)), 1))
      .queryExecution.executedPlan.toString
    assert(codegenProject(pIvf, "ivfcellsexpr"), pIvf)
  }

  test("sink dedup: partial+final hash aggregate, no sort aggregate, one exchange") {
    val plan = tripleDf.dropDuplicates().queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    assert("Exchange".r.findAllMatchIn(plan).length == 1, plan)
  }

  test("bench flagship dedup keyset: hash aggregate only, one exchange") {
    val plan = tripleDf.select("subj", "pred", "obj").dropDuplicates()
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("SortAggregate"), plan)
    assert("Exchange".r.findAllMatchIn(plan).length == 1, plan)
  }

  test("triple mapper is exchange-free over its input (single narrow stage)") {
    val tr = Seq(("c1", 0, "user", "hello", "", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val triples = graft.streaming.TranscriptStream.triples(tr, graft.SparkEntry.transcriptTable)
    val plan = triples.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // the whole per-column triple construction flattens into ONE Generate
    assert("Generate".r.findAllMatchIn(plan).length == 1, plan)
  }

  test("stratified sampling: deterministic, rate-accurate, exchange-free") {
    import graft.functions.Sampling
    val docs = spark.range(0, 100000, 1, 8).selectExpr(
      "id AS doc_id", "CASE WHEN id % 4 = 0 THEN 'en' ELSE 'de' END AS lang")
    val sampled = Sampling.stratifiedSample(
      docs, "doc_id", col("lang"), Map("en" -> 0.5, "de" -> 0.1), 0.0)
    // pure filter over the scan: no exchange, stays in codegen
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // rerun-identical (pure function of the id, not of partitioning)
    val once = sampled.collect().map(_.getLong(0)).sorted.toSeq
    val again = Sampling.stratifiedSample(
      docs.repartition(3), "doc_id", col("lang"), Map("en" -> 0.5, "de" -> 0.1), 0.0)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(once == again)
    // rates hit within a few percent at n=25k/75k per stratum
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") / 25000.0 - 0.5) < 0.05, byLang)
    assert(math.abs(byLang("de") / 75000.0 - 0.1) < 0.03, byLang)
  }

  test("stratified sampling: derived stratum evaluated once; map probe == CASE chain") {
    import graft.functions.{Sampling, TextFunctions}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val derived = docs.select(col("doc_id"),
      TextFunctions.langId(col("text")).as("lang_pred"))
    val rates = Map("en" -> 0.5, "de" -> 0.25)
    val sampled = Sampling.stratifiedSample(derived, "doc_id", col("lang_pred"),
      rates, 0.1)
    // one langId tree in the pushed-down filter + one in the output
    // projection — the round-8 CASE chain re-inlined the derivation into
    // every rate arm (measured 1.10 s -> 0.61 s at sf0.1 for x6)
    val plan = sampled.queryExecution.executedPlan.toString
    val langIdTrees = "array_max".r.findAllIn(plan).length
    assert(langIdTrees <= 2, s"derived stratum inlined $langIdTrees times:\n$plan")
    // and the kept set is identical to the round-8 CASE-chain formulation
    val rateRef = rates.toSeq.sortBy(_._1).foldRight(lit(0.1): org.apache.spark.sql.Column) {
      case ((stratum, r), acc) => when(col("lang_pred") === stratum, lit(r)).otherwise(acc)
    }
    val ref = derived.filter(Sampling.hashUnit(col("doc_id")) < rateRef)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == ref)
  }

  test("capped Jaccard: shingle equi-joins only, no cartesian, no full-set rewalk") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.functions.DedupFunctions
      .ngramJaccardPairs(docs, "doc_id", "text", shingleSize = 3,
        threshold = 0.12, dfCap = Some(32L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the sub-cap candidate join and the hot-sliver rejoin are both
    // equi-joins keyed (in part) on the shingle hash
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan)
  }

  test("entity linking broadcasts the dictionary (no corpus shuffle)") {
    val corpus = (0 until 50).map(i => (i.toLong, s"text spark $i")).toDF("doc_id", "text")
    val dict = Seq(("e1", "spark")).toDF("entity_id", "surface")
    val plan = graft.link.EntityLink.mentions(corpus, dict, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
