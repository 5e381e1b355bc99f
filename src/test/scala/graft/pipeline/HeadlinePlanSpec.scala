package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Executable plan-regression guard for the headline queries: the PLANS.md
  * exchange audit as assertions. A future change that adds a shuffle (or
  * degrades a hash aggregate to a sort aggregate, or turns an equi-join
  * into a cartesian) fails the suite instead of surfacing as a bench delta
  * in a noisy host window. Budgets are the AUDITED shuffle counts of the
  * committed plans — equality, not upper bounds, so an accidental
  * improvement is re-audited too.
  */
class HeadlinePlanSpec extends AnyFunSuite {
  lazy val spark = graft.mapper.TestSpark.spark

  private val Sf = "/root/testdata/sf0.001"

  /** name -> (shuffle budget, broadcast budget). Streaming queries are
    * excluded (plans only exist per microbatch); j4 and g2 are iterative
    * (per-round CC plans, audited in DedupScaleSpec's convergence tests);
    * s1 is the documented brute-force cartesian baseline.
    */
  private val budgets: Seq[(String, Int, Int)] = Seq(
    ("t1_triples_minimal", 1, 0),
    ("t2_rdf_list", 0, 0),
    ("t3_triples_standard", 1, 0),
    ("g1_graph_materialize", 2, 0),
    ("q1_agg", 1, 0),
    ("q3_window", 1, 0),
    ("k1_salted_agg", 3, 0),
    ("j3_entity_link", 2, 1),
    ("d1_dedup_exact", 1, 0),
    ("d3_simhash", 2, 1),
    ("d4_ngram_jaccard", 1, 1),
    ("d4_jaccard_capped", 8, 10),
    ("d5_embedding_dup", 1, 3),
    ("s2_ann_lsh", 2, 3),
    // ADC partial-sum agg + query-keyed top-k window; LUT broadcast —
    // the corpus side carries only m-int codes, never raw vectors
    ("s4_ann_pq", 2, 1),
    // s4's two exchanges; the re-rank legs are all broadcast joins at
    // spec scale (candidate list + query vectors), no extra shuffle
    ("s5_ann_pq_rerank", 2, 3),
    ("s7_json_minimal", 1, 0),
    ("x5_token_bpe", 0, 0),
    ("x6_stratified_sample", 0, 0),
    // eval-shingle distinct + matched-rows agg; eval side broadcasts
    ("x7_decontaminate", 2, 1),
    ("x8_pii_redact", 0, 0),
    ("x9_repetition", 0, 0),
    ("x11_url_filter", 0, 0),
    // vocab agg + doc agg; vocab broadcast + AQE-broadcast doc left-join
    ("x10_word_rarity", 2, 2),
    // keep-flag agg is the one exchange at spec scale; NO hard hints —
    // the owner side of the probe join broadcasts by stats here, at data
    // scale AQE picks a cell-keyed join (round-8: the drop-set broadcast,
    // which grew with the dup fraction, is gone)
    ("d7_semantic_dedup", 1, 1),
    // line-df agg + doc reassembly agg; boilerplate table broadcasts by
    // stats/AQE here (no hard hint — it is corpus-dependent at fixed minDf)
    ("x12_line_dedup", 2, 1),
    // block-sum agg + n_blocks single-partition window + block-keyed window;
    // block offsets broadcast (bounded: maxBlocks raise guard)
    ("x13_seq_pack", 3, 1),
    // x13's three exchanges; the chunk explode is map-only on top
    ("x14_pack_chunks", 3, 1),
    // domain-count agg; the two whole-frame windows run over #domains
    // rows (metadata tier) in ONE deliberate single-partition exchange
    ("x15_domain_weights", 2, 0),
    // one conv-keyed hash aggregate
    ("x16_loss_mask", 1, 0),
    // m4: ONE round-robin exchange of bare 8-byte ids BEFORE payload
    // synthesis (round 9): the single-file fixture scan is one
    // unsplittable input split, so the ImageIO raster leg ran on one task
    // (1.39 s) while 31 cores idled; the codec/map work itself is still a
    // single shuffle-free stage after the spread (0.39 s), and a
    // data-scale input (≥ cores partitions) skips the exchange entirely.
    // The audio legs stay 0-exchange — measured slower parallelized
    // (javax.sound provider lookup serializes across tasks).
    ("m4_resize_reencode", 1, 0),
    ("m5_audio_decode", 0, 0),
    ("m6_audio_resample", 0, 0),
    ("m7_audio_lowpass", 0, 0),
    ("q2_join_broadcast", 1, 1),
    ("q4_sort_limit", 0, 0),
    ("d2_minhash_lsh", 2, 3),
    ("j1_fk_violations", 2, 1),
    ("a1_pk_duplicates", 1, 0),
    ("a2_fk_dup_targets", 1, 0),
    ("a3_comment_rows", 0, 0),
    ("r1_reader_open", 0, 0))

  budgets.foreach { case (name, shuffleBudget, broadcastBudget) =>
    test(s"$name: shuffle budget $shuffleBudget, broadcast budget $broadcastBudget") {
      val df = graft.SparkEntry.queries(name)(spark, Sf)
      val plan = df.queryExecution.executedPlan.toString
      val shuffles = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("BroadcastExchange")
          && !l.contains("ReusedExchange"))
      val broadcasts = plan.linesIterator.count(l =>
        l.contains("BroadcastExchange"))
      info(s"$name shuffles=$shuffles broadcasts=$broadcasts")
      assert(shuffles == shuffleBudget,
        s"$name: expected $shuffleBudget shuffles, got $shuffles\n$plan")
      assert(broadcasts == broadcastBudget,
        s"$name: expected $broadcastBudget broadcasts, got $broadcasts\n$plan")
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      // dedup/agg stages must stay hash-based — a sort aggregate on a
      // data-scale key is the round-1 regression this suite exists to catch
      assert(!plan.contains("SortAggregate"), plan)
    }
  }
}
