package graft.pipeline

import graft.functions.{AnnFunctions, DedupFunctions}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured ORGANIC recall of the two 100 TB-configuration blocking plans on
  * the real sf0.1 fixtures (not synthetic borderline corpora, not planted
  * copies): the capped low-threshold Jaccard join and the trained-codebook
  * IVF probe. Both scale arguments previously rested on bound arguments /
  * planted pairs only; these tests commit actual numbers. Skipped cleanly
  * when the sf0.1 fixtures are absent.
  */
class OrganicRecallSpec extends AnyFunSuite {
  lazy val spark = graft.mapper.TestSpark.spark

  private val SfDir = "/root/testdata/sf0.1"
  private def haveSf01 = java.nio.file.Files.exists(java.nio.file.Paths.get(SfDir))
  private def table(name: String): DataFrame =
    spark.read.parquet(s"$SfDir/$name.parquet")

  test("d4 capped (cap=32) organic recall vs uncapped truth at t=0.12, sf0.1") {
    assume(haveSf01, s"$SfDir not present")
    import spark.implicits._
    val docs = table("documents")
    def pairs(cap: Option[Long]): Set[(Long, Long)] =
      DedupFunctions.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.12, dfCap = cap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val truth = pairs(None) // exact uncapped join IS the ground truth
    val capped = pairs(Some(32L)) // the driver's 100 TB configuration
    assert(truth.nonEmpty, "sf0.1 corpus has no organic pairs at t=0.12")
    // the cap rule only ever DROPS candidates; verify is exact either way
    assert(capped.subsetOf(truth), "capped plan emitted a non-truth pair")
    val recall = capped.size.toDouble / truth.size
    info(f"d4 capped organic recall: ${capped.size}/${truth.size} = $recall%.4f")
    // committed floor (measured 2026-08-18): on the organic sf0.1 corpus
    // every t>=0.12 pair shares at least one sub-cap shingle — the
    // "all-overlap-is-stop-shingles" miss mode needs near-duplicate
    // boilerplate docs, which organic text doesn't produce
    assert(recall >= 0.99, f"capped recall $recall%.4f below committed floor")
  }

  test("IVF organic recall@10 with the TRAINED codebook at nprobe in {1,3,5}, sf0.1") {
    assume(haveSf01, s"$SfDir not present")
    import spark.implicits._
    val emb = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
    // same training configuration as the driver query (s3_ann_ivf)
    val centroids = AnnFunctions.trainCodebook(emb, "vec_id", "embedding",
      k = 16, iters = 2)
    val queries = emb.filter(col("vec_id") < 100)
    val k = 10
    val truth = AnnFunctions.bruteForceTopK(queries, emb,
        "vec_id", "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(truth.size == 100 * k, s"brute truth incomplete: ${truth.size}")
    val recalls = Seq(1, 3, 5, 16).map { nprobe =>
      val got = AnnFunctions.ivfTopK(queries, emb,
          "vec_id", "vec_id", "embedding", k, centroids, nprobe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val r = got.intersect(truth).size.toDouble / truth.size
      info(f"IVF organic recall@$k nprobe=$nprobe: $r%.4f")
      nprobe -> r
    }
    // more probes never lose candidates (cells are a superset)
    assert(recalls.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      recalls.toString)
    // Committed curve (measured 2026-08-18, k=16 trained codebook over the
    // 2000 organic sf0.1 vectors): 0.32 / 0.52 / 0.66 at nprobe 1/3/5.
    // These embeddings are near-uniform on the sphere — IVF's worst case,
    // since true neighbors at moderate cosine scatter across cells (the
    // planted-copy oracle pairs sit at cosine ~0.999 and co-locate, recall
    // 1.0). The honest statement for the 100 TB path: on unclustered data
    // the nprobe knob trades candidates for recall all the way to exact —
    // probing ALL cells must reproduce brute force bit-for-bit.
    val byProbe = recalls.toMap
    assert(byProbe(1) >= 0.25, f"nprobe=1 recall ${byProbe(1)}%.4f below floor")
    assert(byProbe(3) >= 0.45, f"nprobe=3 recall ${byProbe(3)}%.4f below floor")
    assert(byProbe(5) >= 0.58, f"nprobe=5 recall ${byProbe(5)}%.4f below floor")
    assert(byProbe(16) == 1.0, f"nprobe=k must equal brute force, got ${byProbe(16)}%.4f")
  }

  test("IVF recall@10 on a CLUSTERED corpus (planted Gaussians): >=0.9 at nprobe<=3") {
    // The organic sf0.1 curve above documents IVF's WORST case (near-uniform
    // vectors). This is the complementary regime the "use IVF where the
    // corpus is genuinely clustered" guidance points at: 16 planted Gaussian
    // clusters (seeded, deterministic), sigma small vs inter-center
    // distance, so true neighbors co-locate in codebook cells the way real
    // embedding corpora (near-dup families, topic clusters) do.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 32
    val nClusters = 16
    val perCluster = 125 // 2000 vectors, same scale as the organic corpus
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val v = Array.tabulate(dim)(d => centers(c)(d) + 0.15 * rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      ((c * perCluster + i).toLong, v.map(_ / norm))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val centroids = AnnFunctions.trainCodebook(emb, "vec_id", "embedding",
      k = nClusters, iters = 2)
    val queries = emb.filter(col("vec_id") % 20 === 0) // 100 queries, all clusters
    val k = 10
    val truth = AnnFunctions.bruteForceTopK(queries, emb,
        "vec_id", "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(truth.size == 100 * k, s"brute truth incomplete: ${truth.size}")
    val recalls = Seq(1, 3).map { nprobe =>
      val got = AnnFunctions.ivfTopK(queries, emb,
          "vec_id", "vec_id", "embedding", k, centroids, nprobe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val r = got.intersect(truth).size.toDouble / truth.size
      info(f"IVF clustered recall@$k nprobe=$nprobe: $r%.4f")
      nprobe -> r
    }.toMap
    // committed floors (measured 2026-08-18): on genuinely clustered data
    // the trained codebook recovers the planted structure and near-all true
    // neighbors live in the query's own (or first few) cells
    assert(recalls(3) >= 0.9, f"clustered nprobe=3 recall ${recalls(3)}%.4f below floor")
    assert(recalls(1) >= 0.7, f"clustered nprobe=1 recall ${recalls(1)}%.4f below floor")
  }

  test("d7 SemDeDup measured drop behavior on sf0.1: planted copies drop, zero organic drops") {
    assume(haveSf01, s"$SfDir not present")
    import spark.implicits._
    // the exact driver configuration (trained k=16 codebook, t=0.95),
    // at sf0.1: 2000 originals + 400 planted near-copies (vec_id >= 100000)
    val rows = graft.SparkEntry.queries("d7_semantic_dedup")(spark, SfDir)
      .as[(Long, Int, Boolean)].collect()
    val (copies, originals) = rows.partition(_._1 >= 100000L)
    assert(originals.length == 2000 && copies.length == 400, s"${rows.length}")
    // the organic corpus has no >=0.95-cosine pairs (max organic ~0.51,
    // AnnRecallSpec), so a dropped original would be a false positive
    val orgDrops = originals.count(!_._3)
    assert(orgDrops == 0, s"$orgDrops originals dropped — false-positive dups")
    // a planted copy (cosine >= 0.999 to its original) survives ONLY by
    // straddling a cell boundary — the within-cell blocking's one miss
    // mode, mitigated by the driver's nprobe=2 probe-side widening
    val dropRate = copies.count(!_._3).toDouble / copies.length
    info(f"d7 planted-copy drop rate (within-cell recall): $dropRate%.4f")
    // committed floor (measured 2026-08-18: nprobe=1 gave 0.9775 — 9/400
    // copies straddled a cell boundary on these near-uniform embeddings;
    // the round-8 nprobe=2 probe-side widening recovers the mate whenever
    // its cell is in the copy's top-2, measured 0.9950 — the residual 2
    // pairs tie-break into disjoint top-2 sets, the territory of a second
    // reseeded pass)
    assert(dropRate >= 0.99, f"d7 drop rate $dropRate%.4f below committed floor")
  }
}
