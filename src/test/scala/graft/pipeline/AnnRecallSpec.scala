package graft.pipeline

import graft.functions.{AnnFunctions, DedupFunctions}

import org.scalatest.funsuite.AnyFunSuite

/** Organic recall of the sign-sketch blocking, measured against exact brute
  * force on a corpus of BORDERLINE pairs (cosines spread just above the
  * threshold, angles 15°–25°) — not the near-identical planted copies the
  * driver oracle uses. Round 2's single table structurally missed ~6% of
  * pairs at cosine 0.93; OR-amplification (independent hyperplane tables)
  * closes that per the analytic formula in [[AnnFunctions.sketchRecall]].
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = graft.mapper.TestSpark.spark
  import spark.implicits._

  private val Dim = 16
  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  private def baseVec(i: Int): Array[Double] =
    normalize(Array.tabulate(Dim)(j => math.sin(i * 13.7 + j * 0.91) + 0.1))
  /** Partner at a controlled angle: rotate towards an orthogonalized
    * deterministic direction; angles 15°–25° give cosines ≈ 0.906–0.966.
    */
  private def partnerVec(i: Int): Array[Double] = {
    val u = baseVec(i)
    val d = Array.tabulate(Dim)(j => math.cos(i * 7.3 + j * 1.7))
    val proj = u.zip(d).map { case (a, b) => a * b }.sum
    val w = normalize(d.zip(u).map { case (b, a) => b - proj * a })
    val alpha = math.toRadians(15.0 + (i % 11))
    u.zip(w).map { case (a, b) => math.cos(alpha) * a + math.sin(alpha) * b }
  }

  private val vecs: Seq[(Long, Array[Double])] =
    (0 until 60).map(i => (i.toLong, baseVec(i))) ++
    (0 until 60).map(i => ((1000 + i).toLong, partnerVec(i)))

  private def cosine(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))

  private val threshold = 0.9
  private lazy val truth: Set[(Long, Long)] = (for {
    i <- vecs.indices; j <- (i + 1) until vecs.size
    if cosine(vecs(i)._2, vecs(j)._2) >= threshold
  } yield {
    val (a, b) = (vecs(i)._1, vecs(j)._1)
    (math.min(a, b), math.max(a, b))
  }).toSet

  private def found(tables: Int): Set[(Long, Long)] = {
    val df = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    DedupFunctions.embeddingDupPairs(df, "vec_id", "embedding",
      threshold = threshold, planes = 8, probeBits = 2, tables = tables)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("corpus is genuinely borderline (pairs spread across 0.90..0.97)") {
    assert(truth.size >= 55, s"expected >=55 true pairs, got ${truth.size}")
    val cosines = truth.toSeq.map { case (a, b) =>
      cosine(vecs.find(_._1 == a).get._2, vecs.find(_._1 == b).get._2)
    }
    assert(cosines.min < 0.93 && cosines.max > 0.95,
      s"cosine spread [${cosines.min}, ${cosines.max}] must straddle the borderline band")
  }

  test("OR-amplified blocking (tables=3) reaches >=0.95 organic recall vs brute force") {
    val f3 = found(3)
    assert(f3.subsetOf(truth), "exact cosine verification admits no false positives")
    val recall = f3.size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall (${f3.size}/${truth.size}) below target 0.95")
    // and at least as many pairs as a single table — amplification never loses
    assert(found(1).size <= f3.size)
  }

  test("sketchRecall formula: documented values and monotonicity in tables") {
    val p1 = AnnFunctions.sketchRecall(0.93, 8, 2, 1)
    assert(p1 > 0.92 && p1 < 0.96, s"single-table recall at 0.93 ~ 0.94, got $p1")
    val p2 = AnnFunctions.sketchRecall(0.93, 8, 2, 2)
    assert(p2 > 0.99, s"two tables at 0.93 ~ 0.996, got $p2")
    assert(Seq(1, 2, 3, 4).map(AnnFunctions.sketchRecall(0.9, 8, 2, _))
      .sliding(2).forall { case Seq(a, b) => b >= a })
  }
}
