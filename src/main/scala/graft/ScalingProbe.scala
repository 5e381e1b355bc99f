package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-level scaling profile of the flagship pipeline —
  * separates scan+map (triple construction) from the dedup shuffle, at
  * several thread counts and shuffle configs, to locate the scaling
  * bottleneck rather than guess at it.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val turns = sys.env.getOrElse("PROBE_TURNS", "6000000").toLong
    val corpus = "/tmp/graft_probe_corpus"

    def session(cores: Int, parts: Int, shm: Boolean): SparkSession = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val b = SparkSession.builder().master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      if (shm) b.config("spark.local.dir", "/dev/shm/graft_spark_local")
      val s = b.getOrCreate(); s.sparkContext.setLogLevel("ERROR"); s
    }

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpus, "_SUCCESS"))) {
      val s = session(32, 64, shm = false)
      graft.sources.TranscriptGen.transcripts(s, turns)
        .write.mode("overwrite").parquet(corpus)
      s.stop()
    }

    def mapOnly(s: SparkSession): Long = {
      val tr = s.read.parquet(corpus)
      graft.streaming.TranscriptStream.triples(tr, SparkEntry.transcriptTable).count()
    }
    def withDedup(s: SparkSession): Long = {
      val tr = s.read.parquet(corpus)
      val t3 = graft.streaming.TranscriptStream.triples(tr, SparkEntry.transcriptTable)
      val n = s.conf.get("spark.sql.shuffle.partitions").toInt
      t3.repartition(n, col("subj"), col("pred"), col("obj"))
        .dropDuplicates(Seq("subj", "pred", "obj")).count()
    }

    for (shm <- Seq(false, true); cores <- Seq(8, 32)) {
      val parts = cores * 2
      val s = session(cores, parts, shm)
      mapOnly(s) // warm
      var t0 = System.nanoTime(); mapOnly(s)
      val tMap = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); withDedup(s)
      val tAll = (System.nanoTime() - t0) / 1e9
      println(f"PROBE shm=$shm cores=$cores parts=$parts map=${tMap}%.1fs full=${tAll}%.1fs dedup=${tAll - tMap}%.1fs")
      s.stop()
    }
  }
}
