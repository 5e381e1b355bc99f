package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One isolated scaling measurement: fresh JVM per (cores) configuration so
  * successive runs don't inherit GC/code-cache state from each other —
  * measured order effects in a shared JVM distorted same-input runs by >2×.
  * Spawned by [[Bench]]; prints one `WORKER_RESULT <triples> <seconds>` line.
  */
object BenchWorker {

  def session(cores: Int): SparkSession = {
    // GRAFT_BENCH_MASTER=lc runs a LOCAL CLUSTER: cores/4 real executor JVMs
    // with 4 cores + their own heap each — the faithful N vs 4N proxy (a
    // real cluster scales memory and GC capacity with executor count; a
    // single fixed-heap JVM starves per-core memory at the high end and
    // under-reports scaling efficiency).
    val lc = sys.env.get("GRAFT_BENCH_MASTER").contains("lc")
    val coresPerExec = 4
    val execMemMb = sys.env.getOrElse("GRAFT_BENCH_EXEC_MEM_MB", "4096").toInt
    val master =
      if (lc) s"local-cluster[${math.max(cores / coresPerExec, 1)},$coresPerExec,$execMemMb]"
      else s"local[$cores]"
    // tmpfs shuffle dirs when available: local shuffles are disk-bound
    // otherwise and the N-vs-4N comparison would measure the disk, not the
    // engine (executors inherit spark.local.dir through the worker)
    val localDir = {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(shm)) {
        val d = shm.resolve("graft_spark_worker")
        java.nio.file.Files.createDirectories(d)
        Some(d.toString)
      } else None
    }
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-bench-worker-$cores")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the bench corpus compresses to ~70 MB: the 128 MB default split size
      // puts the ENTIRE scan in one task for every thread count, making the
      // scaling comparison measure the split planner, not the engine. 2 MB
      // splits give both configs enough scan tasks (a real warehouse table
      // has millions of splits; config identical for both runs).
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
    localDir.foreach(d => b.config("spark.local.dir", d))
    if (lc) {
      // executor JVMs need the library classes (custom Catalyst expressions)
      // and the JDK17 module opens the driver gets from build.sbt
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
      b.config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens)
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Flagship pipeline: transcripts → CSVW triple mapper → two-stage dedup.
    * The dedup is a group-only hash aggregate over the projected key: the
    * partial (map-side) aggregate dedups before the exchange, so the
    * shuffle carries ~distinct rows, not every duplicate (round 1 forced an
    * explicit repartition first, which shipped every duplicate across the
    * wire and blocked the partial).
    */
  def kgPipelineCount(spark: SparkSession, inputPath: String): Long = {
    val tr = spark.read.parquet(inputPath)
    val triples = graft.streaming.TranscriptStream.triples(tr, SparkEntry.transcriptTable)
    triples
      .select("subj", "pred", "obj")
      .dropDuplicates()
      .count()
  }

  /** Map-only variant (no dedup shuffle) for bottleneck attribution. */
  def mapOnlyCount(spark: SparkSession, inputPath: String): Long = {
    val tr = spark.read.parquet(inputPath)
    graft.streaming.TranscriptStream.triples(tr, SparkEntry.transcriptTable).count()
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpus = args(1)
    val mode = if (args.length > 2) args(2) else "full"
    if (mode == "gen") {
      val turns = args(3).toLong
      val s = session(cores)
      graft.sources.TranscriptGen.transcripts(s, turns)
        .repartition(256)
        .write.mode("overwrite").parquet(corpus)
      println(s"WORKER_RESULT ${s.read.parquet(corpus).count()} 0.0")
      s.stop()
      return
    }
    val noWarm = args.contains("nowarm")
    val run: SparkSession => Long =
      if (mode == "map") mapOnlyCount(_, corpus) else kgPipelineCount(_, corpus)
    val spark = session(cores)
    // warm JIT/codegen on identical work, then report the best of two
    // measurements — the steady state a long job amortizes to; host noise
    // is one-sided, so in-worker best-of-2 plus the parent's interleaved
    // reps + min filter tightens the estimator substantially (single
    // measurements drifted the efficiency estimate by ±0.15 across windows)
    if (!noWarm) run(spark)
    val reps = if (noWarm) 1 else 2
    val (n, dt) = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = run(spark)
      (n, (System.nanoTime() - t0) / 1e9)
    }.minBy(_._2)
    println(f"WORKER_RESULT $n $dt%.3f")
    spark.stop()
  }
}
