package graft

import org.apache.spark.sql.SparkSession

/** Round-9 optimization harness (guide §1.4/§1.5): per-query noop-sink
  * isolation timings plus `.explain("formatted")` dumps, separate from the
  * FROZEN driver-contract [[Bench]] main. Usage:
  *
  *   sbt "runMain graft.BenchExtra time q1_agg g2_graph_canonicalize"
  *   sbt "runMain graft.BenchExtra explain plans/r09 before g2_graph_canonicalize"
  *
  * `time` runs each named query (all when none named) `GRAFT_EXTRA_REPS`
  * (default 2) times against the noop sink — every column of every row
  * computed, no sink cost — and prints one `name cold_s min_s` line per
  * query. `explain` writes `<dir>/<name>_<tag>.txt` per query. The session
  * mirrors the driver bench's config (local[$SPARK_GRAFT_CPUS], AQE on,
  * shuffle partitions = 2×cores, tmpfs local dir) so timings are comparable.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "time"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val localDir = {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(shm)) {
        val d = shm.resolve("graft_spark_local_extra")
        java.nio.file.Files.createDirectories(d)
        Some(d.toString)
      } else None
    }
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    localDir.foreach(d => b.config("spark.local.dir", d))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "time" =>
        val reps = math.max(1, sys.env.getOrElse("GRAFT_EXTRA_REPS", "2").toInt)
        val names = if (args.length > 1) args.drop(1).toSeq
                    else SparkEntry.queries.keys.toSeq.sorted
        SparkEntry.streamFixture(spark, sfDir)
        names.foreach { n =>
          val fn = SparkEntry.queries(n)
          val times = (1 to reps).map { i =>
            spark.sparkContext.setJobDescription(s"extra:$n rep$i")
            val s0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - s0) / 1e9
          }
          println(f"EXTRA $n%-28s cold=${times.head}%8.3f min=${times.min}%8.3f")
        }
      case "explain" =>
        val dir = args(1)
        val tag = args(2)
        val names = args.drop(3).toSeq
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        names.foreach { n =>
          val df = SparkEntry.queries(n)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"${n}_$tag.txt"), plan)
          println(s"EXPLAIN wrote $dir/${n}_$tag.txt")
        }
      case other => sys.error(s"unknown mode $other (time|explain)")
    }
    spark.stop()
  }
}
