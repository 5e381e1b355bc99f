package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of selected queries so the
  * codegen/pushdown story is inspectable (`.explain("formatted")` per the
  * build guidance). Not part of the driver contract.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("t1_triples_minimal", "q1_agg", "q2_join_broadcast", "d2_minhash_lsh")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
