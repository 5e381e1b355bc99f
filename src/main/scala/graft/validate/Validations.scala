package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global validations, re-expressed as distributed aggregations/joins instead
  * of the reference's driver-resident hashes
  * (`/root/reference/lib/rdf/tabular/reader.rb:665-721`).
  */
object Validations {

  /** Duplicate-primary-key detection (`reader.rb:665-673`, A1):
    * returns offending key tuples with their counts. Map-side partial
    * aggregation makes this a single shuffle of distinct keys.
    */
  def pkDuplicates(df: DataFrame, pkCols: Seq[String]): DataFrame =
    df.groupBy(pkCols.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** FK target-uniqueness violations (`reader.rb:702-703`, A2). */
  def fkDuplicateTargets(referenced: DataFrame, keyCols: Seq[String]): DataFrame =
    pkDuplicates(referenced, keyCols)

  /** FK integrity (`reader.rb:708-721`, J1): source tuples with no match in
    * the referenced table. Anti-join: Catalyst broadcasts the referenced side
    * when small; AQE handles skew otherwise. Null FK values are not
    * violations (no reference collected for empty cells).
    */
  def fkViolations(
      source: DataFrame, sourceCols: Seq[String],
      referenced: DataFrame, referencedCols: Seq[String]): DataFrame = {
    val src = source.select(sourceCols.map(col): _*)
      .na.drop("any", sourceCols)
    val dst = referenced
      .select(referencedCols.zip(sourceCols).map { case (rc, sc) => col(rc).as(sc) }: _*)
      .dropDuplicates(sourceCols)
    src.join(dst, sourceCols, "left_anti")
  }

  /** Per-turn invariant from BASELINE.json `input_hint`: text equality under
    * stable (conv_id, turn_idx) ordering — i.e. (conv_id, turn_idx) is a key
    * and every re-read yields identical text. Checked as: no key has >1
    * distinct text.
    */
  def turnTextConsistency(df: DataFrame, convCol: String = "conv_id",
                          turnCol: String = "turn_idx", textCol: String = "text"): DataFrame =
    df.groupBy(col(convCol), col(turnCol))
      .agg(countDistinct(col(textCol)).as("n_texts"))
      .filter(col("n_texts") > 1)
}
