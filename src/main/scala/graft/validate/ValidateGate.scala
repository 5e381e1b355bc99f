package graft.validate

import graft.model.CsvwValidate.Report

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Validation failed: the run saw errors (`reader.rb:265-267` — the
  * reference raises `RDF::ReaderError, "Errors found during processing"`
  * when validate mode counted any error-severity problem).
  */
final class GraftValidationException(msg: String) extends RuntimeException(msg)

/** Per-run, per-severity error statistics + validate-mode gate (A5 second
  * half). Cell-level problems are counted into `LongAccumulator`s as the
  * error side-output flows through its action — a single distributed pass,
  * no driver-side collect — and combined with the driver-side metadata
  * [[Report]] (warnings + errors from metadata validation). `gate()` then
  * fails the run exactly like the reference's validate mode, and
  * [[manifestMetrics]] surfaces the counts in the stage manifest
  * (`GraphWriter.writeTriples(..., metrics = gate.manifestMetrics)`).
  */
final class ValidateGate(spark: SparkSession,
                         metadataReport: Report = Report.empty) {

  val cellErrorAcc: LongAccumulator =
    spark.sparkContext.longAccumulator("graft.validate.cellErrors")
  val rowAcc: LongAccumulator =
    spark.sparkContext.longAccumulator("graft.validate.rowsWithErrors")

  /** Count the `TripleMapper.cellErrors` side output: one accumulator add
    * per partition (errors), plus distinct row keys per partition (an upper
    * bound on affected rows — exact when a row's errors land in one
    * partition, which holds because the side output is not re-shuffled).
    */
  def countCellErrors(cellErrors: DataFrame): Unit = {
    val errs = cellErrorAcc
    val rows = rowAcc
    cellErrors.foreachPartition { it: Iterator[Row] =>
      var n = 0L
      val keys = scala.collection.mutable.HashSet.empty[String]
      it.foreach { r => n += 1; keys += r.getString(0) }
      if (n > 0) { errs.add(n); rows.add(keys.size.toLong) }
    }
  }

  def errors: Long = cellErrorAcc.value + metadataReport.errors.size
  def warnings: Long = metadataReport.warnings.size.toLong

  def manifestMetrics: Map[String, Long] = Map(
    "errors" -> errors,
    "warnings" -> warnings,
    "rows_with_errors" -> rowAcc.value)

  /** The validate-mode exit gate: no-op when clean, raise when any
    * error-severity problem was counted.
    */
  def gate(): Unit =
    if (errors > 0)
      throw new GraftValidationException(
        s"Errors found during processing (${errors} errors, ${warnings} warnings)")
}
