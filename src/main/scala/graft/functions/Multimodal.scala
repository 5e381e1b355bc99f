package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libraries in this container); the Spark-side plumbing — schema, batch
  * iteration, partitioning, output shape — is real and tested, and a real
  * decoder drops into [[decodeStub]] without touching the plan.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, media_type: String, width: Int,
                              height: Int, n_frames: Int, feature: Array[Float])

  /** Attach a synthetic binary payload column to a keyed table (test/bench
    * harness for the decode path; deterministic, SQL-replicable function of
    * the key so the DuckDB oracle can reproduce the whole decode output).
    */
  def withSyntheticPayload(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol).cast("long") % 3 + 1).cast("int")).as("media_type"),
      to_binary(md5(col(idCol).cast("string")), lit("hex")).as("payload"))

  /** STUB decode: === replace this body with a real codec ===
    * Deterministic fake "decode" deriving metadata + an 8-dim feature vector
    * from the payload bytes. Runs via mapPartitions so a real decoder gets
    * batch-per-partition amortization (codec init once per partition, the
    * same shape `mapInPandas` gives Python codecs).
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: initialize codec here, once per partition
      it.map { m =>
        val h = java.util.Arrays.hashCode(m.payload)
        val dim = math.abs(h % 512) + 16
        DecodedRow(
          doc_id = m.doc_id,
          media_type = m.media_type,
          width = dim,
          height = dim / 2,
          n_frames = if (m.media_type == "video") math.abs(h % 240) + 1 else 1,
          feature = Array.tabulate(8)(i => ((h >> i) & 0xff).toFloat / 255f))
      }
    }
  }

  /** Full plumbing: synthesize payloads → decode → typed metadata frame. */
  def decodePipeline(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    decodeStub(withSyntheticPayload(df, idCol).as[MediaRow]).toDF()
  }
}
