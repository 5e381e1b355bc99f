package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded in partition-sized batches.
  *
  * The decode is REAL binary parsing of three public container formats —
  * PNG (IHDR, big-endian), WAV (RIFF/fmt/data, little-endian) and AVI
  * (RIFF/avih main header, little-endian) — sniffed by magic bytes, not by
  * trusting any metadata column. PNG additionally gets a REAL pixel path
  * through the JDK's own codec ([[resamplePng]]: `javax.imageio` decode →
  * bilinear resample → re-encode), and WAV gets a REAL sample path through
  * `javax.sound.sampled.AudioSystem` ([[decodeWavSamples]]: PCM16 decode →
  * per-doc sample stats), so the image and audio legs both round-trip
  * actual payload data with zero non-JDK dependencies. AVI frame decoding
  * stays header-level — no AVI video codec ships in the JDK — and a full
  * codec drops into the same per-partition loops without touching any plan.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** For images/video: pixel dimensions + frame count; for audio: width =
    * sample rate, height = channels, n_frames = sample count.
    */
  final case class DecodedRow(doc_id: Long, media_type: String, width: Int,
                              height: Int, n_frames: Int, feature: Array[Float])

  // ------------------------------------------------------------- byte utils

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  // --------------------------------------------------------------- encoders

  /** Minimal valid PNG prefix: signature + IHDR chunk. */
  def pngBytes(width: Int, height: Int): Array[Byte] =
    PngSig ++ be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(width) ++ be32(height) ++ Array[Byte](8, 2, 0, 0, 0)

  /** COMPLETE decodable PNG with deterministic pixels (RGB gradient keyed by
    * `seed`), via the JDK's own codec (`javax.imageio`) — the real-pixel
    * counterpart of the header-only [[pngBytes]] for byte-level round-trip
    * tests. Pixel (x, y) = (x-gradient, y-gradient, seed-hash) so resampling
    * results are visually and statistically checkable.
    */
  def pngBytesReal(width: Int, height: Int, seed: Int): Array[Byte] = {
    imageIoInMemory
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](width)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = x * 255 / math.max(width - 1, 1)
        val g = y * 255 / math.max(height - 1, 1)
        val b = (seed * 31 + x + y) & 0xff
        row(x) = (r << 16) | (g << 8) | b
        x += 1
      }
      img.setRGB(0, y, width, 1, row, 0, width)
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** ImageIO wraps every read/write in a DISK-backed stream cache by
    * default (a temp file created and deleted per image). The pixel legs
    * here run entirely on in-memory byte arrays, so flip the JVM-global
    * cache to memory once (guide §1.2 per-task work): two temp-file
    * round-trips per image disappear and the encoded bytes are identical —
    * only the staging location changes. Lazy so the static setter runs
    * once per executor JVM, on first use inside the task.
    */
  private lazy val imageIoInMemory: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Real pixel resampling: decode a complete PNG (or any ImageIO-readable
    * payload), bilinear-resample to (ow, oh) on a `Graphics2D`, re-encode as
    * PNG — all public JDK (`javax.imageio` + `java.awt.image`), no external
    * codec. `None` when the payload isn't a decodable raster (e.g. the
    * header-only container prefixes [[pngBytes]] emits), so callers can fall
    * back to container-level re-encode for metadata-only corpora.
    */
  private[graft] def resamplePng(b: Array[Byte], ow: Int, oh: Int): Option[Array[Byte]] =
    try {
      imageIoInMemory
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (src == null) None
      else {
        val dst = new java.awt.image.BufferedImage(ow, oh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, ow, oh, null)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        Some(out.toByteArray)
      }
    } catch { case _: Exception => None }

  /** Minimal valid WAV: RIFF/WAVE with a PCM fmt chunk and an empty-bodied
    * data chunk declaring `samples` frames.
    */
  def wavBytes(sampleRate: Int, channels: Int, samples: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = samples * blockAlign
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataSize) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(dataSize)
  }

  /** COMPLETE decodable WAV with deterministic PCM16 samples — the
    * real-sample counterpart of the header-only [[wavBytes]]. Sample
    * (frame i, channel c) = ((seed·31 + i·7 + c·13) mod 2003) − 1001, a
    * pure integer formula an external oracle replicates exactly (range
    * ±1001 fits 16-bit). Interleaved little-endian, the layout
    * `javax.sound.sampled` expects for PCM_SIGNED.
    */
  def wavBytesReal(sampleRate: Int, channels: Int, frames: Int, seed: Long): Array[Byte] = {
    val header = wavBytes(sampleRate, channels, frames)
    val out = new Array[Byte](header.length + frames * channels * 2)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    var off = header.length
    while (i < frames) {
      var c = 0
      while (c < channels) {
        val s = ((seed * 31 + i * 7 + c * 13) % 2003 - 1001).toInt
        out(off) = (s & 0xff).toByte
        out(off + 1) = ((s >> 8) & 0xff).toByte
        off += 2
        c += 1
      }
      i += 1
    }
    out
  }

  /** Decoded per-payload audio stats: (sample_rate, channels, n_frames,
    * peak, sum) — peak = max |sample|, sum = Σ sample over every channel
    * sample, both EXACT integer statistics an oracle replicates from the
    * planted formula with no floating-point hazard.
    */
  final case class AudioStats(sampleRate: Int, channels: Int, nFrames: Int,
                              peak: Int, sum: Long)

  /** REAL sample decode through the JDK's own audio codec
    * (`javax.sound.sampled.AudioSystem`, public JDK — the audio counterpart
    * of [[resamplePng]]'s `javax.imageio` leg): parse the WAV container,
    * verify 16-bit signed PCM, stream the sample bytes, and fold exact
    * integer stats. `None` when the payload isn't a decodable 16-bit PCM
    * WAV (wrong container, compressed encoding, truncated header), so
    * callers can count fallbacks instead of crashing the stage.
    */
  private[graft] def decodeWavSamples(b: Array[Byte]): Option[AudioStats] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          val data = in.readAllBytes()
          val channels = fmt.getChannels
          val nSamples = data.length / 2
          var peak = 0
          var sum = 0L
          var i = 0
          while (i < nSamples) {
            val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
            if (math.abs(s) > peak) peak = math.abs(s)
            sum += s
            i += 1
          }
          Some(AudioStats(fmt.getSampleRate.toInt, channels,
            nSamples / math.max(channels, 1), peak, sum))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Minimal valid AVI prefix: RIFF/AVI with the `avih` main header
    * (dwTotalFrames, dwWidth, dwHeight populated).
    */
  def aviBytes(width: Int, height: Int, totalFrames: Int): Array[Byte] = {
    val avih = le32(33366) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(totalFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = "hdrl".getBytes("US-ASCII") ++
      "avih".getBytes("US-ASCII") ++ le32(avih.length) ++ avih
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + hdrl.length) ++ "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(hdrl.length) ++ hdrl
  }

  // ---------------------------------------------------------------- decoder

  /** Sniff the container by magic bytes and parse its metadata header.
    * Unknown payloads decode to ("unknown", 0, 0, 0).
    */
  def decodeHeader(b: Array[Byte]): (String, Int, Int, Int) = {
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        new String(b.slice(12, 16), "US-ASCII") == "IHDR")
      ("image", readBe32(b, 16), readBe32(b, 20), 1)
    else if (b.length >= 44 && new String(b.take(4), "US-ASCII") == "RIFF" &&
             new String(b.slice(8, 12), "US-ASCII") == "WAVE") {
      val channels = readLe16(b, 22)
      val sampleRate = readLe32(b, 24)
      val blockAlign = readLe16(b, 32)
      val dataSize = readLe32(b, 40)
      ("audio", sampleRate, channels, if (blockAlign > 0) dataSize / blockAlign else 0)
    } else if (b.length >= 12 && new String(b.take(4), "US-ASCII") == "RIFF" &&
               new String(b.slice(8, 12), "US-ASCII") == "AVI ") {
      // locate the avih chunk inside the hdrl LIST
      var i = 12
      var out = ("video", 0, 0, 0)
      var found = false
      while (!found && i + 8 <= b.length) {
        val tag = new String(b.slice(i, i + 4), "US-ASCII")
        if (tag == "LIST") i += 12 // descend into the list body (skip type)
        else {
          // chunk sizes are untrusted input: mask to unsigned and treat a
          // non-advancing offset as malformed (a negative/zero size would
          // otherwise loop the executor forever)
          val size = readLe32(b, i + 4).toLong & 0xffffffffL
          if (tag == "avih" && i + 8 + 40 <= b.length) {
            out = ("video", readLe32(b, i + 8 + 32), readLe32(b, i + 8 + 36), readLe32(b, i + 8 + 16))
            found = true
          } else {
            val next = i.toLong + 8L + size
            if (next <= i || next > Int.MaxValue) found = true // malformed: bail with fallback
            else i = next.toInt
          }
        }
      }
      out
    } else ("unknown", 0, 0, 0)
  }

  /** Deterministic 8-dim feature from the payload bytes (stride sums) —
    * stands in for an embedding; real computation over the real bytes.
    */
  private def feature(b: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < b.length) { f(i % 8) += (b(i) & 0xff) / 255f; i += 1 }
    f
  }

  /** Synthesize a corpus of real container payloads keyed by `idCol`: PNG /
    * WAV / AVI round-robin, with header fields that are pure integer
    * functions of the key — so an oracle can predict the decoded metadata
    * and thereby verify the byte-level encode→parse round trip.
    * `realPixels = true` emits COMPLETE decodable PNGs ([[pngBytesReal]],
    * same dims formula) so downstream legs exercise actual rasters — more
    * expensive per row, so driver queries bound the slice they apply it to.
    * `realSamples = true` likewise emits COMPLETE PCM16 WAVs
    * ([[wavBytesReal]], same rate/channels/frames formulas, seed = doc_id).
    *
    * Parallelism (round 9, guide §2.5/§6): the id source here is one
    * small parquet file — ONE input split, below a row group parquet
    * cannot split — so payload synthesis AND every downstream codec pass
    * ran on a single task while 31 cores idled. For the REAL-PIXEL leg
    * (the expensive ImageIO raster path) the 8-byte id rows are
    * round-robin repartitioned to the cluster's parallelism BEFORE
    * payloads exist — the cheapest possible placement of the exchange
    * (move small rows, then generate the heavy bytes; guide §8): m4
    * measured 1.39 s → 0.39 s at sf0.1. A data-scale input already
    * arrives with ≥ cores partitions and skips the exchange. The audio
    * and header-only legs deliberately stay un-spread — measured SLOWER
    * parallelized at fixture scale (m5/m6/m7 0.24/0.31/0.29 s → 0.53/
    * 0.64/0.63 s: `javax.sound` provider lookup serializes across tasks
    * and the per-task overhead exceeds their cheap codec work). Row-set
    * output is identical under any partitioning (the map is per-row
    * pure).
    */
  def withSyntheticPayload(df: DataFrame, idCol: String,
                           realPixels: Boolean = false,
                           realSamples: Boolean = false): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    val ids = df.select(col(idCol).cast("long").as("doc_id"))
    val par = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (realPixels && ids.rdd.getNumPartitions < par) ids.repartition(par)
      else ids
    spread.as[Long].map { id =>
      val payload = (id % 3) match {
        case 0 =>
          val (w, h) = ((id * 7 % 512 + 16).toInt, (id * 13 % 512 + 16).toInt)
          if (realPixels) pngBytesReal(w, h, seed = id.toInt) else pngBytes(w, h)
        case 1 =>
          val (rate, ch, n) =
            ((8000 + id % 5 * 8000).toInt, (id % 2 + 1).toInt, (id % 1000 + 1).toInt)
          if (realSamples) wavBytesReal(rate, ch, n, seed = id) else wavBytes(rate, ch, n)
        case _ => aviBytes((id * 7 % 512 + 16).toInt, (id * 13 % 512 + 16).toInt, (id % 240 + 1).toInt)
      }
      MediaRow(id, Seq("image", "audio", "video")((id % 3).toInt), payload)
    }
  }

  final case class AudioStatsRow(doc_id: Long, sample_rate: Int, channels: Int,
    n_samples: Int, peak: Int, sum_samples: Long)

  /** Per-document audio statistics over REAL decoded samples: filter to
    * audio payloads, decode PCM16 through the JDK codec
    * ([[decodeWavSamples]]), emit exact integer stats — ONE map stage, no
    * shuffle, payloads read once; at 100 TB this is embarrassingly parallel
    * codec CPU exactly like the image leg. Undecodable payloads drop out
    * (and count on `fallbacks` when provided — same metric pattern as the
    * pixel leg).
    */
  def audioStats(media: Dataset[MediaRow],
                 fallbacks: Option[org.apache.spark.util.LongAccumulator] = None
                ): Dataset[AudioStatsRow] = {
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "audio").as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { m =>
          decodeWavSamples(m.payload) match {
            case Some(s) =>
              Some(AudioStatsRow(m.doc_id, s.sampleRate, s.channels,
                s.nFrames, s.peak, s.sum))
            case None =>
              fallbacks.foreach(_.add(1)); None
          }
        }
      }
  }

  final case class AudioResampleRow(doc_id: Long, in_frames: Int,
                                    out_rate: Int, out_frames: Int,
                                    out_peak: Int, out_sum: Long,
                                    out_bytes: Int)

  /** Stride-decimation resample over REAL decoded samples with WAV
    * re-encode — the audio counterpart of [[resizeImagesWithCorner]]: PCM16
    * decode through the JDK codec, keep every `stride`-th frame (all its
    * channels), re-encode a complete RIFF/WAVE payload at the decimated
    * rate, then decode the EMITTED payload again in the same partition pass
    * and report ITS stats — values that exist only if real samples survived
    * the encode→decode round trip. ONE map stage, zero exchanges; payloads
    * never ship twice. Undecodable payloads drop out and count on
    * `fallbacks`.
    *
    * `lowpass = false` is bare decimation (aliases — fine for feature
    * pipelines). `lowpass = true` applies an integer moving-average
    * (boxcar) kernel over each stride window before decimation — emitted
    * frame j, channel c = the truncated-toward-zero integer mean of input
    * frames [j·stride, min((j+1)·stride, n)) on that channel, the classic
    * anti-aliasing box filter kept integer-exact so an external oracle
    * replays it from the planted formula. Same single map stage: the
    * kernel is a per-frame loop over at most `stride` samples.
    */
  def resampleAudio(media: Dataset[MediaRow], stride: Int,
                    fallbacks: Option[org.apache.spark.util.LongAccumulator] = None,
                    lowpass: Boolean = false
                   ): Dataset[AudioResampleRow] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "audio").as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { m =>
          (for {
            in <- decodeWavRaw(m.payload)
            (fmt, data) = in
            ch = fmt.channels
            inFrames = data.length / (2 * ch)
            outFrames = (inFrames + stride - 1) / stride
            outRate = math.max(fmt.sampleRate / stride, 1)
            encoded = {
              val header = wavBytes(outRate, ch, outFrames)
              val out = new Array[Byte](header.length + outFrames * ch * 2)
              System.arraycopy(header, 0, out, 0, header.length)
              def sampleAt(k: Int): Int =
                ((data(2 * k) & 0xff) | (data(2 * k + 1) << 8)).toShort.toInt
              var j = 0
              while (j < outFrames) {
                val w0 = j * stride
                val wn = math.min(w0 + stride, inFrames) - w0
                var c = 0
                while (c < ch) {
                  val s =
                    if (!lowpass) sampleAt(w0 * ch + c)
                    else {
                      // integer boxcar: Long sum / window size truncates
                      // toward zero (Java semantics; oracle replays trunc)
                      var sum = 0L
                      var i = 0
                      while (i < wn) { sum += sampleAt((w0 + i) * ch + c); i += 1 }
                      (sum / wn).toInt
                    }
                  val off = header.length + (j * ch + c) * 2
                  out(off) = (s & 0xff).toByte
                  out(off + 1) = ((s >> 8) & 0xff).toByte
                  c += 1
                }
                j += 1
              }
              out
            }
            back <- decodeWavSamples(encoded)
          } yield AudioResampleRow(m.doc_id, inFrames, back.sampleRate,
            back.nFrames, back.peak, back.sum, encoded.length)) match {
            case Some(r) => Some(r)
            case None => fallbacks.foreach(_.add(1)); None
          }
        }
      }
  }

  private final case class WavFormat(sampleRate: Int, channels: Int)

  /** PCM16 decode returning the raw interleaved little-endian sample bytes
    * (the shared leg of [[decodeWavSamples]] and [[resampleAudio]]).
    */
  private def decodeWavRaw(b: Array[Byte]): Option[(WavFormat, Array[Byte])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else Some((WavFormat(fmt.getSampleRate.toInt, fmt.getChannels),
          in.readAllBytes()))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Partition-batched decode: codec state initializes once per partition
    * (the same amortization shape `mapInPandas` gives Python codecs); the
    * media_type column is ignored — format comes from the bytes.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl note: heavyweight codec contexts would initialize here
      it.map { m =>
        val (kind, w, h, frames) = decodeHeader(m.payload)
        DecodedRow(m.doc_id, kind, w, h, frames, feature(m.payload))
      }
    }
  }

  /** Full plumbing: synthesize payloads → sniff + parse → typed metadata. */
  def decodePipeline(spark: SparkSession, df: DataFrame, idCol: String): DataFrame =
    decode(withSyntheticPayload(df, idCol)).toDF()

  /** Deterministic even frame sampling over DECODED video metadata: up to
    * `k` frame indices per clip, index j ↦ ⌊j·n_frames/k⌋ (the standard
    * uniform-stride sampler). The frame count comes from the real byte-level
    * header parse; extracting pixel data for the sampled indices is where a
    * codec would drop in ([[decode]]'s partition loop) — index selection is
    * the honestly-implementable portion and carries all the plan shape
    * (filter → bounded explode, fan-out ≤ k, no shuffle).
    */
  def sampleFrames(decoded: Dataset[DecodedRow], k: Int): DataFrame = {
    require(k >= 1, s"sample size must be >= 1: $k")
    decoded.toDF().filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), least(lit(k), col("n_frames")) - 1)).as("j"))
      .select(col("doc_id"), col("n_frames"),
        floor(col("j") * col("n_frames") / k).cast("int").as("frame_idx"))
  }

  /** Aspect-preserving resize plan over DECODED image metadata: an image
    * whose longest side exceeds `maxSide` scales down to fit it (floor of
    * the exact rational, clamped ≥ 1 — the standard thumbnailing rule);
    * smaller images pass through. The target-dimension math is pure
    * codegen'd Columns (one map stage — no shuffle, no UDF); dims stay well
    * inside double precision, so `floor(a*m/l)` is exact and an external
    * oracle replicates it bit-for-bit. [[reencode]] carries the byte-level
    * leg where a real pixel codec would drop into the partition loop.
    */
  def resizePlan(decoded: Dataset[DecodedRow], maxSide: Int): DataFrame = {
    require(maxSide >= 1, s"maxSide must be >= 1: $maxSide")
    val w = col("width"); val h = col("height")
    val longSide = greatest(w, h)
    def fit(side: Column): Column =
      when(longSide <= maxSide, side)
        .otherwise(greatest(floor(side * maxSide / longSide), lit(1L)))
        .cast("int")
    decoded.toDF().filter(col("media_type") === "image")
      .select(col("doc_id"), w, h,
        fit(w).as("out_width"), fit(h).as("out_height"))
  }

  final case class ResizedRow(doc_id: Long, out_width: Int, out_height: Int,
    payload: Array[Byte])

  /** Byte-level re-encode of a [[resizePlan]] output. When the input
    * carries a `payload` column with decodable rasters, pixels are REALLY
    * resampled ([[resamplePng]]: ImageIO decode → bilinear `Graphics2D` →
    * PNG encode); header-only container prefixes (metadata corpora) fall
    * back to a container-level PNG at the target dims — and each fallback
    * counts on `fallbacks` when provided, so a 100 TB run's stage metrics
    * distinguish "all real pixels" from "all fell back" (the cell-error
    * accumulator pattern). Partition-batched: one map stage, no shuffle —
    * codec state amortizes per partition.
    */
  def reencode(plan: DataFrame,
               fallbacks: Option[org.apache.spark.util.LongAccumulator] = None
              ): Dataset[ResizedRow] = {
    import plan.sparkSession.implicits._
    if (plan.columns.contains("payload"))
      plan.select(col("doc_id").cast("long"), col("out_width").cast("int"),
          col("out_height").cast("int"), col("payload")).as[(Long, Int, Int, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, ow, oh, payload) =>
            ResizedRow(id, ow, oh,
              resamplePng(payload, ow, oh).getOrElse {
                fallbacks.foreach(_.add(1)); pngBytes(ow, oh)
              })
          }
        }
    else
      plan.select(col("doc_id").cast("long"), col("out_width").cast("int"),
          col("out_height").cast("int")).as[(Long, Int, Int)]
        .mapPartitions { it =>
          it.map { case (id, ow, oh) => ResizedRow(id, ow, oh, pngBytes(ow, oh)) }
        }
  }

  /** End-to-end byte leg: image payloads → header dims → aspect-preserving
    * fit (the same floor-scaled rational [[resizePlan]] plans, in exact
    * integer math) → real pixel resample + PNG re-encode. ONE map stage —
    * dims, resample, and encode all happen in the same partition pass, no
    * shuffle, payloads never ship twice.
    */
  def resizeImages(media: Dataset[MediaRow], maxSide: Int,
                   fallbacks: Option[org.apache.spark.util.LongAccumulator] = None
                  ): Dataset[ResizedRow] = {
    require(maxSide >= 1, s"maxSide must be >= 1: $maxSide")
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "image").as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { m =>
          val (kind, w, h, _) = decodeHeader(m.payload)
          if (kind != "image" || w <= 0 || h <= 0) None
          else {
            val long = math.max(w, h)
            def fit(s: Int): Int =
              if (long <= maxSide) s
              else math.max((s.toLong * maxSide / long).toInt, 1)
            val (ow, oh) = (fit(w), fit(h))
            Some(ResizedRow(m.doc_id, ow, oh,
              resamplePng(m.payload, ow, oh).getOrElse {
                fallbacks.foreach(_.add(1)); pngBytes(ow, oh)
              }))
          }
        }
      }
  }

  final case class ResizedCornerRow(doc_id: Long, out_width: Int,
    out_height: Int, corner_b: Option[Int])

  /** [[resizeImages]] plus a pixel-derived verification column: for
    * IDENTITY resamples (out dims == in dims, where the bilinear pass is
    * pixel-exact — spec-pinned), `corner_b` carries the blue channel of the
    * EMITTED payload's (0,0) pixel, which the gradient formula predicts as
    * `(seed·31) & 0xff`; scaled rows emit null (interpolated corners aren't
    * oracle-replicable in integer math). Lets the external oracle's hash
    * cover a value that only exists if real pixels round-tripped the codec.
    * Still ONE map stage — the corner decode reads the just-encoded bytes
    * in the same partition pass.
    */
  def resizeImagesWithCorner(media: Dataset[MediaRow], maxSide: Int
                            ): Dataset[ResizedCornerRow] = {
    require(maxSide >= 1, s"maxSide must be >= 1: $maxSide")
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "image").as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { m =>
          val (kind, w, h, _) = decodeHeader(m.payload)
          if (kind != "image" || w <= 0 || h <= 0) None
          else {
            val long = math.max(w, h)
            def fit(s: Int): Int =
              if (long <= maxSide) s
              else math.max((s.toLong * maxSide / long).toInt, 1)
            val (ow, oh) = (fit(w), fit(h))
            val emitted = resamplePng(m.payload, ow, oh).getOrElse(pngBytes(ow, oh))
            // identity ⇔ the INPUT already fit maxSide (ow==w, oh==h);
            // the emitted header always matches (ow, oh) by construction,
            // so the input dims are the only valid identity witness
            val corner =
              if (ow == w && oh == h)
                try {
                  imageIoInMemory
                  val img = javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(emitted))
                  if (img == null) None else Some(img.getRGB(0, 0) & 0xff)
                } catch { case _: Exception => None }
              else None
            Some(ResizedCornerRow(m.doc_id, ow, oh, corner))
          }
        }
      }
  }
}
