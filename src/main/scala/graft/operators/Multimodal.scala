package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column conventions (SURVEY.md §7 M6): media travels as an
  * opaque `binary` payload column plus a typed metadata struct; decode /
  * feature-extraction runs as a per-partition batch transform
  * (`mapPartitions`) so a real codec would amortize init (model load,
  * decoder context) once per partition — the Spark-side plumbing
  * (schema, batching, partition preservation) is real and tested.
  *
  * The actual byte decoding is a STUB: no image/audio codecs exist in
  * this environment, so [[decodeImageStub]] derives deterministic fake
  * dimensions/features from the payload bytes. Swap `decodeOne` for a
  * real codec without touching any of the distributed structure.
  */
object Multimodal {

  /** Canonical media-column schema: payload + metadata struct. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("source", StringType)))

  /** Wrap any string/binary column as a media column (test harness for
    * the plumbing; real pipelines read payloads from object storage).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      format: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(lit(format).as("format"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
        lit("fixture").as("source")).as("meta"))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_intensity", DoubleType)))

  /** STUB decode: deterministic pseudo-dimensions and a mean-intensity
    * feature from the payload bytes. A real implementation would call
    * the codec here — everything outside `decodeOne` stays identical.
    */
  private def decodeOne(id: Long, payload: Array[Byte]): Row = {
    val n = payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xff); i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    Row(id, width, height, 3, mean)
  }

  /** Batch decode over partitions: one `decodeOne` per row, iterator in
    * / iterator out — no per-partition materialization, so partitions
    * stream at constant memory regardless of media size.
    */
  def decodeImageStub(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeOne(r.getLong(idIdx), r.getAs[Array[Byte]](payloadIdx))
      }
    }(Encoders.row(decodedSchema))
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** STUB resize: deterministic byte-level downsample to a `w*h`-byte
    * payload (stride-sampled from the source bytes). Real codecs slot
    * into the row function; the iterator-in/iterator-out partition
    * streaming — constant memory however large each media row is — is
    * the part that matters at scale.
    */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, "resize dimensions must be positive")
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val target = w * h
        val out = new Array[Byte](target)
        if (bytes.nonEmpty) {
          var i = 0
          while (i < target) {
            out(i) = bytes((i.toLong * bytes.length / target).toInt)
            i += 1
          }
        }
        Row(r.getLong(idIdx), out, w, h)
      }
    }(Encoders.row(resizedSchema))
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** STUB feature extraction: a `dim`-wide float vector from chunked
    * byte statistics (an embedding model would run here, batched per
    * partition). Output feeds the similarity operators directly —
    * media → features → cosine top-k / LSH dedup is the end-to-end
    * multimodal pipeline shape.
    */
  def extractFeaturesStub(media: DataFrame, dim: Int): DataFrame = {
    require(dim > 0, "feature dim must be positive")
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val f = new Array[Float](dim)
        if (bytes.nonEmpty) {
          var i = 0
          while (i < bytes.length) {
            f(i % dim) += (bytes(i) & 0xff) / 255.0f
            i += 1
          }
          // L2-normalize so downstream cosine similarity is a dot product
          var norm = 0.0
          var j = 0
          while (j < dim) { norm += f(j) * f(j); j += 1 }
          val inv = if (norm == 0.0) 0.0f else (1.0 / math.sqrt(norm)).toFloat
          j = 0
          while (j < dim) { f(j) *= inv; j += 1 }
        }
        Row(r.getLong(idIdx), f.toIndexedSeq)
      }
    }(Encoders.row(featureSchema))
  }

  val waveformSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("window_rms", ArrayType(DoubleType, containsNull = false)),
    StructField("n_windows", IntegerType)))

  /** Audio-shaped stub: per-window RMS over the payload bytes (a real
    * PCM decoder would produce samples first; the windowed-statistics
    * partition streaming is the reusable structure).
    */
  def waveformStats(media: DataFrame, windowBytes: Int): DataFrame = {
    require(windowBytes > 0, "windowBytes must be positive")
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val n = math.max((bytes.length + windowBytes - 1) / windowBytes, 1)
        val rms = new Array[Double](n)
        var w = 0
        while (w < n) {
          val start = w * windowBytes
          val end = math.min(start + windowBytes, bytes.length)
          var acc = 0.0
          var i = start
          while (i < end) { val v = bytes(i) & 0xff; acc += v.toDouble * v; i += 1 }
          rms(w) = if (end > start) math.sqrt(acc / (end - start)) else 0.0
          w += 1
        }
        Row(r.getLong(idIdx), rms.toIndexedSeq, n)
      }
    }(Encoders.row(waveformSchema))
  }

  /** Frame-sampling stub for video-shaped payloads: split the payload
    * into `frameBytes` chunks and emit every `stride`-th chunk with its
    * index — the partition-parallel explode shape a real frame sampler
    * has, minus the codec.
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"), posexplode(
        expr(s"""transform(
          |  filter(sequence(0, greatest(int(length(payload) / $frameBytes) - 1, 0)),
          |         i -> i % $stride = 0),
          |  i -> substring(payload, i * $frameBytes + 1, $frameBytes))""".stripMargin))
        .as(Seq("frame_no", "frame")))
      .withColumn("frame_bytes", length(col("frame")).cast("long"))
}
