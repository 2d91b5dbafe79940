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
