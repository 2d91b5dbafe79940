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
  * Container-free formats decode for REAL — binary PPM images
  * ([[decodePpm]]) and 16-bit PCM WAV audio ([[decodeWav]]) are pure
  * byte layouts needing no codec library. Formats that do need codecs
  * (JPEG/PNG/MP3/H.264 — absent from this environment) fall back to
  * the deterministic STUB `decodeOne`; swap it for a real codec
  * without touching any of the distributed structure.
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

  /** Parsed P6 header: (width, height, maxval, pixel-data offset,
    * bytes per sample). None when the payload is not well-formed P6
    * with a complete pixel block.
    */
  private[operators] def ppmHeader(
      payload: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
      return None
    var i = 2
    def skipWs(): Unit = {
      var in = true
      while (in && i < payload.length) {
        val c = payload(i).toChar
        if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else in = false
      }
    }
    def int(): Option[Int] = {
      skipWs()
      val start = i
      while (i < payload.length && payload(i).toChar.isDigit) i += 1
      // >9 digits cannot be a sane PPM dimension/maxval — treat as
      // malformed (None), not NumberFormatException: the drop-dirty
      // posture must hold for arbitrarily broken payloads
      if (i == start || i - start > 9) None
      else Some(new String(payload, start, i - start).toInt)
    }
    for {
      w <- int(); h <- int(); maxv <- int()
      bytesPerSample = if (maxv > 255) 2 else 1
      if w > 0 && h > 0 && maxv > 0 && maxv < 65536 && i < payload.length &&
        { i += 1 /* single whitespace after maxval */
          payload.length - i >= w.toLong * h * 3 * bytesPerSample }
    } yield (w, h, maxv, i, bytesPerSample)
  }

  /** REAL decode for binary PPM (P6) — the container-free image format
    * needs no codec library: ASCII header `P6 <w> <h> <maxval>` with
    * `#` comments, then `w*h` RGB byte triples. Returns None when the
    * payload is not a well-formed P6 image.
    */
  private[operators] def decodePpm(id: Long,
      payload: Array[Byte]): Option[Row] = {
    ppmHeader(payload).map { case (w, h, _, off, bytesPerSample) =>
      val i = off
      // maxval > 255 means 2-byte big-endian samples (PPM spec)
      var sum = 0L
      val n = w * h * 3
      var j = 0
      if (bytesPerSample == 1)
        while (j < n) { sum += (payload(i + j) & 0xff); j += 1 }
      else
        while (j < n) {
          sum += ((payload(i + 2 * j) & 0xff) << 8) |
            (payload(i + 2 * j + 1) & 0xff)
          j += 1
        }
      Row(id, w, h, 3, sum.toDouble / n)
    }
  }

  val resizedPpmSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("src_w", IntegerType),
    StructField("src_h", IntegerType),
    StructField("payload", BinaryType)))

  /** REAL image resize for P6 payloads: nearest-neighbor sampling on
    * the ACTUAL pixel grid — source pixel (x·w ÷ outW, y·h ÷ outH)
    * (integer division; the standard NN rule) per output pixel and
    * channel — re-emitted as a well-formed P6 payload, so the result
    * COMPOSES with [[decodeImageStub]] / further resizes (the
    * thumbnail-pipeline shape). Iterator-in/iterator-out partition
    * streaming like the other media ops: constant memory in the number
    * of rows, one output row per well-formed input (flatMap — non-PPM
    * payloads drop, the dirty-collection posture of [[decodeWav]]).
    * 2-byte-per-sample images (maxval > 255) resize sample-wise.
    */
  def resizePpm(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "resize dimensions must be positive")
    // the product bound, not just the factors: 40000×40000×3 wraps a
    // 32-bit Int and would allocate a too-small buffer. The header
    // budget must cover the worst emitted "P6\n$outW $outH\n$maxv\n"
    // (≤ 32 bytes: 3 + 10+1+10 + 1 + 5 + 1), not a bare 16 — an
    // undersized budget lets the Int sum wrap negative at the edge and
    // throw NegativeArraySizeException instead of this loud require
    require(32L + outW.toLong * outH * 3 * 2 <= Int.MaxValue,
      s"resize target $outW x $outH exceeds a single-array payload")
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        // NULL payloads drop like any other non-PPM row (dirty media
        // tables carry them routinely)
        val payload =
          if (r.isNullAt(payloadIdx)) null
          else r.getAs[Array[Byte]](payloadIdx)
        (if (payload == null) None else ppmHeader(payload)).map {
          case (w, h, maxv, off, bps) =>
          val header = s"P6\n$outW $outH\n$maxv\n".getBytes("US-ASCII")
          val out = new Array[Byte](header.length + outW * outH * 3 * bps)
          System.arraycopy(header, 0, out, 0, header.length)
          var y = 0
          var o = header.length
          while (y < outH) {
            // Long arithmetic: y·h / x·w overflow Int for megapixel
            // sources (h = 3e6 wraps at y ≈ 716)
            val sy = (y.toLong * h / outH).toInt
            var x = 0
            while (x < outW) {
              val sx = (x.toLong * w / outW).toInt
              val src = off + ((sy.toLong * w + sx) * 3 * bps).toInt
              var c = 0
              while (c < 3 * bps) {
                out(o) = payload(src + c)
                o += 1; c += 1
              }
              x += 1
            }
            y += 1
          }
          Row(r.getLong(idIdx), w, h, out)
        }
      }
    }(Encoders.row(resizedPpmSchema))
      .select(col("media_id"), col("src_w"), col("src_h"),
        col("payload"),
        struct(lit("image/ppm").as("format"),
          length(col("payload")).cast("long").as("n_bytes"),
          lit("resize").as("source")).as("meta"))
  }

  /** Batch decode over partitions: one decode per row, iterator in /
    * iterator out — no per-partition materialization, so partitions
    * stream at constant memory regardless of media size. Payloads that
    * ARE container-free images (PPM/P6) decode for real; anything else
    * (JPEG/PNG need codec libraries absent from this environment)
    * falls back to the deterministic stub.
    */
  def decodeImageStub(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val payload =
          if (r.isNullAt(payloadIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](payloadIdx)
        decodePpm(id, payload).getOrElse(decodeOne(id, payload))
      }
    }(Encoders.row(decodedSchema))
  }

  val wavSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_s", DoubleType),
    StructField("rms", DoubleType),
    StructField("peak", DoubleType)))

  /** REAL decode for PCM WAV — RIFF is pure byte layout, no codec
    * needed: parse the `fmt ` chunk (PCM, 16-bit) and the `data` chunk,
    * then fold the little-endian samples into duration/RMS/peak
    * normalized to [-1, 1]. Non-PCM or malformed payloads yield no row
    * (flatMap), so a mixed bucket decodes what it can — the usual lake
    * posture for dirty media collections.
    */
  def decodeWav(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(payloadIdx)) None
        else decodeWavOne(r.getLong(idIdx), r.getAs[Array[Byte]](payloadIdx))
      }
    }(Encoders.row(wavSchema))
  }

  /** Parsed PCM16 RIFF layout: (channels, sampleRate, dataOff,
    * dataLen). The chunk walk advances a LONG offset — a crafted
    * 32-bit chunk length near Int.MaxValue must overflow the walk off
    * the end of the buffer, never wrap negative into a crash (dirty
    * media buckets are the expected input). None for anything that is
    * not well-formed 16-bit PCM.
    */
  private[operators] def pcm16Layout(
      b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int) = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L
    var channels = 0; var rate = 0; var bits = 0; var fmtOk = false
    var dataOff = -1; var dataLen = 0L
    while (off + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val o = off.toInt
      val id4 = tag(o); val len = u32(o + 4)
      if (id4 == "fmt " && off + 24 <= b.length) {
        fmtOk = u16(o + 8) == 1 // PCM only
        channels = u16(o + 10); rate = u32(o + 12).toInt
        bits = u16(o + 22)
      } else if (id4 == "data") { dataOff = o + 8; dataLen = len }
      off += 8L + len + (len & 1) // word-aligned; Long: cannot wrap
    }
    if (!fmtOk || bits != 16 || channels <= 0 || rate <= 0 || dataOff < 0)
      None
    else Some((channels, rate, dataOff, dataLen))
  }

  private[operators] def decodeWavOne(id: Long,
      b: Array[Byte]): Option[Row] = {
    val (channels, rate, dataOff, dataLen) = pcm16Layout(b) match {
      case Some(t) => t
      case None => return None
    }
    val avail = math.min(dataLen, (b.length - dataOff).toLong)
    val nSamples = avail / 2 / channels
    var acc = 0.0; var peak = 0.0
    var i = dataOff
    val end = dataOff + (nSamples * channels * 2).toInt
    while (i + 1 < end) {
      val s = ((b(i) & 0xff) | (b(i + 1) << 8)).toShort / 32768.0
      acc += s * s
      val a = math.abs(s); if (a > peak) peak = a
      i += 2
    }
    val total = nSamples * channels
    val rms = if (total > 0) math.sqrt(acc / total) else 0.0
    Some(Row(id, channels, rate, nSamples, nSamples.toDouble / rate,
      rms, peak))
  }

  val audioFpSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("afp", LongType)))

  /** REAL acoustic fingerprint over PCM16 WAV payloads (the audio twin
    * of [[dHash]]): the data chunk's signed samples split into 64
    * equal windows, per-window energy Σ s² accumulated as EXACT Long
    * integers, and bit w (0..62) set iff energy(w) > energy(w+1) — a
    * 63-bit signature robust to gain-preserving re-encodes, engine-
    * exact by construction (pure integer arithmetic, no floats).
    * Pairs within a small hamming distance come from [[dhashPairs]]
    * (the banded join is signature-agnostic). Mono or interleaved
    * multi-channel both fold every sample; non-PCM16 payloads drop.
    */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val b =
          if (r.isNullAt(payloadIdx)) null
          else r.getAs[Array[Byte]](payloadIdx)
        if (b == null) None
        else pcm16Layout(b) match {
          case None => None
          case Some((_, _, dataOff, dataLen)) =>
            {
              val avail = math.min(dataLen, (b.length - dataOff).toLong)
              val ns = (avail / 2).toInt
              val e = new Array[Long](64)
              var w = 0
              while (w < 64) {
                val from = (w.toLong * ns / 64).toInt
                val to = ((w + 1).toLong * ns / 64).toInt
                var acc = 0L
                var i = from
                while (i < to) {
                  val s = ((b(dataOff + 2 * i) & 0xff) |
                    (b(dataOff + 2 * i + 1) << 8)).toShort.toLong
                  acc += s * s
                  i += 1
                }
                e(w) = acc
                w += 1
              }
              var afp = 0L
              var k = 0
              while (k < 63) {
                if (e(k) > e(k + 1)) afp |= 1L << k
                k += 1
              }
              Some(Row(r.getLong(idIdx), afp))
            }
        }
      }
    }(Encoders.row(audioFpSchema))
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

  val dhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("dhash", LongType)))

  /** REAL perceptual image hash (difference hash / dHash) over P6
    * payloads: nearest-neighbor downsample to a 9×8 luminance grid
    * (gray = (r+g+b)/3, integer), then bit b = y·8+x set iff
    * g(x,y) > g(x+1,y) — 63 bits (the last comparison is dropped so
    * the hash stays strictly below 2^63; DuckDB's left shift refuses
    * 1<<63, and 63 bits lose nothing measurable). Perceptually-equal
    * images (crops aside) land within a few bits, exact re-encodes at
    * distance 0. Scan-local; non-PPM payloads drop.
    */
  def dHash(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload =
          if (r.isNullAt(payloadIdx)) null
          else r.getAs[Array[Byte]](payloadIdx)
        (if (payload == null) None else ppmHeader(payload)).map {
          case (w, h, _, off, bps) =>
            def sample(idx: Int): Int =
              if (bps == 1) payload(off + idx) & 0xff
              else ((payload(off + 2 * idx) & 0xff) << 8) |
                (payload(off + 2 * idx + 1) & 0xff)
            def gray(gx: Int, gy: Int): Int = {
              val sx = (gx.toLong * w / 9).toInt
              val sy = (gy.toLong * h / 8).toInt
              val base = (sy.toLong * w + sx).toInt * 3
              (sample(base) + sample(base + 1) + sample(base + 2)) / 3
            }
            var hash = 0L
            var b = 0
            while (b < 63) {
              val x = b % 8; val y = b / 8
              if (gray(x, y) > gray(x + 1, y)) hash |= 1L << b
              b += 1
            }
            Row(r.getLong(idIdx), hash)
        }
      }
    }(Encoders.row(dhashSchema))
  }

  /** Near-duplicate image pairs by dHash hamming distance — EXACT for
    * `maxHamming` ≤ 3 by pigeonhole: the 63 bits split into 4 disjoint
    * bands (16+16+16+15), so ≤3 differing bits leave ≥1 band
    * untouched and every qualifying pair meets on an EQUI band key
    * (shuffle join, no n² product — the [[graft.operators.Dedup]]
    * banding shape applied to images); exact popcount verification
    * re-filters. Output (a_id, b_id, hamming).
    */
  def dhashPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming must be in [0, 3]: 4 bands guarantee exactness " +
        "only up to 3 differing bits")
    val banded = hashes.select(col("media_id").as("id"), col("dhash"),
      posexplode(array(
        shiftright(col("dhash"), 0) bitwiseAND lit(65535L),
        shiftright(col("dhash"), 16) bitwiseAND lit(65535L),
        shiftright(col("dhash"), 32) bitwiseAND lit(65535L),
        shiftright(col("dhash"), 48) bitwiseAND lit(32767L)))
        .as(Seq("band", "key")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.dhash").as("ha"), col("y.dhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming",
        expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
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
