package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Delta Lake deletion-vector decoding, implemented from the public
  * protocol (delta-io PROTOCOL.md "Deletion Vectors" + the
  * RoaringFormatSpec portable serialization):
  *
  *   - a DV descriptor on an `add` action names where the bitmap
  *     lives: `i` inline (Z85 text), `u` relative file (Z85-encoded
  *     UUID under the table root, optional random prefix), `p`
  *     absolute path;
  *   - on-disk DV files carry a 1-byte format version, then per-DV
  *     `<int32 BE dataSize><data><int32 BE CRC-32>` blobs (`offset`
  *     points at the size field);
  *   - the data is a RoaringBitmapArray in "portable" format: LE magic
  *     1681511377, LE int64 bitmap count, then standard portable
  *     32-bit roaring bitmaps (array / bitset / run containers); row
  *     index = bitmapIndex << 32 | value.
  *
  * The reference scans DV-carrying tables through delta-kernel; here
  * the bitmap decodes to (file, row_index) pairs that an anti-join
  * against the parquet scan's `_metadata.row_index` masks out —
  * distributed, no driver materialization of the masked row set.
  */
object DeletionVectors {

  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Int, cardinality: Long)

  // ------------------------------------------------------------- z85

  /** Z85 alphabet (ZeroMQ spec 32/Z85 — the variant Delta uses). */
  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0; var o = 0
    while (i < s.length) {
      var v = 0L; var k = 0
      while (k < 5) {
        val c = s.charAt(i + k)
        val d = if (c < 128) z85Rev(c) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d; k += 1
      }
      out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte
      i += 5; o += 4
    }
    out
  }

  /** Absolute path of an on-disk DV file. */
  def dvPath(tableDir: String, d: Descriptor): String = d.storageType match {
    case "p" => d.pathOrInlineDv
    case "u" =>
      // <optional random prefix><20-char z85 uuid>; file name embeds
      // the canonical UUID rendering
      val s = d.pathOrInlineDv
      require(s.length >= 20, s"malformed relative DV path $s")
      val enc = s.takeRight(20)
      val prefix = s.dropRight(20) match { case "" => ""; case p => s"$p/" }
      val bb = ByteBuffer.wrap(z85Decode(enc))
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      s"$tableDir/${prefix}deletion_vector_$uuid.bin"
    case t => throw new IllegalArgumentException(
      s"unsupported deletion vector storage type '$t'")
  }

  /** Deleted row indices of one descriptor (sorted ascending). On-disk
    * DVs ('u'/'p') open through the Hadoop FileSystem of the caller's
    * configuration — this runs inside executor tasks, where the table
    * may live on any configured filesystem (s3a/hdfs), not just
    * `file:`, same posture as the other byte-level readers.
    */
  def deletedRows(tableDir: String, d: Descriptor,
      conf: org.apache.hadoop.conf.Configuration): Array[Long] =
    d.storageType match {
      case "i" => parseBitmapArray(z85Decode(d.pathOrInlineDv))
      case "u" | "p" =>
        val p = new org.apache.hadoop.fs.Path(dvPath(tableDir, d))
        val fs = p.getFileSystem(conf)
        val len = fs.getFileStatus(p).getLen
        require(len <= Int.MaxValue, s"absurd DV file size $len")
        val bytes = new Array[Byte](len.toInt)
        val in = fs.open(p)
        try in.readFully(0, bytes) finally in.close()
        require(bytes.nonEmpty && bytes(0) == 1,
          s"unsupported DV file format version ${bytes.headOption.getOrElse(-1)}")
        val off = d.offset.getOrElse(1L).toInt
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
        val size = bb.getInt(off)
        require(size == d.sizeInBytes,
          s"DV blob size $size != descriptor sizeInBytes ${d.sizeInBytes}")
        val data = java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + size)
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        val stored = bb.getInt(off + 4 + size)
        require(stored == crc.getValue.toInt,
          "deletion vector checksum mismatch — refusing a corrupt mask")
        parseBitmapArray(data)
      case t => throw new IllegalArgumentException(
        s"unsupported deletion vector storage type '$t'")
    }

  // ------------------------------------------- portable roaring parse

  private val PortableMagic = 1681511377
  private val SerialCookie = 12347 // run containers present
  private val SerialCookieNoRun = 12346

  /** RoaringBitmapArray portable bytes → sorted row indices. */
  def parseBitmapArray(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt == PortableMagic,
      "bad RoaringBitmapArray magic — not a portable-format DV")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"absurd bitmap count $n")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var k = 0L
    while (k < n) {
      parseRoaring32(bb, base = k << 32, out)
      k += 1
    }
    out.toArray
  }

  /** One standard portable 32-bit roaring bitmap, appending
    * `base | value` for every set value. Containers are laid out
    * sequentially after the header (the offset header, when present,
    * is derived data — skipped).
    */
  private def parseRoaring32(bb: ByteBuffer, base: Long,
      out: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    val cookie = bb.getInt
    val (size, runFlags) =
      if ((cookie & 0xffff) == SerialCookie) {
        val s = (cookie >>> 16) + 1
        val f = new Array[Byte]((s + 7) / 8)
        bb.get(f)
        (s, f)
      } else {
        require(cookie == SerialCookieNoRun,
          s"bad roaring cookie $cookie")
        (bb.getInt, null)
      }
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    // offset header: always present without run containers, else only
    // when size >= 4 (RoaringFormatSpec NO_OFFSET_THRESHOLD)
    if (runFlags == null || size >= 4)
      bb.position(bb.position() + 4 * size)
    i = 0
    while (i < size) {
      val hi = base | (keys(i).toLong << 16)
      val isRun = runFlags != null &&
        (runFlags(i / 8) & (1 << (i % 8))) != 0
      if (isRun) {
        val nRuns = bb.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          var v = start
          while (v <= start + len) { out += (hi | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var c = 0
        while (c < cards(i)) { out += (hi | (bb.getShort & 0xffff)); c += 1 }
      } else { // bitset container: 1024 64-bit words
        var w = 0
        while (w < 1024) {
          var word = bb.getLong
          while (word != 0) {
            val bit = java.lang.Long.numberOfTrailingZeros(word)
            out += (hi | (w * 64 + bit))
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
  }
}
