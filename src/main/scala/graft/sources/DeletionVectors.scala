package graft.sources

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import java.util.zip.CRC32

/** Deletion-vector codec for the Delta Lake protocol (delta.io
  * PROTOCOL.md "Deletion Vectors") — pure byte math, no delta jar:
  *
  *   - Z85 (ZeroMQ base85) for the descriptor's `pathOrInlineDv`
  *     payloads (20-char UUIDs for on-disk DVs, padded data for inline).
  *   - The 64-bit "RoaringBitmapArray" portable serialization: LE magic
  *     1681511377, LE int64 bitmap count, then each 32-bit Roaring
  *     bitmap in the STANDARD portable format (cookies 12346/12347;
  *     array / bitmap / run containers) — value = (bitmapIndex << 32)
  *     | uint32.
  *   - The DV file layout: 1-byte format version, then per-DV
  *     [int32 BE size][bitmap bytes][int32 BE CRC32-of-bytes], the
  *     descriptor's `offset` pointing at the size word.
  *
  * Deserialization returns SORTED row-index arrays (the natural order of
  * the container walk), so membership during the read-side filter is a
  * binary search. Serialization (the write side of `deleteWhere`) emits
  * array containers below 4097 values and bitmap containers above —
  * always valid portable output any Delta reader accepts. Corrupt input
  * (bad magic, bad CRC, truncation) fails clearly, never returns a
  * partial bitmap. */
object DeletionVectors {

  /** Descriptor fields of an `add.deletionVector` action. */
  case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  // ---------------------------------------------------------------- Z85

  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Inv: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Decode Z85 text (length must be a multiple of 5) to bytes; the
    * caller truncates to the true length when the payload was padded. */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Inv(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  /** Encode bytes as Z85, zero-padding to a multiple of 4 (the Delta
    * convention — `sizeInBytes` preserves the true length). */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else java.util.Arrays.copyOf(bytes, bytes.length + (4 - bytes.length % 4))
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = ((padded(i) & 0xffL) << 24) | ((padded(i + 1) & 0xffL) << 16) |
        ((padded(i + 2) & 0xffL) << 8) | (padded(i + 3) & 0xffL)
      val chunk = new Array[Char](5)
      var j = 4
      while (j >= 0) { chunk(j) = Z85((v % 85).toInt); v /= 85; j -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  /** UUID ↔ its 20-char Z85 form (two big-endian longs, 16 bytes). */
  def encodeUuid(u: java.util.UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  def decodeUuid(s: String): java.util.UUID = {
    val b = z85Decode(s)
    val bb = ByteBuffer.wrap(b)
    new java.util.UUID(bb.getLong, bb.getLong)
  }

  // --------------------------------------- RoaringBitmapArray portable

  private val PortableMagic = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347

  /** Deserialize the 64-bit portable RoaringBitmapArray to sorted row
    * indices. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == PortableMagic,
      s"deletion vector bitmap has magic $magic, expected $PortableMagic " +
        "(portable RoaringBitmapArray)")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"implausible bitmap count $n")
    val out = Array.newBuilder[Long]
    var hi = 0L
    while (hi < n) {
      readRoaring32(bb, hi << 32, out)
      hi += 1
    }
    out.result()
  }

  /** One standard 32-bit portable Roaring bitmap at the buffer position. */
  private def readRoaring32(bb: ByteBuffer, base: Long,
      out: scala.collection.mutable.ArrayBuilder[Long]): Unit = {
    val cookie = bb.getInt
    var size = 0
    var runFlags: Array[Byte] = null
    if ((cookie & 0xffff) == SerialCookie) {
      size = (cookie >>> 16) + 1
      runFlags = new Array[Byte]((size + 7) / 8)
      bb.get(runFlags)
    } else if (cookie == SerialCookieNoRun) {
      size = bb.getInt
    } else {
      throw new IllegalArgumentException(
        s"unknown roaring cookie $cookie in deletion vector")
    }
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    // offset section: present always for the no-run cookie, and for the
    // run cookie when size >= 4; the data is sequential so just skip it
    if (cookie == SerialCookieNoRun || size >= 4) bb.position(bb.position() + 4 * size)
    i = 0
    while (i < size) {
      val keyBase = base | (keys(i).toLong << 16)
      val isRun = runFlags != null && ((runFlags(i / 8) >> (i % 8)) & 1) == 1
      if (isRun) {
        val nRuns = bb.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff // length - 1
          var v = start
          while (v <= start + len) { out += (keyBase | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) {
        // bitmap container: 1024 LE longs
        var w = 0
        while (w < 1024) {
          var word = bb.getLong
          val wordBase = keyBase | (w.toLong << 6)
          while (word != 0L) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            out += (wordBase | t)
            word &= word - 1
          }
          w += 1
        }
      } else {
        var v = 0
        while (v < cards(i)) { out += (keyBase | (bb.getShort & 0xffff)); v += 1 }
      }
      i += 1
    }
  }

  /** Serialize sorted row indices as a portable RoaringBitmapArray
    * (array containers ≤4096 values, bitmap containers above — no run
    * containers on the write path; both are valid portable output). */
  def serialize(sorted: Array[Long]): Array[Byte] = {
    require(sorted.isEmpty || sorted.last >= 0, "row indices must be non-negative")
    val nBitmaps = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    // group by (high32, key16): count per container
    val bitmaps = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var pos = 0
    var hi = 0L
    while (hi < nBitmaps) {
      val end = {
        var e = pos
        while (e < sorted.length && (sorted(e) >>> 32) == hi) e += 1
        e
      }
      bitmaps += serializeRoaring32(sorted, pos, end)
      pos = end
      hi += 1
    }
    val total = 12 + bitmaps.map(_.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(PortableMagic).putLong(nBitmaps)
    bitmaps.foreach(bb.put)
    bb.array()
  }

  private def serializeRoaring32(sorted: Array[Long], from: Int, to: Int): Array[Byte] = {
    // containers: consecutive runs of equal key16 within [from, to)
    case class C(key: Int, from: Int, to: Int)
    val cs = scala.collection.mutable.ArrayBuffer[C]()
    var i = from
    while (i < to) {
      val key = ((sorted(i) >>> 16) & 0xffff).toInt
      var j = i
      while (j < to && ((sorted(j) >>> 16) & 0xffff).toInt == key) j += 1
      cs += C(key, i, j)
      i = j
    }
    val dataLen = cs.map(c => if (c.to - c.from > 4096) 8192 else (c.to - c.from) * 2).sum
    val bb = ByteBuffer.allocate(8 + cs.length * 8 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(SerialCookieNoRun).putInt(cs.length)
    cs.foreach { c =>
      bb.putShort(c.key.toShort).putShort((c.to - c.from - 1).toShort)
    }
    // offsets (always present for the no-run cookie)
    var off = 8 + cs.length * 4 + cs.length * 4
    cs.foreach { c =>
      bb.putInt(off)
      off += (if (c.to - c.from > 4096) 8192 else (c.to - c.from) * 2)
    }
    cs.foreach { c =>
      if (c.to - c.from > 4096) {
        val words = new Array[Long](1024)
        var v = c.from
        while (v < c.to) {
          val low = (sorted(v) & 0xffff).toInt
          words(low >>> 6) |= (1L << (low & 63))
          v += 1
        }
        words.foreach(bb.putLong)
      } else {
        var v = c.from
        while (v < c.to) { bb.putShort((sorted(v) & 0xffff).toShort); v += 1 }
      }
    }
    bb.array()
  }

  // ------------------------------------------------------- DV file I/O

  /** Resolve a descriptor to its sorted deleted row indices. `tableDir`
    * anchors relative ("u"-type) DV files. */
  /** The on-disk sidecar a descriptor references (None for inline).
    * u-type: pathOrInlineDv = <optional prefix><20-char z85 uuid>, the DV
    * living at <tableDir>/<prefix>/deletion_vector_<uuid>.bin. */
  def sidecarFile(d: Descriptor, tableDir: File): Option[File] = d.storageType match {
    case "p" => Some(new File(d.pathOrInlineDv))
    case "u" =>
      val s = d.pathOrInlineDv
      require(s.length >= 20, s"u-type DV id too short: $s")
      val prefix = s.dropRight(20)
      val uuid = decodeUuid(s.takeRight(20))
      val dir = if (prefix.isEmpty) tableDir else new File(tableDir, prefix)
      Some(new File(dir, s"deletion_vector_$uuid.bin"))
    case _ => None
  }

  def readDescriptor(d: Descriptor, tableDir: File): Array[Long] = d.storageType match {
    case "i" =>
      val raw = z85Decode(d.pathOrInlineDv)
      require(raw.length >= d.sizeInBytes,
        s"inline DV decodes to ${raw.length} bytes < sizeInBytes ${d.sizeInBytes}")
      deserialize(java.util.Arrays.copyOf(raw, d.sizeInBytes))
    case "u" | "p" =>
      val file = sidecarFile(d, tableDir).get
      require(file.isFile, s"deletion vector file missing: $file")
      val all = Files.readAllBytes(file.toPath)
      val off = d.offset.getOrElse(1) // past the 1-byte format version
      require(off + 4 <= all.length, s"DV offset $off beyond file ${all.length}")
      val bb = ByteBuffer.wrap(all, off, all.length - off)
      val size = bb.getInt // big-endian
      require(size == d.sizeInBytes,
        s"DV at $file+$off has size $size, descriptor says ${d.sizeInBytes}")
      require(off + 4 + size + 4 <= all.length, s"DV data truncated in $file")
      val data = java.util.Arrays.copyOfRange(all, off + 4, off + 4 + size)
      val crcStored = ByteBuffer.wrap(all, off + 4 + size, 4).getInt
      val crc = new CRC32
      crc.update(data)
      require(crc.getValue.toInt == crcStored,
        s"DV checksum mismatch in $file at offset $off")
      deserialize(data)
    case other =>
      throw new IllegalArgumentException(s"unknown DV storageType '$other'")
  }

  /** Write one DV file holding the given per-path bitmaps; returns the
    * descriptor for each path. The file is named
    * `deletion_vector_<uuid>.bin` in `tableDir` (storageType "u"). */
  def writeDvFile(tableDir: File,
      perPath: Seq[(String, Array[Long])]): Map[String, Descriptor] = {
    val uuid = java.util.UUID.randomUUID()
    val id = encodeUuid(uuid)
    val chunks = perPath.map { case (p, idx) => (p, serialize(idx), idx.length.toLong) }
    val total = 1 + chunks.map(8 + _._2.length).sum
    val bb = ByteBuffer.allocate(total)
    bb.put(1.toByte) // format version
    val descriptors = Map.newBuilder[String, Descriptor]
    chunks.foreach { case (p, data, card) =>
      val off = bb.position()
      bb.putInt(data.length) // big-endian
      bb.put(data)
      val crc = new CRC32
      crc.update(data)
      bb.putInt(crc.getValue.toInt) // big-endian
      descriptors += p -> Descriptor("u", id, Some(off), data.length, card)
    }
    Files.write(new File(tableDir, s"deletion_vector_$uuid.bin").toPath, bb.array())
    descriptors.result()
  }
}
