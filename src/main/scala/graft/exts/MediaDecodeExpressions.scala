package graft.exts

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** REAL pixel/sample decode with no codec library: BMP's 24/32-bpp
  * device-independent bitmap rows and WAV's PCM frames are pure fixed
  * byte layouts; PNG (round 8) needs only DEFLATE — which ships in the
  * JDK as `java.util.zip.Inflater` — plus the spec'd per-row unfilter
  * pass; and baseline JPEG (round 9) is canonical Huffman decoding +
  * dequantization + an 8x8 inverse DCT + the JFIF color matrix — a few
  * hundred lines of arithmetic, no codec primitive required. All four
  * image/audio modalities of the multimodal pipeline run end-to-end
  * with genuine decoded values (the promised stub-swap point of
  * `Multimodal.extractFeaturesBatched` made real; only compressed
  * audio/video and the exotic JPEG variants remain out —
  * DIVERGENCES §8 keeps that honest).
  *
  * All return null for anything outside the decodable subset — never a
  * wrong pixel. Codegen'd via static helper calls, SQL-registered as
  * `bmp_pixels` / `wav_samples` / `png_pixels` / `jpeg_pixels`, plus
  * the magic-sniffing `image_pixels` dispatcher for mixed columns.
  */
/** Shared shape of the binary→int-array decode expressions: nullable
  * int-array output, binary-input type check, eval and whole-stage
  * codegen both routed through one static `decode(byte[])` entry point
  * per format — each concrete decoder is name + dispatch, nothing else. */
abstract class MediaDecodeExpression extends UnaryExpression {
  /** SQL-facing function name, for the type-check error message. */
  protected def fnName: String
  /** Fully-qualified object whose static `decode` the codegen calls. */
  protected def decoder: String
  protected def run(b: Array[Byte]): ArrayData

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$fnName needs binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("px")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $r = $decoder.decode($b);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
}

case class BmpPixels(child: Expression) extends MediaDecodeExpression {
  protected def fnName = "bmp_pixels"
  protected def decoder = "graft.exts.BmpPixels"
  protected def run(b: Array[Byte]) = BmpPixels.decode(b)
  override protected def withNewChildInternal(newChild: Expression): BmpPixels =
    copy(child = newChild)
}

object BmpPixels {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** Upper bound on decoded pixels (64 MPix ≈ 256 MB of ints) — a forged
    * header must not allocate unboundedly inside an executor task. */
  final val MaxPixels = 64L * 1024 * 1024

  /** Decode a BMP payload into packed 0xRRGGBB ints in TOP-DOWN row-major
    * order (BMP stores rows bottom-up unless height is negative — the
    * flip is normalized here so pixel index = y*width + x everywhere
    * downstream). Decodable subset: BITMAPINFOHEADER-family DIBs (size
    * 40/52/56/64/108/124) at 24 or 32 bpp and OS/2 BITMAPCOREHEADER at
    * 24 bpp, compression BI_RGB(0) or BI_BITFIELDS(3, the V4+ default
    * masks) — everything else (RLE, palettes, exotic masks) → null. */
  def decode(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 26 || b(0) != 'B' || b(1) != 'M') return null
    val dataOff = le32(b, 10)
    val dib = le32(b, 14)
    var w = 0L; var h = 0L; var topDown = false; var bpp = 0
    if (dib == 12L) {
      w = le16(b, 18); h = le16(b, 20); bpp = le16(b, 24)
      if (bpp != 24) return null
    } else if (dib == 40L || dib == 52L || dib == 56L || dib == 64L ||
               dib == 108L || dib == 124L) {
      if (b.length < 34) return null
      w = le32(b, 18)
      val rawH = le32(b, 22).toInt
      topDown = rawH < 0
      h = math.abs(rawH.toLong)
      bpp = le16(b, 28)
      val compression = le32(b, 30)
      if (bpp != 24 && bpp != 32) return null
      // BI_RGB always; BI_BITFIELDS only with the standard BGRA masks a
      // V4/V5 header spells out (anything custom would scramble channels)
      if (compression == 3L) {
        if (dib < 108L || b.length < 70) return null
        val rMask = le32(b, 54); val gMask = le32(b, 58); val bMask = le32(b, 62)
        if (rMask != 0x00ff0000L || gMask != 0x0000ff00L || bMask != 0x000000ffL)
          return null
      } else if (compression != 0L) return null
    } else return null
    if (w <= 0 || h <= 0 || w * h > MaxPixels) return null
    val bytesPerPx = bpp / 8
    val rowBytes = (w * bytesPerPx + 3) / 4 * 4
    if (dataOff < 0 || dataOff + rowBytes * h > b.length) return null
    val wi = w.toInt; val hi = h.toInt
    val out = new Array[Int](wi * hi)
    var row = 0
    while (row < hi) {
      val y = if (topDown) row else hi - 1 - row // normalize to top-down
      var base = (dataOff + rowBytes * row).toInt
      var x = 0
      while (x < wi) {
        // BMP stores BGR(A)
        out(y * wi + x) = (u8(b, base + 2) << 16) | (u8(b, base + 1) << 8) | u8(b, base)
        base += bytesPerPx
        x += 1
      }
      row += 1
    }
    new GenericArrayData(out)
  }
}

case class PngPixels(child: Expression) extends MediaDecodeExpression {
  protected def fnName = "png_pixels"
  protected def decoder = "graft.exts.PngPixels"
  protected def run(b: Array[Byte]) = PngPixels.decode(b)
  override protected def withNewChildInternal(newChild: Expression): PngPixels =
    copy(child = newChild)
}

/** PNG pixel decode via the JDK's own DEFLATE (zlib) — no codec library
  * (the entropy coder PNG uses IS zlib, which `java.util.zip.Inflater`
  * implements; the rest of the format is fixed byte layout + the five
  * spec'd row filters). Decodable subset: non-interlaced 8-bit-depth
  * grayscale (0), gray+alpha (4), RGB (2) and RGBA (6); palette,
  * 1/2/4/16-bit depths, Adam7 interlace, malformed chunk lists,
  * truncated or corrupt DEFLATE streams, and unknown filter types → null,
  * never a wrong pixel. Output matches [[BmpPixels]]: packed 0xRRGGBB
  * ints in top-down row-major order (gray replicated to all three
  * channels, alpha dropped), so every downstream stat/feature operator
  * is format-agnostic. */
object PngPixels {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  final val MaxPixels = BmpPixels.MaxPixels

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def decode(b: Array[Byte]): ArrayData = {
    // minimum: 8 signature + 25 IHDR + 12 empty IDAT + 12 IEND
    if (b == null || b.length < 57) return null
    var s = 0
    while (s < 8) { if (b(s) != Signature(s)) return null; s += 1 }
    // IHDR must be the first chunk, 13 bytes
    if (be32(b, 8) != 13L || !tag(b, 12, "IHDR")) return null
    val w = be32(b, 16); val h = be32(b, 20)
    val depth = u8(b, 24); val color = u8(b, 25)
    val comp = u8(b, 26); val filt = u8(b, 27); val inter = u8(b, 28)
    if (depth != 8 || comp != 0 || filt != 0 || inter != 0) return null
    val channels = color match {
      case 0 => 1 // grayscale
      case 2 => 3 // RGB
      case 4 => 2 // gray + alpha
      case 6 => 4 // RGBA
      case _ => return null // 3 = palette: PLTE indirection out of scope
    }
    if (w <= 0 || h <= 0 || w * h > MaxPixels) return null
    // walk the chunk list, concatenating every IDAT payload (the zlib
    // stream may be split across chunks at arbitrary byte boundaries)
    val idat = new java.io.ByteArrayOutputStream()
    var i = 33L // 8 signature + 4 len + 4 "IHDR" + 13 data + 4 crc
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val at = i.toInt
      val len = be32(b, at) // 4-byte BE length, then 4-byte type
      if (len < 0 || i + 12 + len > b.length) return null
      if (tag(b, at + 4, "IDAT")) idat.write(b, at + 8, len.toInt)
      else if (tag(b, at + 4, "IEND")) sawEnd = true
      i += 12L + len
    }
    if (!sawEnd || idat.size() == 0) return null
    // inflate to EXACTLY h * (1 + w*channels) bytes of filtered scanlines
    val wi = w.toInt; val hi = h.toInt
    val stride = wi * channels
    val raw = new Array[Byte](hi * (1 + stride))
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        got += n
      }
      if (got < raw.length) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // per-row unfilter (None/Sub/Up/Average/Paeth), in place into `px`
    val px = new Array[Byte](hi * stride)
    val bpp = channels
    var r = 0
    while (r < hi) {
      val ft = u8(raw, r * (1 + stride))
      if (ft > 4) return null
      val rowIn = r * (1 + stride) + 1
      val rowOut = r * stride
      var x = 0
      while (x < stride) {
        val cur = u8(raw, rowIn + x)
        val a = if (x >= bpp) u8(px, rowOut + x - bpp) else 0
        val up = if (r > 0) u8(px, rowOut - stride + x) else 0
        val c = if (r > 0 && x >= bpp) u8(px, rowOut - stride + x - bpp) else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + up
          case 3 => cur + ((a + up) >> 1)
          case 4 => // Paeth predictor
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        px(rowOut + x) = (v & 0xff).toByte
        x += 1
      }
      r += 1
    }
    // pack to 0xRRGGBB top-down row-major (PNG is already top-down)
    val out = new Array[Int](wi * hi)
    var j = 0
    while (j < out.length) {
      val base = j * channels
      out(j) = channels match {
        case 1 => val g = u8(px, base); (g << 16) | (g << 8) | g
        case 2 => val g = u8(px, base); (g << 16) | (g << 8) | g // alpha dropped
        case 3 => (u8(px, base) << 16) | (u8(px, base + 1) << 8) | u8(px, base + 2)
        case 4 => (u8(px, base) << 16) | (u8(px, base + 1) << 8) | u8(px, base + 2)
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class WavSamples(child: Expression) extends MediaDecodeExpression {
  protected def fnName = "wav_samples"
  protected def decoder = "graft.exts.WavSamples"
  protected def run(b: Array[Byte]) = WavSamples.decode(b)
  override protected def withNewChildInternal(newChild: Expression): WavSamples =
    copy(child = newChild)
}

object WavSamples {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  final val MaxSamples = 64L * 1024 * 1024

  /** Decode WAV PCM frames into signed sample values, channel-interleaved
    * exactly as stored: 16-bit → [-32768, 32767], 8-bit (stored unsigned)
    * → centered to [-128, 127]. Non-PCM encodings (float, ADPCM, µ-law)
    * and malformed chunk lists → null. Cursor arithmetic is Long for the
    * same uint32-chunk-size reason as [[AudioHeader.probe]]. */
  def decode(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 44) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var i = 12L
    var audioFormat = 0; var bits = 0
    var dataAt = -1L; var dataLen = -1L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val sz = le32(b, at + 4)
      // the fmt chunk's OWN declared size must cover the 16 bytes read
      // below — a truncated/zero-size fmt chunk would otherwise silently
      // read audioFormat/bits from the NEXT chunk's bytes
      if (tag(b, at, "fmt ") && sz >= 16 && i + 24 <= b.length) {
        audioFormat = le16(b, at + 8)
        bits = le16(b, at + 22)
      } else if (tag(b, at, "data")) {
        dataAt = i + 8; dataLen = sz
      }
      i += 8L + sz + (sz & 1L)
    }
    if (audioFormat != 1 || dataAt < 0) return null // PCM only
    if (bits != 16 && bits != 8) return null
    if (dataAt + dataLen > b.length) dataLen = b.length - dataAt // truncated file: decode what's there
    val bytesPer = bits / 8
    val n = dataLen / bytesPer
    if (n < 0 || n > MaxSamples) return null
    val out = new Array[Int](n.toInt)
    var j = 0
    var at = dataAt.toInt
    while (j < out.length) {
      out(j) =
        if (bits == 16) le16(b, at).toShort.toInt // sign-extend
        else u8(b, at) - 128                      // 8-bit WAV is unsigned
      at += bytesPer
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class JpegPixels(child: Expression) extends MediaDecodeExpression {
  protected def fnName = "jpeg_pixels"
  protected def decoder = "graft.exts.JpegPixels"
  protected def run(b: Array[Byte]) = JpegPixels.decode(b)
  override protected def withNewChildInternal(newChild: Expression): JpegPixels =
    copy(child = newChild)
}

/** Baseline JPEG pixel decode with no codec library (round 9 — the last
  * image modality unstubbed): Huffman entropy decode + dequantization +
  * 8x8 inverse DCT + YCbCr→RGB are all pure arithmetic, the same
  * feasibility class as round 8's PNG inflate+unfilter. Decodable
  * subset: baseline/extended SEQUENTIAL Huffman frames (SOF0/SOF1),
  * 8-bit precision, 1 (grayscale) or 3 (YCbCr) components with sampling
  * factors in {1,2} (4:4:4 / 4:2:2 / 4:2:0), interleaved scan, optional
  * restart markers. Progressive (SOF2), arithmetic coding, 12-bit,
  * hierarchical, and CMYK frames → null, never a wrong pixel.
  *
  * Chroma upsampling is nearest-neighbor sample replication (the
  * spec-defined samples themselves; no interpolation is mandated by the
  * standard, so decoders legitimately differ here — documented in
  * DIVERGENCES §8). YCbCr→RGB is the JFIF matrix with round-half-up.
  * Output matches [[BmpPixels]]/[[PngPixels]]: packed 0xRRGGBB ints,
  * top-down row-major. */
object JpegPixels {
  final val MaxPixels = BmpPixels.MaxPixels

  /** Internal decode failure — caught at the boundary, never escapes. */
  private final class Fail extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Fail

  /** Zigzag index → natural (row-major v*8+u) index. */
  private[exts] val ZigzagNat: Array[Int] = {
    val z = new Array[Int](64)
    var u = 0; var v = 0
    var k = 0
    while (k < 64) {
      z(k) = v * 8 + u
      if (((u + v) & 1) == 0) { // moving up-right
        if (u == 7) v += 1 else if (v == 0) u += 1 else { u += 1; v -= 1 }
      } else { // moving down-left
        if (v == 7) u += 1 else if (u == 0) v += 1 else { u -= 1; v += 1 }
      }
      k += 1
    }
    z
  }

  /** Separable IDCT basis: cosTab(u)(x) = C(u)/2 * cos((2x+1)uπ/16). */
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table per the JPEG spec's DECODE procedure. */
  private final class Huff(counts: Array[Int], val symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader: 0xFF00 byte-unstuffing, markers end the
    * stream (pos points AT the 0xFF when a marker is seen). */
  private final class Bits(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) fail()
        var v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) fail()
          val nxt = b(pos + 1) & 0xff
          if (nxt == 0x00) { pos += 2; v = 0xff } // stuffed literal FF
          else fail() // marker inside entropy data where none expected
        } else pos += 1
        acc = v; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (h.maxCode(l) < 0 || code > h.maxCode(l)) {
        l += 1
        if (l > 16) fail()
        code = (code << 1) | bit()
      }
      h.symbols(h.valPtr(l) + code - h.minCode(l))
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(idx: Int): Unit = {
      n = 0
      if (pos + 1 >= b.length) fail()
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + (idx & 7))) fail()
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  def decode(b: Array[Byte]): ArrayData =
    try decode0(b)
    catch {
      case _: Fail => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private def decode0(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 4) return null
    if (u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null // SOI
    val quant = new Array[Array[Int]](4) // natural order, dequant-ready
    val huffDc = new Array[Huff](4)
    val huffAc = new Array[Huff](4)
    var restartInterval = 0
    var adobeTransform = -1 // APP14 color-transform declaration, if any
    // frame state
    var w = 0; var h = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return null
      var marker = u8(b, i + 1)
      while (marker == 0xff && i + 2 < b.length) { i += 1; marker = u8(b, i + 1) } // fill bytes
      if (marker == 0xd9) return null // EOI before any scan
      val len = be16(b, i + 2)
      if (len < 2 || i + 2 + len > b.length) return null
      val at = i + 4 // segment payload start
      val end = i + 2 + len
      marker match {
        case 0xdb => // DQT: one or more (PqTq, 64) tables
          var p = at
          while (p < end) {
            val pq = u8(b, p) >> 4; val tq = u8(b, p) & 15
            if (pq != 0 || tq > 3 || p + 65 > end) return null // 8-bit tables only
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(ZigzagNat(k)) = u8(b, p + 1 + k); k += 1 }
            quant(tq) = t
            p += 65
          }
        case 0xc4 => // DHT: one or more (TcTh, 16 counts, symbols)
          var p = at
          while (p < end) {
            if (p + 17 > end) return null
            val tc = u8(b, p) >> 4; val th = u8(b, p) & 15
            if (tc > 1 || th > 3) return null
            val counts = Array.tabulate(16)(k => u8(b, p + 1 + k))
            val total = counts.sum
            if (total > 256 || p + 17 + total > end) return null
            val syms = Array.tabulate(total)(k => u8(b, p + 17 + k))
            val t = new Huff(counts, syms)
            if (tc == 0) huffDc(th) = t else huffAc(th) = t
            p += 17 + total
          }
        case 0xc0 | 0xc1 => // SOF0/SOF1: baseline / extended sequential Huffman
          if (u8(b, at) != 8) return null // 8-bit precision only
          h = be16(b, at + 1); w = be16(b, at + 3)
          nComp = u8(b, at + 5)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
          if (nComp != 1 && nComp != 3) return null
          if (at + 6 + nComp * 3 > end) return null
          compId = new Array[Int](nComp); compH = new Array[Int](nComp)
          compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = u8(b, at + 6 + c * 3)
            val hv = u8(b, at + 7 + c * 3)
            compH(c) = hv >> 4; compV(c) = hv & 15
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2) return null
            compQ(c) = u8(b, at + 8 + c * 3)
            if (compQ(c) > 3) return null
            c += 1
          }
          // T.81 A.2: a SINGLE-component scan is non-interleaved — its
          // MCU is one data unit in raster order regardless of the
          // declared sampling factors; honoring H/V>1 here would lay
          // blocks out z-ordered (wrong pixels, and wrong restart-MCU
          // counting). Force 1x1 for the one-component case.
          if (nComp == 1) { compH(0) = 1; compV(0) = 1 }
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return null // progressive / arithmetic / lossless / hierarchical
        case 0xdd => // DRI
          if (len != 4) return null
          restartInterval = be16(b, at)
        case 0xda => // SOS: entropy-coded data follows
          if (nComp == 0) return null
          val ns = u8(b, at)
          if (ns != nComp || at + 1 + ns * 2 + 3 > end) return null
          val dcSel = new Array[Int](nComp); val acSel = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val cs = u8(b, at + 1 + c * 2)
            val ci = compId.indexOf(cs)
            if (ci < 0) return null
            dcSel(ci) = u8(b, at + 2 + c * 2) >> 4
            acSel(ci) = u8(b, at + 2 + c * 2) & 15
            c += 1
          }
          // 3-component frames in straight-RGB colorspace (Adobe APP14
          // transform=0, or component IDs spelling 'R','G','B') must not
          // be pushed through the YCbCr matrix — null, never wrong colors
          if (nComp == 3 && (adobeTransform == 0 ||
              (compId(0) == 'R' && compId(1) == 'G' && compId(2) == 'B')))
            return null
          return decodeScan(b, end, w, h, nComp, compH, compV, compQ,
            quant, huffDc, huffAc, dcSel, acSel, restartInterval)
        case m if m >= 0xe0 && m <= 0xef => // APPn
          // APP14 "Adobe" declares the color transform: 0 = samples are
          // straight RGB (no YCbCr step), 1 = YCbCr, 2 = YCCK
          if (m == 0xee && len >= 14 && b(at) == 'A' && b(at + 1) == 'd' &&
              b(at + 2) == 'o' && b(at + 3) == 'b' && b(at + 4) == 'e')
            adobeTransform = u8(b, at + 11)
        case 0xfe => () // COM
        case _ => return null
      }
      i = end
    }
    null // no SOS reached
  }

  private def decodeScan(b: Array[Byte], scanStart: Int, w: Int, h: Int,
      nComp: Int, compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      quant: Array[Array[Int]], huffDc: Array[Huff], huffAc: Array[Huff],
      dcSel: Array[Int], acSel: Array[Int], restartInterval: Int): ArrayData = {
    val maxH = compH.max; val maxV = compV.max
    val mcuW = 8 * maxH; val mcuH = 8 * maxV
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // per-component planes at component resolution (padded to MCU grid)
    val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Byte](planeW(c) * planeH(c)))
    var c = 0
    while (c < nComp) {
      if (quant(compQ(c)) == null || huffDc(dcSel(c)) == null || huffAc(acSel(c)) == null)
        return null
      c += 1
    }
    val bits = new Bits(b, scanStart)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bits.restart(rst)
          rst = (rst + 1) & 7
          java.util.Arrays.fill(pred, 0)
        }
        c = 0
        while (c < nComp) {
          val q = quant(compQ(c)); val hdc = huffDc(dcSel(c)); val hac = huffAc(acSel(c))
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              // DC
              val t = bits.decode(hdc)
              if (t > 15) fail()
              val diff = extend(bits.receive(t), t)
              pred(c) += diff
              coef(0) = pred(c) * q(0)
              // AC
              var k = 1
              var done = false
              while (!done && k < 64) {
                val rs = bits.decode(hac)
                val r = rs >> 4; val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 else done = true // ZRL / EOB
                } else {
                  k += r
                  if (k > 63) fail()
                  coef(ZigzagNat(k)) = extend(bits.receive(s), s) * q(ZigzagNat(k))
                  k += 1
                }
              }
              // separable IDCT: rows (over u) then columns (over v)
              var v = 0
              while (v < 8) {
                var x = 0
                while (x < 8) {
                  var acc = 0.0
                  var u = 0
                  while (u < 8) { acc += CosTab(u)(x) * coef(v * 8 + u); u += 1 }
                  tmp(v * 8 + x) = acc
                  x += 1
                }
                v += 1
              }
              val px0 = (my * compV(c) + by) * 8
              val px0x = (mx * compH(c) + bx) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  var acc = 0.0
                  var v2 = 0
                  while (v2 < 8) { acc += CosTab(v2)(y) * tmp(v2 * 8 + x); v2 += 1 }
                  val s0 = math.floor(acc + 128.0 + 0.5).toInt
                  val sv = if (s0 < 0) 0 else if (s0 > 255) 255 else s0
                  planes(c)((px0 + y) * planeW(c) + px0x + x) = sv.toByte
                  x += 1
                }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // assemble output: replicate chroma samples up to full resolution
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (nComp == 1) {
          val g = planes(0)(y * planeW(0) + x) & 0xff
          out(y * w + x) = (g << 16) | (g << 8) | g
        } else {
          val yy = planes(0)((y * compV(0) / maxV) * planeW(0) + x * compH(0) / maxH) & 0xff
          val cb = planes(1)((y * compV(1) / maxV) * planeW(1) + x * compH(1) / maxH) & 0xff
          val cr = planes(2)((y * compV(2) / maxV) * planeW(2) + x * compH(2) / maxH) & 0xff
          def clamp(d: Double): Int = {
            val v = math.floor(d + 0.5).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val r = clamp(yy + 1.402 * (cr - 128))
          val g = clamp(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
          val bl = clamp(yy + 1.772 * (cb - 128))
          out(y * w + x) = (r << 16) | (g << 8) | bl
        }
        x += 1
      }
      y += 1
    }
    new GenericArrayData(out)
  }
}

case class ImagePixels(child: Expression) extends MediaDecodeExpression {
  protected def fnName = "image_pixels"
  protected def decoder = "graft.exts.ImagePixels"
  protected def run(b: Array[Byte]) = ImagePixels.decode(b)
  override protected def withNewChildInternal(newChild: Expression): ImagePixels =
    copy(child = newChild)
}

/** Format-sniffing image decode (round 9): the leading magic bytes pick
  * [[BmpPixels]], [[PngPixels]] or [[JpegPixels]], so a mixed-format
  * payload column decodes through ONE expression — the shape a real
  * crawled corpus has. Same packed-0xRRGGBB contract; unknown magic or
  * an undecodable member of a known format → null, never a wrong pixel.
  * SQL: `image_pixels`. */
object ImagePixels {
  def decode(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      PngPixels.decode(b)
    else if (b(0) == 'B' && b(1) == 'M')
      BmpPixels.decode(b)
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      JpegPixels.decode(b)
    else null
  }
}
