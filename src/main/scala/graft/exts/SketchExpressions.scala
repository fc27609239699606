package graft.exts

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → shingle-hash → minhash sketch as ONE typed loop.
  *
  * The declarative sketch pipeline (`Dedup.tokens` → `shingleHashSet` →
  * `minhashSignature`) is value-correct but runs through higher-order
  * functions, whose lambdas Spark evaluates INTERPRETED, allocating per
  * element: per token an md5/murmur eval through the expression
  * interpreter, and per shingle-hash a fresh 32-element array from
  * `zip_with` inside the signature fold. At SF100 (5M docs × ~100 tokens)
  * that interpreter overhead IS the minhash stage. This expression computes
  * the identical values — same lowercase/split/filter tokenization, same
  * token hash (murmur3-42 / md5-28; md5-64 excluded — full-64-bit values
  * overflow the 31-polynomial roll, which ANSI rejects in the declarative
  * path too), same 31-polynomial k-window
  * rolling, same first-occurrence-order distinct, same (a·x+b) mod p
  * running minima — in one flat Java loop with two long[] buffers.
  *
  * Value identity with the declarative path is asserted per hash kind in
  * SketchFusionSpec and end-to-end by the q65 DuckDB oracle (whose SQL is
  * generated from the same constants).
  *
  * Reference: minhash-LSH dedup per ibis-adjacent pipeline ops (SURVEY.md
  * §2 LLM-data-pipeline); hash family = Broder '97 universal hashing, same
  * scheme as Spark MLlib MinHashLSH.
  */
case class ShingleMinhash(
    child: Expression,
    shingleK: Int,
    hashKind: String,
    params: Seq[(Long, Long)],
    prime: Long) extends UnaryExpression {

  override def prettyName: String = "shingle_minhash"
  override def dataType: DataType = StructType(Seq(
    StructField("sh", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")

  @transient private lazy val aArr: Array[Long] = params.map(_._1).toArray
  @transient private lazy val bArr: Array[Long] = params.map(_._2).toArray

  // same pattern as Dedup.tokens: split on non-letter/digit runs
  @transient private lazy val splitPattern =
    java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def tokenHash(tok: String): Long = hashKind match {
    case "murmur" =>
      // exactly Spark's hash(col).cast("long"): murmur3-x86-32 seed 42
      // over the token's UTF-8 bytes, sign-extended to long
      val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42).toLong
    case "md5_28" =>
      // first 7 hex chars of md5 = top 28 bits (Dedup.md5Hash28)
      val d = md5Local.get().digest(
        tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
  }

  /** The whole sketch for one document; called from both interpreted eval
    * and the generated code (reference-object call — the per-row work is
    * the loop itself, hundreds of hashes, not the dispatch). */
  def sketch(text: UTF8String): InternalRow = {
    if (text == null) return null
    // Dedup.tokens: filter(split(lower(text), "[^\p{L}\p{N}]+"), len > 0).
    // Lower = UTF8String.toLowerCase (same call); StringSplit -> java
    // regex split with limit -1; the length>0 filter drops the empty
    // leading/trailing fields so split-edge semantics can't diverge.
    val raw = splitPattern.split(text.toLowerCase.toString, -1)
    var n = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) n += 1; i += 1 }
    val th = new Array[Long](n)
    i = 0; var j = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { th(j) = tokenHash(raw(i)); j += 1 }
      i += 1
    }

    // shingleHashSet: k-window 31-polynomial roll (whole-doc fold when
    // shorter than k), first-occurrence-order distinct
    val rolled: Array[Long] =
      if (n < shingleK) {
        var acc = 7L
        i = 0
        while (i < n) { acc = acc * 31 + th(i); i += 1 }
        Array(acc)
      } else if (shingleK == 1) th
      else {
        val w = new Array[Long](shingleK) // 31^(k-1-j) weights
        var p = 1L
        i = shingleK - 1
        while (i >= 0) { w(i) = p; p *= 31L; i -= 1 }
        val out = new Array[Long](n - shingleK + 1)
        i = 0
        while (i <= n - shingleK) {
          var s = 0L
          j = 0
          while (j < shingleK) { s += th(i + j) * w(j); j += 1 }
          out(i) = s
          i += 1
        }
        out
      }
    val seen = new java.util.HashSet[java.lang.Long](rolled.length * 2)
    val sh = new Array[Long](rolled.length)
    var m = 0
    i = 0
    while (i < rolled.length) {
      if (seen.add(rolled(i))) { sh(m) = rolled(i); m += 1 }
      i += 1
    }
    val shOut = if (m == rolled.length) sh else java.util.Arrays.copyOf(sh, m)

    // minhashSignature: running minima of (a_i * (x mod p) + b_i) mod p
    val sig = new Array[Long](aArr.length)
    java.util.Arrays.fill(sig, prime)
    i = 0
    while (i < m) {
      val xm = { val r = shOut(i) % prime; if (r < 0) r + prime else r }
      j = 0
      while (j < aArr.length) {
        val v = (aArr(j) * xm + bArr(j)) % prime // a,xm < 2^31: no overflow
        val vm = if (v < 0) v + prime else v
        if (vm < sig(j)) sig(j) = vm
        j += 1
      }
      i += 1
    }

    new GenericInternalRow(Array[Any](
      new GenericArrayData(shOut), new GenericArrayData(sig)))
  }

  override def nullSafeEval(v: Any): Any = sketch(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleMinhash", this, classOf[ShingleMinhash].getName)
    nullSafeCodeGen(ctx, ev, t => {
      val r = ctx.freshName("r")
      s"""
        InternalRow $r = $self.sketch($t);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
