package graft.exts

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match WordPiece tokenization of ONE word — the exact
  * HuggingFace/BERT algorithm: walk the word left to right, at each
  * position take the LONGEST vocab piece that matches (continuation
  * pieces carry the `##` prefix); if any position matches nothing, the
  * whole word collapses to `unk`.
  *
  * A custom Expression rather than a UDF so the vocabulary set is built
  * ONCE per executor (transient lazy) and rides the serialized plan —
  * a 30k-entry vocab costs one broadcast-like ship per task, not one
  * set-build per row. CodegenFallback: the per-word loop is string-hash
  * dominated and sits inside an interpreted HOF lambda anyway
  * (transform over the token array); codegen would buy nothing.
  */
case class WordPiece(
    child: Expression,
    vocab: Seq[String],
    unk: String = "[UNK]",
    maxInputChars: Int = 100)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "wordpiece"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): WordPiece =
    copy(child = newChild)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"wordpiece needs a string word, got ${child.dataType.catalogString}")

  @transient private lazy val pieces: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val unkUtf = UTF8String.fromString(unk)

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    if (word.isEmpty) return new GenericArrayData(Array.empty[Any])
    if (word.length > maxInputChars) return new GenericArrayData(Array[Any](unkUtf))
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var cur: String = null
      while (cur == null && end > start) {
        val sub0 = word.substring(start, end)
        val sub = if (start > 0) "##" + sub0 else sub0
        if (pieces.contains(sub)) cur = sub else end -= 1
      }
      if (cur == null) return new GenericArrayData(Array[Any](unkUtf))
      out += UTF8String.fromString(cur)
      start = end
    }
    new GenericArrayData(out.toArray)
  }
}

/** Byte-pair-encoding tokenization of ONE word under a ranked merge list —
  * the GPT-2/Sennrich reference loop: repeatedly find the LOWEST-RANK
  * adjacent piece pair present and merge ALL its occurrences left-to-right
  * (overlaps skip — merging (a,a) over [a,a,a] gives [aa,a]), until no
  * listed pair remains. Char-level start (no byte fallback — the corpus
  * contract here is text). Same once-per-executor rank-map economics as
  * [[WordPiece]]. */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bpe_tokenize"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_tokenize needs a string word, got ${child.dataType.catalogString}")

  @transient private lazy val rank: java.util.HashMap[(String, String), Int] = {
    val m = new java.util.HashMap[(String, String), Int](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) => if (!m.containsKey(p)) m.put(p, i) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    if (word.isEmpty) return new GenericArrayData(Array.empty[Any])
    var pieces: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done && pieces.length > 1) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < pieces.length - 1) {
        val r = rank.getOrDefault((pieces(i), pieces(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (pieces(i), pieces(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else {
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < pieces.length) {
          if (j < pieces.length - 1 && pieces(j) == best._1 && pieces(j + 1) == best._2) {
            out += (best._1 + best._2); j += 2
          } else { out += pieces(j); j += 1 }
        }
        pieces = out.result()
      }
    }
    new GenericArrayData(pieces.map(p => UTF8String.fromString(p): Any).toArray)
  }
}

object TokenizerExpressions {
  import org.apache.spark.sql.Column

  /** Column wrapper: pieces of one word. */
  def wordpiece(word: Column, vocab: Seq[String],
      unk: String = "[UNK]", maxInputChars: Int = 100): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      WordPiece(org.apache.spark.sql.GraftSqlBridge.expression(word), vocab, unk, maxInputChars))

  /** Column wrapper: BPE pieces of one word under a ranked merge list. */
  def bpe(word: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      BpeTokenize(org.apache.spark.sql.GraftSqlBridge.expression(word), merges))
}
