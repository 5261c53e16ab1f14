package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encode kernel: applies a learned merge list (in learned order,
  * greedy-left non-overlapping per pass — see [[graft.llm.Bpe]] for why
  * that discipline makes token counts exactly conserve against training
  * statistics) to every whitespace word of a document and returns the
  * total subword-token count. Codegen'd; the ranked merge table rides in
  * as one closure-broadcast reference object. */
object BpeKernel {

  /** Initial symbol table of a word at CODEPOINT granularity. Code-unit
    * symbols would split astral-plane characters into lone surrogates —
    * which the vocabulary (built from Spark's codepoint `split(text, "")`)
    * and every DuckDB oracle (`len()` counts codepoints) never contain. */
  private[functions] def codepointSyms(word: String): Array[String] = {
    val syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var k = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      syms(k) = word.substring(i, i + cc)
      k += 1
      i += cc
    }
    syms
  }

  /** Symbol count of `word` after applying `merges` (flattened
    * [l0,r0,l1,r1,…]) in order. */
  def encodeCount(word: String, merges: Array[String]): Int = {
    val syms = codepointSyms(word)
    var len = syms.length
    var m = 0
    while (m < merges.length && len > 1) {
      val l = merges(m)
      val r = merges(m + 1)
      var read = 0
      var write = 0
      while (read < len) {
        if (read < len - 1 && syms(read) == l && syms(read + 1) == r) {
          syms(write) = l + r
          read += 2
        } else {
          syms(write) = syms(read)
          read += 1
        }
        write += 1
      }
      len = write
      m += 2
    }
    len
  }

  /** Total encoded token count over every whitespace word of `text`. */
  def encodedTokenCount(text: UTF8String, merges: Array[String]): Long = {
    val s = text.toString
    var total = 0L
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if (c == ' ') {
        if (i > start) total += encodeCount(s.substring(start, i), merges)
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Surviving symbol strings of `word` after the merge passes — same
    * greedy-left loop as [[encodeCount]] but keeping the symbols. */
  def encodeSyms(word: String, merges: Array[String]): Array[String] = {
    val syms = codepointSyms(word)
    var len = syms.length
    var m = 0
    while (m < merges.length && len > 1) {
      val l = merges(m)
      val r = merges(m + 1)
      var read = 0
      var write = 0
      while (read < len) {
        if (read < len - 1 && syms(read) == l && syms(read + 1) == r) {
          syms(write) = l + r
          read += 2
        } else {
          syms(write) = syms(read)
          read += 1
        }
        write += 1
      }
      len = write
      m += 2
    }
    java.util.Arrays.copyOf(syms, len)
  }

  /** Token-ID sequence of `text` under `merges` and `vocabIndex` (symbol →
    * id). Fails LOUD on a symbol absent from the vocabulary — ids written
    * to a training shard must never silently alias an UNK. */
  def encodeIds(text: UTF8String, merges: Array[String],
      vocabIndex: java.util.HashMap[String, Integer]): Array[Int] = {
    val s = text.toString
    val outBuf = new java.util.ArrayList[Integer](s.length)
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if (c == ' ') {
        if (i > start) {
          val syms = encodeSyms(s.substring(start, i), merges)
          var j = 0
          while (j < syms.length) {
            val id = vocabIndex.get(syms(j))
            if (id == null) {
              throw new IllegalArgumentException(
                s"bpe_encode_ids: symbol '${syms(j)}' not in the vocabulary" +
                  " — train/build the vocab on a corpus superset")
            }
            outBuf.add(id)
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Int](outBuf.size())
    var k = 0
    while (k < out.length) { out(k) = outBuf.get(k); k += 1 }
    out
  }
}

/** `bigint` encoded-token count of a text column under a learned BPE merge
  * list. Null text counts 0 tokens (an empty document). */
case class BpeEncodeCountExpr(child: Expression, merges: Array[String])
    extends UnaryExpression {

  require(merges.length % 2 == 0, "flattened merge list must pair up")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bpe_encode_count"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else BpeKernel.encodedTokenCount(v.asInstanceOf[UTF8String], merges)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[]")
    val childGen = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = ${childGen.isNull}
        ? 0L
        : graft.functions.BpeKernel.encodedTokenCount(${childGen.value}, $mRef);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** `array<int>` token-ID encode of a text column: the actual tokenize step
  * a training pipeline writes to shards — each whitespace word's surviving
  * BPE symbols mapped through the vocabulary (index in `vocab` = token id).
  * NULL text encodes to NULL (a missing document, distinct from the empty
  * document's empty array — the engine's null-propagation discipline);
  * a symbol missing from the vocabulary throws rather than aliasing an
  * UNK. The merge table and vocab ride in as closure references — a few
  * KB per executor, never a join. */
case class BpeEncodeIdsExpr(child: Expression, merges: Array[String],
    vocab: Array[String])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(merges.length % 2 == 0, "flattened merge list must pair up")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode_ids"

  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    var i = 0
    // first-wins: two merges can produce the SAME symbol string (e.g.
    // (a,bc) and (ab,c) both yield "abc") — they alias to one id, and
    // decode returns the shared string, so round-trips are unaffected
    while (i < vocab.length) { m.putIfAbsent(vocab(i), i); i += 1 }
    m
  }

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      BpeKernel.encodeIds(input.asInstanceOf[UTF8String], merges, index))

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Inverse of [[BpeEncodeIdsExpr]] for verification: concatenate the ids'
  * vocabulary strings (word boundaries are not carried by the ids, so the
  * decode equals the original text with ALL whitespace removed). NULL ids
  * decode to NULL. */
case class BpeDecodeConcatExpr(child: Expression, vocab: Array[String])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_decode_concat"

  override def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < ids.numElements()) {
      sb.append(vocab(ids.getInt(i)))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object BpeExprs {
  def encodeCount(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeCountExpr(Bridge.expression(text),
      merges.flatMap(p => Seq(p._1, p._2)).toArray))

  def encodeIds(text: Column, merges: Seq[(String, String)],
      vocab: Array[String]): Column =
    Bridge.column(BpeEncodeIdsExpr(Bridge.expression(text),
      merges.flatMap(p => Seq(p._1, p._2)).toArray, vocab))

  def decodeConcat(ids: Column, vocab: Array[String]): Column =
    Bridge.column(BpeDecodeConcatExpr(Bridge.expression(ids), vocab))
}
