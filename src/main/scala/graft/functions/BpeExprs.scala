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

  /** Symbol count of `word` after applying `merges` (flattened
    * [l0,r0,l1,r1,…]) in order. */
  def encodeCount(word: String, merges: Array[String]): Int = {
    var syms = new Array[String](word.length)
    var len = word.length
    var i = 0
    while (i < len) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
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

object BpeExprs {
  def encodeCount(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeCountExpr(Bridge.expression(text),
      merges.flatMap(p => Seq(p._1, p._2)).toArray))
}
