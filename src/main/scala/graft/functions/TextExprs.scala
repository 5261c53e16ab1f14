package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass stopword kernels (SURVEY §4.2, same rationale as
  * [[MinHashSigExpr]]).
  *
  * The regex formulation (`regexp_extract_all(lower(text),
  * "\bw1\b|\bw2\b|…")`) re-scans every character position against the
  * whole alternation — O(len × words) with java.util.regex backtracking,
  * measured ~ms per KB row, the dominant CPU of the curation pipeline.
  * Because every stopword is a single `\w+` word, a `\bw\b` match is
  * EXACTLY a maximal word-character token equal to `w`: one tokenizing
  * scan + one hash lookup per token is semantically identical and O(len).
  * Word characters follow java.util.regex's ASCII `\w` = [A-Za-z0-9_]
  * (the regex ran over `lower(text)`, so A-Z fold into the token here).
  */
private[graft] object TextScan {

  /** Token-membership counts for each set in one pass over `text`. */
  def scanCounts(text: String, sets: Array[java.util.HashSet[String]]): Array[Int] = {
    val counts = new Array[Int](sets.length)
    val sb = new java.lang.StringBuilder(16)
    val n = text.length
    var i = 0
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else ' '
      val isWord = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
      if (isWord) sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      else if (sb.length > 0) {
        val tok = sb.toString
        var k = 0
        while (k < sets.length) {
          if (sets(k).contains(tok)) counts(k) += 1
          k += 1
        }
        sb.setLength(0)
      }
      i += 1
    }
    counts
  }

  def setOf(words: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(w => s.add(w))
    s
  }
}

/** Count of tokens of `child` contained in `words` — the single-pass form
  * of `size(regexp_extract_all(lower(text), "\bw1\b|…"))`. */
case class StopwordCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val sets = Array(TextScan.setOf(words))

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  override def nullSafeEval(input: Any): Any =
    TextScan.scanCounts(input.asInstanceOf[UTF8String].toString, sets)(0)

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Heuristic language id in ONE kernel: per-language token counts in one
  * scan, then the chained-CASE argmax (language i wins when its count is
  * >= every LATER language's count, languages in the caller's order;
  * `und` when nothing scored) — bit-identical to the column-CASE
  * formulation it replaces, which re-evaluated the full regex set per
  * CASE branch (conditionals disable common-subexpression elimination).
  */
case class LangIdExpr(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val codes = langs.map(l => UTF8String.fromString(l._1)).toArray
  @transient private lazy val sets = langs.map(l => TextScan.setOf(l._2)).toArray
  @transient private lazy val und = UTF8String.fromString("und")

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def nullSafeEval(input: Any): Any = {
    val counts = TextScan.scanCounts(input.asInstanceOf[UTF8String].toString, sets)
    var any = false
    var i = 0
    while (i < counts.length) { if (counts(i) > 0) any = true; i += 1 }
    if (!any) return und
    i = 0
    while (i < counts.length - 1) {
      var isMax = true
      var j = i + 1
      while (j < counts.length) {
        if (counts(i) < counts(j)) isMax = false
        j += 1
      }
      if (isMax) return codes(i)
      i += 1
    }
    codes(counts.length - 1)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object TextExprs {
  def stopwordCount(text: Column, words: Seq[String]): Column =
    Bridge.column(StopwordCountExpr(Bridge.expression(text), words))

  def langId(text: Column, langs: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangIdExpr(Bridge.expression(text), langs))
}
