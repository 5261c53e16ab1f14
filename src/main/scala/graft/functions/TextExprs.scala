package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  *
  * Both expressions implement `doGenCode` (a one-line static call into
  * this object), so a curation scan using them stays inside whole-stage
  * codegen — a `CodegenFallback` here would drop the entire projection
  * into interpreted eval with per-row boxing, a real tax at 100 TB.
  */
private[graft] object TextScan {

  /** Canonical `und` (undetermined) code — also the null-text result of
    * [[LangIdExpr]]; referenced from generated code as `TextScan.Und()`. */
  val Und: UTF8String = UTF8String.fromString("und")

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

  /** Single-set count — the codegen entry point of [[StopwordCountExpr]]
    * (no per-row array allocation). */
  def stopwordCount(text: UTF8String, set: java.util.HashSet[String]): Int = {
    val s = text.toString
    var count = 0
    val sb = new java.lang.StringBuilder(16)
    val n = s.length
    var i = 0
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      val isWord = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
      if (isWord) sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      else if (sb.length > 0) {
        if (set.contains(sb.toString)) count += 1
        sb.setLength(0)
      }
      i += 1
    }
    count
  }

  /** Language argmax — the codegen entry point of [[LangIdExpr]]: per-set
    * counts in one scan, then chained-CASE priority (language i wins when
    * its count >= every LATER language's count; [[Und]] when nothing
    * scored) — bit-identical to the column-CASE formulation it replaced. */
  def langIdPick(text: UTF8String, sets: Array[java.util.HashSet[String]],
      codes: Array[UTF8String]): UTF8String = {
    val counts = scanCounts(text.toString, sets)
    var any = false
    var i = 0
    while (i < counts.length) { if (counts(i) > 0) any = true; i += 1 }
    if (!any) return Und
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

  /** The kernel can only ever match pure `[a-z0-9_]+` tokens (the
    * tokenizer lowercases as it scans), so word lists are normalized to
    * lowercase here and anything that is not a single `\w+` word — e.g.
    * "don't", "c'est", a phrase — is rejected loudly rather than silently
    * never matching. */
  def setOf(words: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach { w =>
      val lw = w.toLowerCase(java.util.Locale.ROOT)
      require(lw.nonEmpty && lw.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'),
        s"stopword '$w' is not a single [A-Za-z0-9_]+ word; " +
          "the token kernel cannot match apostrophes, spaces, or non-ASCII")
      s.add(lw)
    }
    s
  }
}

/** Count of tokens of `child` contained in `words` — the single-pass form
  * of `size(regexp_extract_all(lower(text), "\bw1\b|…"))`. Null text yields
  * null, matching the regex formulation. */
case class StopwordCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {

  @transient private lazy val set = TextScan.setOf(words)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  override def nullSafeEval(input: Any): Any =
    TextScan.stopwordCount(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextScan.stopwordCount($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Heuristic language id in ONE kernel — see [[TextScan.langIdPick]] for
  * the argmax contract. Never null: null text yields `und` (undetermined),
  * the same answer the column-CASE formulation gives (`when(anyHit, …)`
  * does not fire on a null predicate, so its `otherwise("und")` applies). */
case class LangIdExpr(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression {

  @transient private lazy val codes = langs.map(l => UTF8String.fromString(l._1)).toArray
  @transient private lazy val sets = langs.map(l => TextScan.setOf(l._2)).toArray

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "lang_id"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextScan.Und
    else TextScan.langIdPick(v.asInstanceOf[UTF8String], sets, codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("langSets", sets, "java.util.HashSet[]")
    val codesRef = ctx.addReferenceObj("langCodes", codes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = ${childGen.isNull}
        ? graft.functions.TextScan.Und()
        : graft.functions.TextScan.langIdPick(${childGen.value}, $setsRef, $codesRef);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object TextExprs {
  // word-list validation lives HERE (and in the Registry's SQL binding),
  // not in the case-class bodies: Catalyst copies expression trees many
  // times per analysis/optimization pass, and a constructor-body setOf
  // would rebuild and re-validate the sets on every copy
  def stopwordCount(text: Column, words: Seq[String]): Column = {
    TextScan.setOf(words) // fail fast, driver-side
    Bridge.column(StopwordCountExpr(Bridge.expression(text), words))
  }

  def langId(text: Column, langs: Seq[(String, Seq[String])]): Column = {
    langs.foreach(l => TextScan.setOf(l._2))
    Bridge.column(LangIdExpr(Bridge.expression(text), langs))
  }
}
