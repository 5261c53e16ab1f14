package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase blocklist matcher (EXT row I7, C4-style badwords
  * filtering): ONE Aho–Corasick scan per document instead of one
  * substring search per pattern — the difference between O(len) and
  * O(len × patterns) on the 100 TB safety-filter pass (C4's production
  * list is ~400 phrases).
  *
  * Matching contract, chosen for exact DuckDB-oracle parity: a pattern
  * `p` (lowercase words separated by single spaces) matches iff
  * `' ' || lower(text) || ' '` CONTAINS `' p ' ` — whole-word phrase
  * match via space padding, ASCII case fold (the fixtures are ASCII; the
  * oracle's `lower()` agrees on ASCII). The expression returns the number
  * of DISTINCT patterns present (each counted once regardless of
  * repetition), so `hits > 0` is the block decision and the count itself
  * ranks severity.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.length <= 64,
    s"blocklist must have 1..64 patterns (got ${patterns.length}) — " +
      "distinct-hit tracking uses a Long bitmask")
  patterns.foreach { p =>
    require(p.nonEmpty && p.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_' || c == ' ')
      && !p.startsWith(" ") && !p.endsWith(" ") && !p.contains("  "),
      s"blocklist pattern '$p' must be lowercase [a-z0-9_] words " +
        "separated by single spaces")
  }

  // Build over the SPACE-PADDED forms " p " so word boundaries are part
  // of the automaton itself; the scanner feeds a virtual leading and
  // trailing space around the text.
  private val gotoMaps = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Character, Integer]())
  private val outMask = scala.collection.mutable.ArrayBuffer(0L)
  patterns.zipWithIndex.foreach { case (p, idx) =>
    var node = 0
    (" " + p + " ").foreach { c =>
      val next = gotoMaps(node).get(c)
      node = if (next != null) next.intValue()
      else {
        gotoMaps += new java.util.HashMap[Character, Integer]()
        outMask += 0L
        gotoMaps(node).put(c, gotoMaps.length - 1)
        gotoMaps.length - 1
      }
    }
    outMask(node) |= 1L << idx
  }
  private val fail = new Array[Int](gotoMaps.length)
  locally { // BFS failure links; outputs propagate along them
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      gotoMaps(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && gotoMaps(f).get(c) == null) f = fail(f)
        val t = gotoMaps(f).get(c)
        fail(v) = if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
        outMask(v) |= outMask(fail(v))
        queue.add(v)
      }
    }
  }
  // Dense transition table for the scan hot loop: chars are folded to
  // lowercase ASCII; anything outside [space, a-z, 0-9, _] resets to root
  // (it can never be part of a pattern).
  private val Alphabet = " abcdefghijklmnopqrstuvwxyz0123456789_"
  private val charIdx = {
    val m = new Array[Int](128); java.util.Arrays.fill(m, -1)
    Alphabet.zipWithIndex.foreach { case (c, i) => m(c) = i }
    m
  }
  private val delta = {
    val d = Array.ofDim[Int](gotoMaps.length, Alphabet.length)
    for (u <- gotoMaps.indices; (c, i) <- Alphabet.zipWithIndex) {
      var f = u
      var t: Integer = gotoMaps(f).get(c)
      while (f != 0 && t == null) { f = fail(f); t = gotoMaps(f).get(c) }
      d(u)(i) = if (t != null) t.intValue() else 0
    }
    d
  }

  // frozen primitive copy for the scan hot loop (the ArrayBuffer boxes)
  private val outArr: Array[Long] = outMask.toArray

  /** Bitmask of distinct patterns present in the padded, case-folded
    * text.
    *
    * Case folding is ASCII-only (A-Z → a-z) and any char ≥ 128 resets the
    * automaton — matching the documented ASCII-phrase scope. A SQL-side
    * Unicode `lower()` is more permissive on exotic codepoints whose
    * lowercase IS an ASCII letter (e.g. U+212A KELVIN SIGN → 'k'), so
    * non-ASCII corpora must be pre-normalized (NFKC + lowercase) before
    * this scan if oracle parity on such text matters. */
  def matchMask(text: UTF8String): Long = {
    val s = text.toString
    var mask = 0L
    var node = delta(0)(0) // virtual leading space
    mask |= outArr(node)
    val n = s.length
    var i = 0
    while (i <= n) {
      val c0 = if (i < n) s.charAt(i) else ' ' // virtual trailing space
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      node = if (c < 128 && charIdx(c) >= 0) delta(node)(charIdx(c)) else 0
      mask |= outArr(node)
      i += 1
    }
    mask
  }

  def hits(text: UTF8String): Int = java.lang.Long.bitCount(matchMask(text))
}

object AhoCorasick {
  /** Small per-JVM automaton cache: validation at Column-construction
    * time, the expression's lazy field, and executor-side deserialization
    * would otherwise each rebuild the trie + failure links + dense table
    * for the same pattern list (noticeable at the ~400-phrase production
    * scale). Bounded: real pipelines use a handful of lists. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], AhoCorasick]()
  private val MaxCached = 64

  def of(patterns: Seq[String]): AhoCorasick = {
    val hit = cache.get(patterns)
    if (hit != null) return hit
    val built = new AhoCorasick(patterns.toArray) // validates; may throw
    if (cache.size < MaxCached) cache.putIfAbsent(patterns, built)
    built
  }
}

/** `int` count of distinct blocklist patterns present in `child`. */
case class BlocklistHitsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac = AhoCorasick.of(patterns)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "blocklist_hits"

  override def nullSafeEval(input: Any): Any =
    ac.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("blocklistAc", ac,
      "graft.functions.AhoCorasick")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $acRef.hits($c);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object BlocklistExprs {
  def hits(text: Column, patterns: Seq[String]): Column = {
    AhoCorasick.of(patterns) // fail fast, driver-side; instance cached
    Bridge.column(BlocklistHitsExpr(Bridge.expression(text), patterns))
  }
}
