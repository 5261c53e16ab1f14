package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed bag-of-words logistic-regression kernel (EXT row I5, model-based
  * quality filtering; no reference-repo counterpart — this is the
  * classifier step a curation pipeline runs between heuristic filters and
  * training, e.g. a fastText/LR quality model scored over a full crawl).
  *
  * Everything is exact integer fixed-point (scale 2^20), the repo's
  * established determinism pattern ([[KMeansKernel]],
  * [[graft.operators.PageRank]]): per-document gradient contributions are
  * Longs, so their sum — and therefore the trained weights, every score,
  * and every prediction — is bit-identical across partitionings, task
  * orders, and cluster sizes. Floating-point GD would drift with shuffle
  * order and break re-run-stable corpus membership.
  *
  * Tokens are maximal non-space runs (the battery's `split(text, ' +')`
  * tokenization); the bucket is `floorMod(token.hashCode, nBuckets)` —
  * `String.hashCode` is fixed by the JLS, so the feature map is stable
  * across JVMs. The per-token weight lookup means a document's logit is
  * `intercept + Σ_tokens w[bucket(tok)]` — occurrence counts fall out of
  * iteration, no per-row feature vector is ever allocated.
  */
object LrKernel {

  /** Fixed-point scale for weights, probabilities, and labels. */
  val Scale: Long = 1L << 20

  /** Logit in fixed point: `b0 + Σ_tokens w[bucket(tok)]`. One scan, no
    * allocation; the incremental hash over [start,i) equals
    * `text.substring(start, i).hashCode` by the JLS definition. */
  def logitFp(text: UTF8String, w: Array[Long], b0: Long): Long = {
    val s = text.toString
    var z = b0
    var h = 0
    var inTok = false
    val n = s.length
    var i = 0
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if (c != ' ') { h = h * 31 + c; inTok = true }
      else if (inTok) {
        z += w(java.lang.Math.floorMod(h, w.length))
        h = 0; inTok = false
      }
      i += 1
    }
    z
  }

  /** `floor(sigmoid(z) * Scale)` — a pure function of the Long logit, so
    * it is deterministic even though it routes through doubles. */
  def probFp(zFp: Long): Long = {
    val z = zFp.toDouble / Scale
    val p = 1.0 / (1.0 + math.exp(-z))
    math.floor(p * Scale).toLong
  }

  /** Bucket ids of every token of `text`, in order — the pre-tokenized
    * form the driver-local GD loop iterates over (tokenize once, not once
    * per iteration; bit-identical sums either way). */
  def bucketIds(text: UTF8String, nBuckets: Int): Array[Int] = {
    val s = text.toString
    val out = new java.util.ArrayList[Integer](16)
    var h = 0
    var inTok = false
    val n = s.length
    var i = 0
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if (c != ' ') { h = h * 31 + c; inTok = true }
      else if (inTok) {
        out.add(java.lang.Math.floorMod(h, nBuckets))
        h = 0; inTok = false
      }
      i += 1
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    arr
  }

  /** Adds `coeff` (= pFp - y*Scale) into `grad` once per token occurrence
    * — equivalent to `grad[b] += coeff * count[b]` without materializing
    * counts. Slot `grad.length - 1` is the intercept. */
  def addGrad(text: UTF8String, coeff: Long, grad: Array[Long]): Unit = {
    val s = text.toString
    val nb = grad.length - 1
    var h = 0
    var inTok = false
    val n = s.length
    var i = 0
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if (c != ' ') { h = h * 31 + c; inTok = true }
      else if (inTok) {
        grad(java.lang.Math.floorMod(h, nb)) += coeff
        h = 0; inTok = false
      }
      i += 1
    }
    grad(nb) += coeff
  }
}

/** Fixed-point logit of `child` under broadcast-by-closure weights. The
  * LONG logit (not the probability) is the expression output so downstream
  * thresholds stay in exact integers: `pred = logit >= 0` IS `p >= 0.5`.
  * Codegen'd — one static call per row keeps curation scans in
  * whole-stage codegen. Null text scores the intercept alone (an empty
  * document still gets a prediction, matching an empty token stream). */
case class LrLogitExpr(child: Expression, weights: Array[Long], intercept: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lr_logit"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) intercept
    else LrKernel.logitFp(v.asInstanceOf[UTF8String], weights, intercept)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lrWeights", weights, "long[]")
    val childGen = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = ${childGen.isNull}
        ? ${intercept}L
        : graft.functions.LrKernel.logitFp(${childGen.value}, $wRef, ${intercept}L);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object LrExprs {
  def logit(text: Column, weights: Array[Long], intercept: Long): Column = {
    require(weights.nonEmpty, "lr_logit needs a non-empty weight vector")
    Bridge.column(LrLogitExpr(Bridge.expression(text), weights, intercept))
  }
}
