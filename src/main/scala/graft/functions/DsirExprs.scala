package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DSIR importance-weight kernel (Xie et al. 2023, arXiv:2302.03169 —
  * Data Selection via Importance Resampling): per-document aggregate
  * likelihood under a TARGET vs a RAW hashed-unigram model, fused into one
  * codegen'd scan with the two count tables broadcast by closure (EXT row
  * I6 adjunct; no reference-repo counterpart).
  *
  * The token bucket is `int(md5(token)[0:8], 16) % nBuckets` — the SAME
  * content-hash the battery's split/sample operators use
  * ([[graft.llm.Sampling.hashBucket]]), so a DuckDB oracle reproduces
  * every bucket, count, and weight exactly. All sums are exact BIGINTs
  * (Laplace-smoothed counts), the same integer-ratio trick as
  * `TextAnalysis.lmScore`: the only floating-point is the final division,
  * identical in any IEEE-754 engine.
  */
object DsirKernel {

  /** (n_tokens, hits_target, hits_raw) for one document: hits_X =
    * Σ_tokens (count_X[bucket(tok)] + 1). Tokens are maximal non-space
    * runs (the battery's `split(text, ' +')` tokenization). */
  def hits(text: UTF8String, ct: Array[Long], cr: Array[Long]): InternalRow = {
    val s = text.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    var nTok = 0L
    var hitsT = 0L
    var hitsR = 0L
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if (c == ' ') {
        if (i > start) {
          val d = md.digest(s.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 8 hex digits = first 4 bytes, big-endian, unsigned
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          val b = (h % ct.length).toInt
          nTok += 1
          hitsT += ct(b) + 1
          hitsR += cr(b) + 1
          md.reset()
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, hitsT, hitsR))
  }
}

/** `struct(n_tokens bigint, hits_t bigint, hits_r bigint)` DSIR hit sums
  * of a text column against closure-broadcast unigram count tables. */
case class DsirHitsExpr(child: Expression, ct: Array[Long], cr: Array[Long])
    extends UnaryExpression {

  require(ct.length == cr.length && ct.nonEmpty,
    s"dsir_hits needs equal-length non-empty count tables: ${ct.length}/${cr.length}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("hits_t", LongType, nullable = false),
    StructField("hits_r", LongType, nullable = false)))
  override def prettyName: String = "dsir_hits"

  override def nullSafeEval(input: Any): Any =
    DsirKernel.hits(input.asInstanceOf[UTF8String], ct, cr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctRef = ctx.addReferenceObj("dsirCt", ct, "long[]")
    val crRef = ctx.addReferenceObj("dsirCr", cr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DsirKernel.hits($c, $ctRef, $crRef);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object DsirExprs {
  def hits(text: Column, ct: Array[Long], cr: Array[Long]): Column =
    Bridge.column(DsirHitsExpr(Bridge.expression(text), ct, cr))
}
