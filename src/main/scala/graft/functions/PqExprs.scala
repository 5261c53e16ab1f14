package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (SURVEY §2 I3e; after Jégou/Douze/Schmid,
  * "Product quantization for nearest neighbor search", TPAMI 2011 — public
  * literature, no reference-repo counterpart): a vector is chopped into
  * blocks, each block encoded as its nearest per-block centroid id, and
  * search scores candidates from their CODES via per-query lookup tables
  * (asymmetric distance computation) — the raw corpus vectors are never
  * touched at query time.
  *
  * All three kernels are one interpreted dispatch per ROW (CodegenFallback
  * like [[NearestCellsExpr]]), with tight primitive loops inside — the HOF
  * (`zip_with`/`aggregate`) formulation would pay one interpreted dispatch
  * per ELEMENT per pair on the scoring hot path.
  */
final class PqCodebooks(
    val blocks: Array[Array[Array[Double]]], // [block][code][blockDim]
    val blockSize: Int,
    val dim: Int)
    extends Serializable {
  val nBlocks: Int = blocks.length
  val nCodes: Int = if (nBlocks == 0) 0 else blocks.map(_.length).max
  /** Flattened squared-norm LUT of every centroid: [b * nCodes + c]. */
  val n2: Array[Double] = {
    val out = new Array[Double](nBlocks * nCodes)
    var b = 0
    while (b < nBlocks) {
      var c = 0
      while (c < blocks(b).length) {
        out(b * nCodes + c) = blocks(b)(c).map(x => x * x).sum
        c += 1
      }
      b += 1
    }
    out
  }
}

private[functions] object PqExprs {
  def toDoubles(arr: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      xs(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    xs
  }

  def requireDim(n: Int, books: PqCodebooks, what: String): Unit =
    if (n != books.dim) {
      throw new IllegalArgumentException(
        s"$what vector dim $n != codebook dim ${books.dim}")
    }
}

/** Encode a float/double vector as its per-block nearest-centroid ids
  * (Euclidean, ties to the lower code — the standard PQ assignment):
  * `array<int>` of length nBlocks. */
case class PqEncodeExpr(child: Expression, books: PqCodebooks)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  @transient private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val xs = PqExprs.toDoubles(input.asInstanceOf[ArrayData], elemIsFloat)
    PqExprs.requireDim(xs.length, books, prettyName)
    val codes = new Array[Int](books.nBlocks)
    var b = 0
    while (b < books.nBlocks) {
      val from = b * books.blockSize
      val cents = books.blocks(b)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < cent.length) {
          val diff = xs(from + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(b) = best
      b += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Broadcast-side PQ code table: per-vector ids plus their codes in one
  * flat nBlocks-strided BYTE array (nCodes ≤ 256 by construction) — truly
  * 16 bytes/vector at the default 16×256 setting, vs 256 for the raw
  * floats it stands in for. Zero-norm corpus vectors are excluded before
  * the table is built (they reconstruct to NONZERO centroids, so a norm
  * check on the reconstruction could not exclude them — the raw-norm
  * contract matches [[TopKCorpus]]/brute force). */
final class PqCodeTable(
    val ids: Array[Long],
    val codes: Array[Byte], // row-major, ids.length × nBlocks; read & 0xff
    val nBlocks: Int)
    extends Serializable

/** Per-row PQ top-k (ADC scan — the canonical PQ search loop): for each
  * (query_id, raw vector) row, build the query's lookup table of partial
  * dots against every centroid ONCE (O(dim·nCodes)), then score every
  * broadcast code row in O(nBlocks) lookups into a bounded heap. Mirrors
  * [[BroadcastTopKExpr]] (same output shape, self/degenerate exclusion,
  * score DESC / id ASC ties); the join formulation instead dragged the
  * 32 KB LUT array through every |Q|×|C| pair materialization — profiled
  * 10× slower than this kernel at sf0.1. */
case class PqTopKExpr(
    left: Expression, // query id (long)
    right: Expression, // raw vector (array<float|double>)
    table: org.apache.spark.broadcast.Broadcast[PqCodeTable],
    books: PqCodebooks,
    k: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pq_topk"
  @transient private lazy val elemIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(idAny: Any, vecAny: Any): Any = {
    val queryId = idAny.asInstanceOf[Long]
    val xs = PqExprs.toDoubles(vecAny.asInstanceOf[ArrayData], elemIsFloat)
    PqExprs.requireDim(xs.length, books, prettyName)
    val nb = books.nBlocks
    val nc = books.nCodes
    // per-query ADC lookup table of block-partial dots
    val lut = new Array[Double](nb * nc)
    var qn2 = 0.0
    var b = 0
    while (b < nb) {
      val from = b * books.blockSize
      val cents = books.blocks(b)
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var dot = 0.0
        var i = 0
        while (i < cent.length) { dot += xs(from + i) * cent(i); i += 1 }
        lut(b * nc + c) = dot
        c += 1
      }
      b += 1
    }
    var i = 0
    while (i < xs.length) { qn2 += xs(i) * xs(i); i += 1 }
    val qn = math.sqrt(qn2)
    val buf = new TopKBuffer(k)
    if (qn > 0) {
      val t = table.value
      val n = t.ids.length
      var j = 0
      while (j < n) {
        if (t.ids(j) != queryId) {
          val base = j * nb
          var dot = 0.0
          var rn2 = 0.0
          b = 0
          while (b < nb) {
            val idx = b * nc + (t.codes(base + b) & 0xff)
            dot += lut(idx)
            rn2 += books.n2(idx)
            b += 1
          }
          // rn2 == 0 only when every looked-up centroid is zero (possible
          // on degenerate codebooks); raw-zero-norm rows never reach the
          // table at all — see PqCodeTable
          if (rn2 > 0) buf.add(dot / (qn * math.sqrt(rn2)), t.ids(j))
        }
        j += 1
      }
    }
    new GenericArrayData(buf.sortedBestFirst().map { case (s, id) =>
      org.apache.spark.sql.catalyst.InternalRow(s, id): Any
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric-distance score of ONE (query vector, code row) pair — the
  * DISTRIBUTED dual of [[PqTopKExpr]]'s broadcast-table scan, for the
  * IVF-PQ composition where the corpus's codes live in an executor-side
  * COLUMN (never collected, never broadcast) and candidates arrive via the
  * coarse-cell join. Scoring is direct blockwise dots against the coded
  * centroids — O(dim) per row, not the LUT's O(nBlocks): with the cell
  * join bounding candidates per query, LUT amortization (one O(dim·nCodes)
  * table per query reused across a full corpus scan) no longer pays for
  * dragging a 32 KB array through the join. Same score convention as
  * [[PqTopKExpr]]: dot(q, recon) / (|q|·√Σ n2), NULL when either norm is
  * zero (degenerate rows never rank — brute-force parity). */
case class PqAdcExpr(
    left: Expression, // raw query vector (array<float|double>)
    right: Expression, // PQ codes (array<int>, length nBlocks)
    books: PqCodebooks)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"
  @transient private lazy val elemIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vecAny: Any, codesAny: Any): Any = {
    // reads the query vector straight off the ArrayData (round-15): this
    // expression runs once per candidate PAIR of the quadratic ADC join
    // stage, and the previous toDoubles copy allocated a dim-sized
    // double[] per pair — pure GC churn at scale (§4.2: keep the per-row
    // hot loop allocation-free). Element reads and arithmetic order are
    // unchanged, so scores stay bit-identical.
    val xs = vecAny.asInstanceOf[ArrayData]
    val n = xs.numElements()
    PqExprs.requireDim(n, books, prettyName)
    val isF = elemIsFloat
    val cs = codesAny.asInstanceOf[ArrayData]
    val nb = books.nBlocks
    require(cs.numElements() == nb,
      s"$prettyName: ${cs.numElements()} codes for $nb blocks")
    var qn2 = 0.0
    var i = 0
    while (i < n) {
      val v = if (isF) xs.getFloat(i).toDouble else xs.getDouble(i)
      qn2 += v * v
      i += 1
    }
    if (qn2 == 0) return null
    var dot = 0.0
    var rn2 = 0.0
    var b = 0
    while (b < nb) {
      val c = cs.getInt(b)
      val cent = books.blocks(b)(c)
      val from = b * books.blockSize
      var j = 0
      while (j < cent.length) {
        val v = if (isF) xs.getFloat(from + j).toDouble
          else xs.getDouble(from + j)
        dot += v * cent(j)
        j += 1
      }
      rn2 += books.n2(b * books.nCodes + c)
      b += 1
    }
    if (rn2 == 0) null else dot / (math.sqrt(qn2) * math.sqrt(rn2))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqOps {
  def pqEncode(vec: Column, books: PqCodebooks): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(vec), books))
  def pqAdc(vec: Column, codes: Column, books: PqCodebooks): Column =
    Bridge.column(PqAdcExpr(
      Bridge.expression(vec), Bridge.expression(codes), books))
  def pqTopK(id: Column, vec: Column,
      table: org.apache.spark.broadcast.Broadcast[PqCodeTable],
      books: PqCodebooks, k: Int): Column =
    Bridge.column(PqTopKExpr(
      Bridge.expression(id), Bridge.expression(vec), table, books, k))
}
