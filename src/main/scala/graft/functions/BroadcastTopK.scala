package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Immutable broadcast-side corpus for brute-force cosine top-k: quantized
  * vectors in one flat long array (dim-strided) plus per-vector ids and
  * precomputed norms. Built once on the driver, shipped to executors as a
  * Spark broadcast — the same memory contract as a broadcast hash join.
  */
final class TopKCorpus(
    val ids: Array[Long],
    val flat: Array[Long], // row-major, ids.length × dim
    val norms: Array[Double],
    val dim: Int)
    extends Serializable

/** Per-row brute-force cosine top-k against a broadcast corpus
  * (SURVEY §2 I3a). For each (query_id, quantized vector) input row this
  * evaluates ALL corpus dot products in one tight primitive loop and
  * returns the k best as `array<struct<score double, id bigint>>` (score
  * DESC, id ASC; self-pairs and zero-norm pairs excluded).
  *
  * Replaces the broadcast-nested-loop-join → project → object-hash-aggregate
  * pipeline: the join materializes |Q|×|C| wide rows and the typed aggregate
  * pays per-row boxing + hash-map lookups, ~10× the cost of the dot products
  * themselves. Scale shape is unchanged — queries stream, corpus broadcasts,
  * no shuffle; for corpus > executor memory use the LSH path instead.
  */
case class BroadcastTopKExpr(
    left: Expression, // query id (long)
    right: Expression, // quantized vector (array<long>)
    corpus: Broadcast[TopKCorpus],
    k: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "broadcast_topk"

  override def nullSafeEval(idAny: Any, vecAny: Any): Any = {
    val queryId = idAny.asInstanceOf[Long]
    val arr = vecAny.asInstanceOf[ArrayData]
    val c = corpus.value
    val dim = c.dim
    val qv = arr.toLongArray()
    if (qv.length != dim && c.ids.length > 0) {
      throw new IllegalArgumentException(
        s"query vector dim ${qv.length} != corpus dim $dim (query id $queryId)")
    }
    var qdot = 0L
    var i = 0
    while (i < dim) { qdot += qv(i) * qv(i); i += 1 }
    val qn = math.sqrt(qdot.toDouble)
    val buf = new TopKBuffer(k)
    if (qn > 0) {
      val n = c.ids.length
      var j = 0
      while (j < n) {
        if (c.ids(j) != queryId && c.norms(j) > 0) {
          var dot = 0L
          val base = j * dim
          i = 0
          while (i < dim) { dot += qv(i) * c.flat(base + i); i += 1 }
          buf.add(dot.toDouble / (qn * c.norms(j)), c.ids(j))
        }
        j += 1
      }
    }
    new GenericArrayData(buf.sortedBestFirst().map { case (s, id) =>
      InternalRow(s, id): Any
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The `nProbe` nearest IVF cells (by cosine, ties to the lower index) of a
  * float/double vector against a small centroid table (SURVEY §2 I3c).
  * Centroids ride along in the serialized expression — nList × dim doubles,
  * a few KB; the corpus itself never leaves the executors. */
case class NearestCellsExpr(
    child: Expression,
    centroids: Array[Array[Double]],
    nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))
  @transient private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      xs(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    new GenericArrayData(NearestCells.pick(xs, centroids, norms, nProbe))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The probe-selection arithmetic of [[NearestCellsExpr]], shared with the
  * streaming IVF kernel ([[IvfBroadcastTopKExpr]]) so the two tiers can
  * never drift: cosine scores in double space, nProbe picks best-first,
  * ties to the lower index; zero-norm sides score -inf. */
private[functions] object NearestCells {
  def pick(xs: Array[Double], centroids: Array[Array[Double]],
      norms: Array[Double], nProbe: Int): Array[Int] = {
    val n = xs.length
    var vn = 0.0
    var i = 0
    while (i < n) { vn += xs(i) * xs(i); i += 1 }
    vn = math.sqrt(vn)
    val m = centroids.length
    val scores = new Array[Double](m)
    var c = 0
    while (c < m) {
      val cent = centroids(c)
      // fail loud on a ragged vector — BroadcastTopKExpr does, and the two
      // ANN paths must agree on malformed input instead of this one
      // silently truncating the dot product
      if (n != cent.length) {
        throw new IllegalArgumentException(
          s"vector dim $n != centroid dim ${cent.length} (cell $c)")
      }
      var dot = 0.0
      i = 0
      while (i < n) { dot += xs(i) * cent(i); i += 1 }
      scores(c) = if (vn > 0 && norms(c) > 0) dot / (vn * norms(c))
        else Double.NegativeInfinity
      c += 1
    }
    val probes = math.min(nProbe, m)
    val picked = new Array[Int](probes)
    val used = new Array[Boolean](m)
    var p = 0
    while (p < probes) {
      var best = -1
      c = 0
      while (c < m) {
        if (!used(c) && (best < 0 || scores(c) > scores(best))) best = c
        c += 1
      }
      used(best) = true
      picked(p) = best
      p += 1
    }
    picked
  }
}

/** Cell-partitioned broadcast corpus for the STREAMING IVF serve tier:
  * quantized corpus rows sorted by coarse cell (flat, dim-strided) with
  * `cellStart` offsets (length nCells+1), plus the centroid table so the
  * query side picks its probes inside the same kernel. Built once on the
  * driver from the batch-assigned cells (the SAME executor kernel the
  * batch `ivfServe` uses — parity by construction). */
final class IvfCorpus(
    val cellStart: Array[Int],
    val ids: Array[Long],
    val flat: Array[Long], // row-major, ids.length × dim, cell-sorted
    val norms: Array[Double],
    val dim: Int,
    val centroids: Array[Array[Double]])
    extends Serializable {
  @transient lazy val centNorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))
}

/** Per-row IVF cosine top-k against a cell-partitioned broadcast corpus:
  * for each (query_id, RAW float/double vector) row, pick the nProbe
  * nearest centroids ([[NearestCells.pick]] — identical arithmetic to the
  * batch probe expression), quantize the query onto the shared 1e-6 grid,
  * and heap-scan ONLY the probed cells' row ranges. Latency per query is
  * ~nProbe/nList of the exact kernel's; recall is the probe set's, same
  * as batch [[graft.llm.Similarity.ivfServe]]. Output and tie conventions
  * match [[BroadcastTopKExpr]] (score DESC, id ASC; self/zero-norm pairs
  * excluded). */
case class IvfBroadcastTopKExpr(
    left: Expression, // query id (long)
    right: Expression, // RAW vector (array<float|double>)
    corpus: Broadcast[IvfCorpus],
    nProbe: Int,
    k: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "ivf_broadcast_topk"

  @transient private lazy val elemIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(idAny: Any, vecAny: Any): Any = {
    val queryId = idAny.asInstanceOf[Long]
    val arr = vecAny.asInstanceOf[ArrayData]
    val c = corpus.value
    val n = arr.numElements()
    if (n != c.dim && c.ids.length > 0) {
      throw new IllegalArgumentException(
        s"query vector dim $n != corpus dim ${c.dim} (query id $queryId)")
    }
    val xs = new Array[Double](n)
    val qv = new Array[Long](n)
    var qdot = 0L
    var i = 0
    while (i < n) {
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      xs(i) = x
      val q = math.floor(x * 1000000d).toLong // Similarity.quantize's grid
      qv(i) = q
      qdot += q * q
      i += 1
    }
    val qn = math.sqrt(qdot.toDouble)
    val buf = new TopKBuffer(k)
    if (qn > 0 && c.ids.length > 0) {
      val probes = NearestCells.pick(xs, c.centroids, c.centNorms, nProbe)
      var p = 0
      while (p < probes.length) {
        val cell = probes(p)
        var j = c.cellStart(cell)
        val end = c.cellStart(cell + 1)
        while (j < end) {
          if (c.ids(j) != queryId && c.norms(j) > 0) {
            var dot = 0L
            val base = j * c.dim
            i = 0
            while (i < c.dim) { dot += qv(i) * c.flat(base + i); i += 1 }
            buf.add(dot.toDouble / (qn * c.norms(j)), c.ids(j))
          }
          j += 1
        }
        p += 1
      }
    }
    new GenericArrayData(buf.sortedBestFirst().map { case (s, id) =>
      InternalRow(s, id): Any
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
