package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) multidimensional clustering (SURVEY §2 D1-EXT) —
  * the layout primitive behind Delta/Iceberg `ZORDER BY`: interleave the
  * bits of two dimension keys so that sorting by the single interleaved
  * key co-locates rows that are close in BOTH dimensions. A corpus laid
  * out this way gives every file/row-group a narrow min/max band on BOTH
  * raw columns, so parquet statistics prune selective predicates on
  * EITHER — where a linear sort serves only its leading column (the
  * round-9 one-dimensional layout pin in SourceFormatsSpec).
  *
  * The interleave is plain integer bit arithmetic built ENTIRELY from
  * built-in column functions — it stays inside whole-stage codegen (no
  * UDF, no CodegenFallback kernel) and has an exact DuckDB-parallel SQL
  * form ([[zvalueSql]]) so z-keys are cross-engine oracle-checkable.
  *
  * Dimensions must first be min-max normalized onto the full `bits`-wide
  * range ([[normalizeSql]] / the `(x-lo)*(2^bits-1) div (hi-lo)` idiom):
  * interleaving raw values whose effective widths differ wastes the high
  * bits of the narrow dimension — its top interleaved bits are
  * constant-zero and the curve degenerates toward a linear sort on the
  * wide dimension (the classic z-order pitfall).
  *
  * Reference analogue: none (the reference has no storage layout
  * surface); this extends the D1 source/layout tier.
  */
object ZOrder {

  /** Morton interleave of two normalized dimensions: bit `i` of `x` lands
    * at position `2i`, bit `i` of `y` at `2i+1` (y is the high dimension).
    * Inputs MUST be non-negative and `< 2^bits` — out-of-range bits are
    * silently dropped by the masks, aliasing distant rows into one cell,
    * so normalize first. Result is a non-negative long `< 2^(2·bits)`. */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    // (v & (1<<i)) << i moves bit i to 2i; << (i+1) moves it to 2i+1
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(xl.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(yl.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** The exact SQL mirror of [[zvalue]] over column-reference snippets —
    * structurally the same mask/shift/or terms, so DuckDB computes the
    * identical long. Pass simple column NAMES (alias complex expressions
    * in a CTE first — the snippet is repeated per bit). */
  def zvalueSql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    (0 until bits).flatMap { i =>
      Seq(s"((($x) & ${1L << i}) << $i)", s"((($y) & ${1L << i}) << ${i + 1})")
    }.mkString("(", " | ", ")")
  }

  /** SQL for min-max normalization onto `[0, 2^bits)`: integer-exact in
    * both engines (`div` / `//` floor-divide on BIGINT; the product stays
    * far under 2^63 for any 32-bit dimension span — a wider span wraps
    * negative and silently aliases distant rows into one cell, which is
    * why [[cluster]] `require`s the span bound at runtime; this SQL
    * builder has no values to check, so callers with >32-bit dimensions
    * must pre-scale, e.g. bucket timestamps to minutes/days). Constant
    * dimensions normalize to 0. The Spark side is the same formula via
    * `expr` with `div`. */
  def normalizeSql(x: String, lo: String, hi: String, bits: Int = 16): String =
    s"((($x) - ($lo)) * ${(1L << bits) - 1}) // GREATEST(($hi) - ($lo), 1)"

  /** Lay `df` out on the z-curve of `(xCol, yCol)`: normalize both
    * dimensions (bounds from one driver-side 4-value aggregate — bounded
    * collect, the same budget class as a broadcast threshold), range-
    * partition into `numFiles` contiguous z-slices and sort within each —
    * every output file then covers one rectangle-ish cell of the
    * (x, y) grid. Write the result with plain `.write.parquet`; both
    * dimension columns carry narrow per-file min/max stats. */
  def cluster(
      df: DataFrame, numFiles: Int,
      xCol: Column, yCol: Column, bits: Int = 16): DataFrame = {
    val bounds = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .agg(min("x"), max("x"), min("y"), max("y"))
      .collect()(0)
    require(!bounds.anyNull, "cluster: empty input or null dimension values")
    val (x0, x1, y0, y1) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2), bounds.getLong(3))
    val m = (1L << bits) - 1
    // overflow guard the normalization formula depends on: (x-lo)*m must
    // stay under 2^63 or the product wraps negative and the masks silently
    // alias distant rows into one cell (the doc'd failure mode — enforced,
    // not just documented). For bits ≤ 31 this admits any span < 2^32.
    // span is computed with subtractExact: for mixed-sign extremes hi - lo
    // itself wraps negative in Long arithmetic and a plain `hi - lo <= max`
    // check would silently pass the exact overflow it exists to reject
    def checkSpan(name: String, lo: Long, hi: Long): Unit = {
      val span =
        try Math.subtractExact(hi, lo)
        catch { case _: ArithmeticException => Long.MaxValue }
      require(span <= Long.MaxValue / m,
        s"cluster: $name span (up to $span) overflows the normalization " +
          s"product at bits=$bits (max ${Long.MaxValue / m}); pre-scale " +
          "the dimension (e.g. bucket to days/epochs) before z-ordering")
    }
    checkSpan("x", x0, x1)
    checkSpan("y", y0, y1)
    val tagged = df
      .withColumn("__zx", xCol.cast("long"))
      .withColumn("__zy", yCol.cast("long"))
      .withColumn("__z", zvalue(
        expr(s"((__zx - ${x0}L) * ${m}L) div ${math.max(x1 - x0, 1)}L"),
        expr(s"((__zy - ${y0}L) * ${m}L) div ${math.max(y1 - y0, 1)}L"),
        bits))
    tagged.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__zx", "__zy", "__z")
  }
}
