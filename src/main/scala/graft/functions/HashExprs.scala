package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Sketch kernels as single Catalyst expressions (SURVEY §4.2).
  *
  * The higher-order-function formulation (`transform`/`aggregate` lambdas)
  * evaluates one Catalyst dispatch per (hash index × element): ~19k
  * interpreted steps per row for k=64 × 300 shingles. These expressions run
  * the whole kernel as one tight JVM loop per row — the xxhash64 matches
  * Spark's builtin (XXH64, seed 42). `CodegenFallback` breaks whole-stage
  * codegen only for the projection computing the sketch; the loop itself is
  * compiled JVM code, which is what matters at 100 TB.
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    // one xxhash per shingle, folded to [0, P)
    val hmods = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUTF8String(s, 42L)
      hmods(i) = ((h % P) + P) % P
      i += 1
    }
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = 2L * j + 1
      val b = ((j * 2654435761L) % P + P) % P
      var mn = Long.MaxValue
      var t = 0
      while (t < n) {
        val v = (a * hmods(t) + b) % P
        if (v < mn) mn = v
        t += 1
      }
      sig(j) = mn
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[MinHashSigExpr]] with an md5-derived base hash — the DERANDOMIZED
  * family for full-oracle rows: `H(s)` is the first 4 bytes of md5(s)
  * (big-endian, = the digest's first 8 hex chars) folded mod P, exactly
  * what DuckDB recomputes via the hexVal ASCII fold. Same affine family
  * `(a_j·H + b_j) mod P` on top. ~10× the per-shingle cost of xxhash64 —
  * the xx64 expression stays the production default; this one buys
  * bit-for-bit cross-engine signatures (the d08_hll_registers playbook). */
case class Md5MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val hmods = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 4 bytes big-endian = first 8 hex chars, in [0, 2^32)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      hmods(i) = h % P
      i += 1
    }
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = 2L * j + 1
      val b = (j * 2654435761L) % P
      var mn = Long.MaxValue
      var t = 0
      while (t < n) {
        val v = (a * hmods(t) + b) % P
        if (v < mn) mn = v
        t += 1
      }
      sig(j) = mn
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[Md5MinHashSigExpr]] fused with the char-shingler: computes the k-int
  * signature STRAIGHT from the text, never materializing the shingle
  * array (`charShingles` built one UTF8String per position, then
  * `array_distinct` re-hashed and re-compared them all, then the sig
  * kernel walked the array again). One pass over the text's bytes:
  * char→byte offsets once, each n-char window deduped exactly via an
  * xx64-keyed open-addressing table with byte-compare verification (a
  * false "duplicate" is impossible — equal bytes are compared — and
  * duplicates can't change a min-fold anyway, so the table is purely a
  * work-saver on bounded-vocabulary corpora where distinct ≪ occurrences),
  * and md5 runs once per DISTINCT shingle with no per-shingle byte[]
  * input allocation (`MessageDigest.update(bytes, off, len)` on the
  * text's own buffer, digest into a reused 16-byte scratch).
  *
  * Bit-parity contract: result ≡ `Md5MinHashSigExpr(charShingles(text, n),
  * k)` for every NON-NULL input — same empty-array result below n chars,
  * same affine fold `(a_j·H + b_j) mod P` — pinned by the golden-parity
  * spec (HashExprsSpec) over random multibyte strings. On a null text the
  * composed form yields an empty array (charShingles' `when` falls through
  * to `otherwise` on a null condition) while this expression propagates
  * null, the standard Catalyst contract; every call site filters
  * `length(text) >= n` upstream, which drops nulls before either form. */
case class Md5MinHashFromTextExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle length must be >= 1: $n")
  require(k >= 1, s"signature size must be >= 1: $k")

  private val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_text"

  // the affine family's per-component constants, computed once per instance
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(k)(j => (j * 2654435761L) % P)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val numChars = text.numChars()
    if (numChars < n) return new GenericArrayData(Array.empty[Long])
    val bytes = text.getBytes
    // char-start byte offsets (one linear pass; ASCII keeps offs(i) = i)
    val offs = new Array[Int](numChars + 1)
    var bi = 0
    var ci = 0
    while (ci < numChars) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(numChars) = bytes.length
    val nSh = numChars - n + 1
    // open-addressing dedup table: slot -> shingle position, keyed by
    // xx64 of the byte slice, verified by exact byte compare
    var cap = java.lang.Integer.highestOneBit(nSh * 2 - 1) << 1
    if (cap < 8) cap = 8
    val mask = cap - 1
    val slots = new Array[Int](cap)
    java.util.Arrays.fill(slots, -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val bsl = bs
    var p = 0
    while (p < nSh) {
      val off = offs(p)
      val len = offs(p + n) - off
      val h64 = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off, len, 42L)
      var slot = (h64 ^ (h64 >>> 32)).toInt & mask
      var dup = false
      var filled = slots(slot)
      while (filled >= 0 && !dup) {
        // candidate match: verify byte-for-byte (lengths may differ for
        // multibyte text even at equal char count)
        val fOff = offs(filled)
        val fLen = offs(filled + n) - fOff
        if (fLen == len) {
          var q = 0
          while (q < len && bytes(fOff + q) == bytes(off + q)) q += 1
          dup = q == len
        }
        if (!dup) { slot = (slot + 1) & mask; filled = slots(slot) }
      }
      if (!dup) {
        slots(slot) = p
        md.reset()
        md.update(bytes, off, len)
        md.digest(dig, 0, 16)
        // first 4 bytes big-endian = first 8 hex chars, in [0, 2^32)
        val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        val hm = h % P
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1) * hm + bsl(j)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      p += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[SimHash64Expr]] with md5-derived token hashes (derandomized, oracle-
  * recomputable): token hash = the digest's first 16 hex chars as two
  * unsigned 32-bit halves `hi`/`lo` (bit b of the fingerprint votes on
  * `lo` for b < 32, `hi` otherwise — the split DuckDB mirrors without
  * signed-shift ambiguity). */
case class Md5SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((lo >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        if (((hi >>> b) & 1L) == 1L) votes(b + 32) += 1 else votes(b + 32) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per-bit ±1 votes from xxhash64(token),
  * packed to a long — one loop per row. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUTF8String(s, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `nPlanes` random-hyperplane sign bits of one LSH table in a single
  * pass over the vector, packed into a long. Plane weights are
  * `(murmur3(table, plane, i) % 10007) / 10007.0` — bit-identical to the
  * `hash()`-based higher-order-function formulation it replaces, which
  * built a (planes × elements) interpreted-lambda tree per TABLE: ~2k
  * Catalyst dispatches per row plus a plan so large that ANALYSIS time
  * dominated the query at small scale.
  */
case class HyperplaneLshExpr(child: Expression, nPlanes: Int, table: Int)
    extends UnaryExpression with CodegenFallback {
  require(nPlanes >= 1 && nPlanes <= 64, s"nPlanes must be in [1, 64]: $nPlanes")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_lsh"

  @transient private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == org.apache.spark.sql.types.FloatType

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      xs(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val hTable = hashInt(table, 42)
    var bits = 0L
    var j = 0
    while (j < nPlanes) {
      val hPlane = hashInt(j, hTable)
      var dot = 0.0
      i = 0
      while (i < n) {
        val w = (hashInt(i, hPlane).toLong % 10007L).toDouble / 10007.0
        dot += xs(i) * w
        i += 1
      }
      if (dot >= 0) bits |= 1L << j
      j += 1
    }
    bits
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[HyperplaneLshExpr]] with an md5-derived plane family — the
  * derandomization that makes LSH buckets a pure function of public
  * arithmetic both engines implement (the `Md5MinHashSigExpr` playbook):
  * plane weight `w(table, plane, i)` is the first 32 md5 bits of
  * `"lsh:table:plane:i"` mapped onto `[-10005, 10005]` via `% 20011`, the
  * vector rides the exact 1e-6 integer grid (`floor(x·10^6)`, matching
  * `Similarity.quantize`), and the sign bit is an exact integer-dot
  * comparison — DuckDB reproduces every bucket bit-for-bit. Weights depend
  * only on (table, plane, index), so the matrix is computed once per
  * executor and cached; |dot| ≤ dim·2^24·10005 < 2^52, no overflow. */
case class Md5HyperplaneLshExpr(child: Expression, nPlanes: Int, table: Int)
    extends UnaryExpression with CodegenFallback {
  require(nPlanes >= 1 && nPlanes <= 64, s"nPlanes must be in [1, 64]: $nPlanes")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hyperplane_lsh"

  @transient private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == org.apache.spark.sql.types.FloatType

  // volatile + double-checked locking: expression instances can be shared
  // across tasks/threads in one plan, and an unsynchronized lazy write could
  // publish a partially-written matrix to a racing reader. The volatile
  // store happens-after the array contents are fully written, so readers
  // see either null (and build under the lock) or a complete matrix.
  @transient @volatile private var planes: Array[Array[Long]] = null // [plane][i]

  private def weights(n: Int): Array[Array[Long]] = {
    val p = planes
    if (p != null && p(0).length >= n) return p
    this.synchronized {
      val p2 = planes
      if (p2 != null && p2(0).length >= n) return p2
      val md = java.security.MessageDigest.getInstance("MD5")
      val built = Array.tabulate(nPlanes) { j =>
        Array.tabulate(n) { i =>
          md.reset()
          val d = md.digest(s"lsh:$table:$j:$i".getBytes)
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          h % 20011L - 10005L
        }
      }
      planes = built
      built
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ws = weights(n)
    var bits = 0L
    var j = 0
    while (j < nPlanes) {
      val wj = ws(j)
      var dot = 0L
      var i = 0
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += math.floor(x * 1000000d).toLong * wj(i)
        i += 1
      }
      if (dot >= 0L) bits |= 1L << j
      j += 1
    }
    bits
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExprs {
  def minHashSig(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(shingles), k))

  def md5MinHashSig(shingles: Column, k: Int): Column =
    Bridge.column(Md5MinHashSigExpr(Bridge.expression(shingles), k))

  /** Fused `md5MinHashSig(charShingles(text, n), k)` — one expression,
    * no shingle-array materialization; bit-parity pinned by spec. */
  def md5MinHashSigText(text: Column, n: Int, k: Int): Column =
    Bridge.column(Md5MinHashFromTextExpr(Bridge.expression(text), n, k))

  def simHash64(tokens: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(tokens)))

  def md5SimHash64(tokens: Column): Column =
    Bridge.column(Md5SimHash64Expr(Bridge.expression(tokens)))

  def hyperplaneLsh(vec: Column, nPlanes: Int, table: Int): Column =
    Bridge.column(HyperplaneLshExpr(Bridge.expression(vec), nPlanes, table))

  def md5HyperplaneLsh(vec: Column, nPlanes: Int, table: Int): Column =
    Bridge.column(Md5HyperplaneLshExpr(Bridge.expression(vec), nPlanes, table))
}
