package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Dense-vector kernels for embedding similarity. Same rationale as
  * [[TextKernels]]: the HOF formulation (`aggregate(zip_with(a, b, _*_),
  * ...)`) is interpreted per element; these loop in primitive doubles.
  * Accumulation is sequential left-to-right double precision — identical
  * to the HOF form and the DuckDB oracle, so results hash-match.
  */
object VecKernels {

  /** Dot product; element access dispatched on the array element width
    * (float embeddings vs double-cast arrays). Null when any consumed
    * element is null — matching the `aggregate(zip_with(...))` HOF form
    * (reading null slots as 0.0 would silently fabricate values).
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    // min of both lengths: UnsafeArrayData has NO bounds checks, so an
    // uneven pair would silently read adjacent memory
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  // --- random-hyperplane LSH kernel ----------------------------------------

  /** Deterministic pseudo-random hyperplane component for (plane, d):
    * SplitMix64 mapped to [−1, 1]. The SAME derivation
    * `Similarity.planeComponent` used when planes were literal arrays, so
    * signatures (and therefore every downstream candidate set) are
    * unchanged — the matrix just lives inside the kernel now instead of as
    * m·L·dim literal doubles bloating the plan (the literal form produced
    * plans Spark could not even print, with Janino method-size
    * codegen-fallback risk).
    */
  @inline private def planeComponent(plane: Int, d: Int): Double =
    java.lang.Math.floorMod(
      TextKernels.mix64(plane * TextKernels.Gamma + d), 2000001L).toDouble / 1000000.0 - 1.0

  /** (totalPlanes, dim) → row-major plane matrix; executors derive each
    * family once and reuse it across rows/tasks.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def planeMatrix(totalPlanes: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((totalPlanes, dim), { key =>
      val (p, d) = key
      val m = new Array[Double](p * d)
      var i = 0
      while (i < p) {
        var j = 0
        while (j < d) { m(i * d + j) = planeComponent(i, j); j += 1 }
        i += 1
      }
      m
    })

  /** All multi-table LSH bucket keys of one vector in one kernel pass:
    * for table t and plane p, bit p of table t's bucket is set when
    * `Σ_d vec[d]·plane[t·numPlanes+p][d] ≥ 0` (sequential double
    * accumulation — identical to [[dot]] against the literal plane array),
    * and the key is `bucket | (t << numPlanes)` so keys never collide
    * across tables. Consumes `min(dim, |vec|)` elements like [[dot]]; a
    * null element makes every predicate false (bit 0), matching the old
    * `when(dot ≥ 0, bit).otherwise(0)` null semantics.
    */
  def lshKeys(vec: ArrayData, vecFloat: Boolean, dim: Int,
      numPlanes: Int, numTables: Int): Array[Long] = {
    val out = new Array[Long](numTables)
    val n = math.min(vec.numElements(), dim)
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { if (vec.isNullAt(i)) hasNull = true; i += 1 }
    if (hasNull) {
      var t = 0
      while (t < numTables) { out(t) = t.toLong << numPlanes; t += 1 }
      return out
    }
    val v = new Array[Double](n)
    i = 0
    while (i < n) {
      v(i) = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val planes = planeMatrix(numTables * numPlanes, dim)
    var t = 0
    while (t < numTables) {
      var key = t.toLong << numPlanes
      var p = 0
      while (p < numPlanes) {
        val base = (t * numPlanes + p) * dim
        var s = 0.0
        var d = 0
        while (d < n) { s += v(d) * planes(base + d); d += 1 }
        if (s >= 0) key |= 1L << p
        p += 1
      }
      out(t) = key
      t += 1
    }
    out
  }

  def lshKeysArray(vec: ArrayData, vecFloat: Boolean, dim: Int,
      numPlanes: Int, numTables: Int): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      lshKeys(vec, vecFloat, dim, numPlanes, numTables))

  // --- int8 symmetric quantization -----------------------------------------

  /** Symmetric int8 quantization: scale = max|v|/127,
    * qᵢ = round(vᵢ/scale) clamped to [−127, 127] — 4× less memory per
    * float vector (the lever that turns a 100 TB embedding lake into
    * 25 TB), dequantize as qᵢ·scale with per-element error ≤ scale/2.
    * Rounding is half-away-from-zero, matching SQL `round()` on both
    * engines (Java's rint is half-even and would diverge on exact .5
    * quotients). Zero/empty vectors quantize to scale 0, all-zero codes.
    * Null elements are treated as 0 (consistent with a vector that was
    * never fully written — the alternative, nulling the whole code,
    * would silently drop rows from similarity search).
    */
  def quantizeInt8(vec: ArrayData, vecFloat: Boolean): (Double, Array[Byte]) = {
    val n = vec.numElements()
    val v = new Array[Double](n)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x =
        if (vec.isNullAt(i)) 0.0
        else if (vecFloat) vec.getFloat(i).toDouble
        else vec.getDouble(i)
      v(i) = x
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Byte](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        val x = v(i) / scale
        val r = if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)
        q(i) = math.max(-127.0, math.min(127.0, r)).toByte
        i += 1
      }
    }
    (scale, q)
  }

  /** Exact integer dot product of two int8 code arrays (the
    * compressed-domain inner product — scales multiply back outside, and
    * cancel entirely in cosine). Max |sum| = 127²·n, overflow-free in
    * int64 up to n ≈ 5.7e14 elements.
    */
  def dotInt8(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    s
  }

  def quantizeInt8Row(vec: ArrayData, vecFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val (scale, q) = quantizeInt8(vec, vecFloat)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale,
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(q)))
  }
}
