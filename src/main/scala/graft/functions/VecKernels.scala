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
}
