package graft.functions


/** Imperative per-document kernels for the text dedup/fingerprint hot path.
  *
  * Why not higher-order functions: Spark's array HOFs
  * (`transform`/`aggregate`/`zip_with`) are `CodegenFallback` — evaluated
  * interpreted, allocating per element. A MinHash signature via
  * `array_min(transform(...))` × 128 costs ~interpreter-dispatch ×
  * (shingles × hashes) per document; these kernels do the same math in one
  * tight JVM loop per document (measured ~10× on the bench corpus). Each
  * kernel is a pure deterministic function of its input string, so the
  * operators stay shuffle-free narrow projections and scale linearly.
  *
  * Hashing: FNV-1a 64 over UTF-8 bytes finalized with SplitMix64, and the
  * i-th MinHash permutation derives from the base hash with one SplitMix64
  * round per i — standard "hash once, permute cheaply" MinHash practice.
  */
object TextKernels {

  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L
  /** SplitMix64 golden-gamma increment. */
  final val Gamma = 0x9e3779b97f4a7c15L

  /** SplitMix64 finalizer — mixes all 64 bits of the state. */
  @inline def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over the UTF-8 bytes of `s[from, until)`, SplitMix64-mixed. */
  def hashRange(s: String, from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      // hash UTF-16 code units directly (both bytes) — cheaper than UTF-8
      // encoding and just as deterministic/uniform after the final mix
      h = (h ^ (c & 0xff)) * FnvPrime
      h = (h ^ (c >>> 8)) * FnvPrime
      i += 1
    }
    mix64(h)
  }

  def hashString(s: String): Long = hashRange(s, 0, s.length)

  /** Java-regex `\s` semantics exactly ([ \t\n\x0B\f\r]) — NOT
    * Character.isWhitespace, whose unicode extras would diverge from
    * `split("\\s+")` in TextStats and the engines' regex tokenizers.
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Token boundaries as (start, end) index pairs — no substring alloc. */
  private def tokenBounds(s: String): Array[Int] = {
    val bounds = new scala.collection.mutable.ArrayBuffer[Int](32)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) {
        bounds += i
        while (i < n && !isWs(s.charAt(i))) i += 1
        bounds += i
      }
    }
    bounds.toArray
  }

  /** Distinct hashed word-`n`-gram shingles, sorted ascending.
    *
    * Equivalent to hashing `TextStats.shingleSet(text, n)` element-wise:
    * the shingle string is the n tokens joined with a single space, and its
    * hash chains the FNV state across tokens with an explicit space so the
    * result equals `hashString("tok1 tok2 tok3")` without building it.
    */
  def shingleHashSet(text: String, n: Int): Array[Long] = {
    if (text == null) return null
    val b = tokenBounds(text)
    val nTok = b.length / 2
    if (nTok < n) return Array.emptyLongArray
    val out = new Array[Long](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      var h = FnvOffset
      var j = 0
      while (j < n) {
        if (j > 0) { h = (h ^ ' '.toInt) * FnvPrime; h = (h ^ 0) * FnvPrime }
        var p = b(2 * (i + j))
        val e = b(2 * (i + j) + 1)
        while (p < e) {
          val c = text.charAt(p)
          h = (h ^ (c & 0xff)) * FnvPrime
          h = (h ^ (c >>> 8)) * FnvPrime
          p += 1
        }
        j += 1
      }
      out(i) = mix64(h)
      i += 1
    }
    val distinct = out.distinct
    java.util.Arrays.sort(distinct)
    distinct
  }

  /** MinHash signature from a hashed shingle set: sig(i) = min over
    * shingles of mix64(h + (i+1)·Gamma). Null/empty set → null (too short
    * to compare).
    */
  def minhashSignature(hashes: Array[Long], k: Int): Array[Long] = {
    if (hashes == null || hashes.isEmpty) return null
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seed = (i + 1) * Gamma
      var min = Long.MaxValue
      var j = 0
      while (j < hashes.length) {
        val v = mix64(hashes(j) + seed)
        if (v < min) min = v
        j += 1
      }
      sig(i) = min
      i += 1
    }
    sig
  }

  /** LSH band hashes of a MinHash signature: band b's hash mixes rows
    * [b·r, (b+1)·r). One kernel pass (the HOF form —
    * `transform(sequence, b => xxhash64(slice(sig, ...)))` — is
    * interpreted per band).
    */
  def bandHashes(sig: Array[Long], bands: Int, rowsPerBand: Int): Array[Long] = {
    // SQL callers can pass sigs shorter than bands·rowsPerBand; null beats
    // a per-row ArrayIndexOutOfBounds (the expression is nullable)
    if (sig == null || sig.length < bands * rowsPerBand) return null
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = FnvOffset ^ b
      var r = 0
      while (r < rowsPerBand) {
        h = mix64(h ^ sig(b * rowsPerBand + r)) * FnvPrime
        r += 1
      }
      out(b) = mix64(h)
      b += 1
    }
    out
  }

  /** 64-bit SimHash over the whitespace-token multiset. Null for null text
    * AND for zero-token (empty/whitespace-only) text: a shared constant
    * signature for all empty docs would put them in one LSH bucket and pair
    * them all — an O(n²) hot key on any corpus with many blank/boilerplate
    * documents (MinHash already nulls empty shingle sets for the same
    * reason).
    */
  def simhash64(text: String): java.lang.Long = {
    if (text == null) return null
    val b = tokenBounds(text)
    if (b.length == 0) return null
    val sums = new Array[Int](64)
    var t = 0
    while (t < b.length) {
      val h = hashRange(text, b(t), b(t + 1))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      t += 2
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Order-sensitive rolling fingerprint: chain-mix token hashes. */
  def rollingFingerprint(text: String): java.lang.Long = {
    if (text == null) return null
    val b = tokenBounds(text)
    var acc = FnvOffset
    var t = 0
    while (t < b.length) {
      acc = mix64(acc ^ hashRange(text, b(t), b(t + 1)))
      t += 2
    }
    acc
  }

  /** Order-insensitive content fingerprint: min hashed shingle (0 for
    * too-short docs).
    */
  def contentFingerprint(text: String, n: Int): Long = {
    val hs = shingleHashSet(text, n)
    if (hs == null || hs.isEmpty) 0L else hs(0) // sorted → head is min
  }

  /** Exact Jaccard of two sorted long arrays (merge intersect). */
  def jaccardSorted(a: Array[Long], b: Array[Long]): java.lang.Double = {
    if (a == null || b == null) return null
    if (a.isEmpty && b.isEmpty) return null
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    // half-up to match SQL round() on both engines (rint is half-even)
    math.floor(inter.toDouble / union * 1e6 + 0.5) / 1e6
  }

  // --- Catalyst adapters (UTF8String / ArrayData in, no boxing) ----------
  // Called from generated code (see `expressions`): keep signatures stable.

  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  def shingleHashSetArray(s: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(shingleHashSet(s.toString, n))

  def minhashSignatureArray(hashes: ArrayData, k: Int): ArrayData =
    if (hashes.numElements() == 0) null
    else UnsafeArrayData.fromPrimitiveArray(minhashSignature(hashes.toLongArray(), k))

  def bandHashesArray(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = bandHashes(sig.toLongArray(), bands, rowsPerBand)
    if (out == null) null else UnsafeArrayData.fromPrimitiveArray(out)
  }

  def simhash64U(s: UTF8String): java.lang.Long = simhash64(s.toString)

  def rollingFingerprintU(s: UTF8String): Long = rollingFingerprint(s.toString).longValue()

  def contentFingerprintU(s: UTF8String, n: Int): Long = contentFingerprint(s.toString, n)

  def jaccardSortedArrays(a: ArrayData, b: ArrayData): java.lang.Double =
    jaccardSorted(a.toLongArray(), b.toLongArray())
}
