package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM kernel tests (no Spark session needed). */
class TextKernelsSpec extends AnyFunSuite {

  test("shingleHashSet: count, distinctness, sortedness, equivalence to joined strings") {
    val hs = TextKernels.shingleHashSet("a b c d e", 3)
    assert(hs.length == 3)
    assert(hs.toSeq == hs.toSeq.sorted)
    // element-wise equals hashing the joined shingle strings
    val expected = Seq("a b c", "b c d", "c d e").map(TextKernels.hashString).sorted
    assert(hs.toSeq == expected)
    // whitespace runs / leading / trailing are normalized like the tokenizer
    assert(TextKernels.shingleHashSet("  a\tb  c d\ne ", 3).toSeq == expected)
  }

  test("shingleHashSet: short and null inputs") {
    assert(TextKernels.shingleHashSet("a b", 3).isEmpty)
    assert(TextKernels.shingleHashSet("", 3).isEmpty)
    assert(TextKernels.shingleHashSet(null, 3) == null)
  }

  test("shingleHashSet deduplicates repeats") {
    assert(TextKernels.shingleHashSet("x y x y x y", 2).length == 2)
  }

  test("minhashSignature: deterministic, supersets move minima only down") {
    val a = TextKernels.shingleHashSet("a b c d e f g h", 3)
    val sig1 = TextKernels.minhashSignature(a, 128)
    val sig2 = TextKernels.minhashSignature(a, 128)
    assert(sig1.toSeq == sig2.toSeq)
    val sup = TextKernels.shingleHashSet("a b c d e f g h i j", 3)
    val sigSup = TextKernels.minhashSignature(sup, 128)
    assert(sig1.indices.forall(i => sigSup(i) <= sig1(i)))
    assert(TextKernels.minhashSignature(Array.emptyLongArray, 8) == null)
    assert(TextKernels.minhashSignature(null, 8) == null)
  }

  test("minhash similarity estimates jaccard") {
    // two 80%-overlapping shingle sets: signature agreement ≈ jaccard
    val a = (0 until 100).map(i => s"tok$i").mkString(" ")
    val b = (20 until 120).map(i => s"tok$i").mkString(" ")
    val sa = TextKernels.minhashSignature(TextKernels.shingleHashSet(a, 1), 256)
    val sb = TextKernels.minhashSignature(TextKernels.shingleHashSet(b, 1), 256)
    val agree = sa.indices.count(i => sa(i) == sb(i)).toDouble / 256
    val trueJ = 80.0 / 120.0
    assert(math.abs(agree - trueJ) < 0.15, s"agree=$agree trueJ=$trueJ")
  }

  test("simhash64: identical text → identical sig; near text → small hamming; null safe") {
    val s1 = TextKernels.simhash64("the quick brown fox jumps over the lazy dog")
    val s2 = TextKernels.simhash64("the quick brown fox jumps over the lazy dog")
    val s3 = TextKernels.simhash64("the quick brown fox jumps over the lazy cat")
    val s4 = TextKernels.simhash64("completely unrelated astrophysics words here")
    assert(s1 == s2)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s1, s3) < ham(s1, s4))
    assert(TextKernels.simhash64(null) == null)
  }

  test("rollingFingerprint is order-sensitive; contentFingerprint(1) is order-insensitive") {
    val r1 = TextKernels.rollingFingerprint("a b c d")
    val r2 = TextKernels.rollingFingerprint("d c b a")
    assert(r1 != r2)
    assert(TextKernels.rollingFingerprint("a b c d") == r1)
    assert(TextKernels.contentFingerprint("a b c d", 1) == TextKernels.contentFingerprint("d c b a", 1))
    assert(TextKernels.contentFingerprint("", 3) == 0L)
  }

  test("bandHashes: deterministic, band-local (row change only touches its band)") {
    val sig = Array.tabulate(128)(i => i * 31L)
    val b1 = TextKernels.bandHashes(sig, 32, 4)
    val b2 = TextKernels.bandHashes(sig, 32, 4)
    assert(b1.toSeq == b2.toSeq && b1.length == 32)
    val sig2 = sig.clone(); sig2(5) += 1 // row 5 lives in band 1
    val b3 = TextKernels.bandHashes(sig2, 32, 4)
    assert(b3(1) != b1(1))
    assert(b3.indices.filterNot(_ == 1).forall(i => b3(i) == b1(i)))
  }

  test("unicode safety: CJK, emoji, surrogate pairs don't break kernels") {
    val cjk = "你好 世界 朋友 你好 世界"
    assert(TextKernels.shingleHashSet(cjk, 2).length == 3)
    assert(TextKernels.simhash64(cjk) == TextKernels.simhash64(cjk))
    val emoji = "a 🎉🎊 b 😀 c"
    assert(TextKernels.shingleHashSet(emoji, 2).nonEmpty)
    assert(TextKernels.rollingFingerprint(emoji) != TextKernels.rollingFingerprint("a b c"))
  }

  test("nfcNormalizeU: composes decomposed sequences, identity passthrough when already NFC") {
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = UTF8String.fromString("café nöel")
    val precomposed = UTF8String.fromString("café nöel")
    val got = TextKernels.nfcNormalizeU(decomposed)
    assert(got == precomposed)
    assert(got.numChars() == decomposed.numChars() - 2)
    // idempotent
    assert(TextKernels.nfcNormalizeU(got) == got)
    // already-normalized input returns the SAME instance — the
    // zero-allocation fast path real (overwhelmingly-NFC) corpora take
    val ascii = UTF8String.fromString("plain ascii text")
    assert(TextKernels.nfcNormalizeU(ascii) eq ascii)
    assert(TextKernels.nfcNormalizeU(precomposed) eq precomposed)
  }

  test("jaccardSorted: exact merge intersection") {
    val a = Array(1L, 3L, 5L, 7L)
    val b = Array(3L, 5L, 9L)
    // inter=2, union=5
    assert(TextKernels.jaccardSorted(a, b) == 0.4)
    assert(TextKernels.jaccardSorted(a, a) == 1.0)
    assert(TextKernels.jaccardSorted(a, Array.emptyLongArray) == 0.0)
    assert(TextKernels.jaccardSorted(null, b) == null)
  }
}
