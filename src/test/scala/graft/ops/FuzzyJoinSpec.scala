package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistanceJoin: two deletions found via surviving-segment blocking") {
    val right = Seq((1L, "abcdefghijkl"), (2L, "zzzzzzzzzzzz")).toDF("id", "s")
    val left = Seq((10L, "abdefghijl")).toDF("id", "s") // dropped 'c' and 'k'
    val out = FuzzyJoin.editDistanceJoin(left, "id", "s", right, "id", "s",
      maxDist = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 1L, 2L)))
  }

  test("randomized: blocked join ≡ all-pairs levenshtein on 20 seeded string sets") {
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // PassJoin segments are complete from length k+1 = 3, so lengths
      // span 3..16; a 3-letter alphabet forces both real matches and
      // near-misses
      def str() = (0 until 3 + rnd.nextInt(14)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val ls = (1L to 15L).map(i => (i, str()))
      val rs = (101L to 115L).map(i => (i, str()))
      val out = FuzzyJoin.editDistanceJoin(
        ls.toDF("id", "s"), "id", "s", rs.toDF("id", "s"), "id", "s",
        maxDist = 2)
        .as[(Long, Long, Long)].collect().toSet
      val expected = (for {
        (li, lsr) <- ls; (ri, rsr) <- rs
        d = lev(lsr, rsr) if d <= 2
      } yield (li, ri, d.toLong)).toSet
      assert(out == expected, s"seed $seed: engine $out vs naive $expected")
    }
  }

  test("null ids and null strings are excluded; maxDist 0 is exact equality") {
    val l = Seq((java.lang.Long.valueOf(1L), "abcdefghijkl"),
      (null.asInstanceOf[java.lang.Long], "abcdefghijkl"),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[String])).toDF("id", "s")
    val r = Seq((9L, "abcdefghijkl")).toDF("id", "s")
    val out = FuzzyJoin.editDistanceJoin(l, "id", "s", r, "id", "s",
      maxDist = 0)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 9L, 0L)))
  }
}
