package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river delta"), // near dup of 1
    (4L, "completely different text about astrophysics and galactic rotation curves"),
    (5L, "short one"))
    .toDF("doc_id", "text")

  test("exactByContent keeps smallest id per identical text") {
    val ids = Dedup.exactByContent(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(ids == Seq(1L, 3L, 4L, 5L))
    // the projected (hash,id)-shuffle form selects the identical survivors
    val projected = Dedup.exactByContentProjected(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(projected == ids)
  }

  test("minhash near-dups finds exact pair (J=1.0) and near pair, never self/symmetric pairs") {
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(pairs.forall(p => p._1 < p._2))
    // (1,2): identical → jaccard 1.0 must be present
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    // (1,3) and (2,3): 13 tokens → 11 shingles, only the last differs →
    // 10 common, union 12 → J = 10/12 ≈ 0.833333
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 0.833333))
    // unrelated docs never pair
    assert(!pairs.exists(p => p._2 == 4L || p._2 == 5L))
  }

  test("minhash agrees with exact ngram jaccard above threshold") {
    val mh = Dedup.minhashNearDups(docs, "text", "doc_id", n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(mh == exact)
  }

  test("ngramJaccardPairs exact values") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(pairs == Seq((1L, 2L, 1.0), (1L, 3L, 0.833333), (2L, 3L, 0.833333)))
  }

  test("nearDupFilter: drops the larger-id member of each near-dup pair") {
    val kept = Dedup.nearDupFilter(docs, "text", "doc_id", n = 3, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSeq.sorted
    // pairs (1,2),(1,3),(2,3) at J>=0.8 → 2 and 3 dropped
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("nearDupClusters: transitive chains collapse to one min-id cluster; singletons keep their own id") {
    // 1–2 exact dups; 3 near-dups 1; no direct high-jaccard (2,3) pair is
    // needed for them to share a cluster — transitivity via 1
    val clusters = Dedup.nearDupClusters(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(4L) == 4L && clusters(5L) == 5L, "non-dups are singletons")
    assert(clusters.size == 5, "every document is labeled")
    // cluster-aware dedup keeps exactly one representative per cluster
    val keepers = Dedup.nearDupClusterKeepers(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(keepers == Seq(1L, 4L, 5L), keepers)
    // explicit 3-chain: a~b, b~c, a and c share nothing directly
    val chain = Seq(
      (10L, "aa bb cc dd ee ff gg hh"),
      (11L, "aa bb cc dd ee ff gg zz"),   // near 10
      (12L, "cc dd ee ff gg zz yy xx"))   // near 11, far from 10
    val chainClusters = Dedup.nearDupClusters(
        chain.toDF("doc_id", "text"), "text", "doc_id", n = 3, threshold = 0.3)
      .as[(Long, Long)].collect().toMap
    assert(chainClusters == Map(10L -> 10L, 11L -> 10L, 12L -> 10L),
      s"chain must collapse transitively: $chainClusters")
  }

  test("connectedComponents: 30 seeded random graphs match a local union-find") {
    val rnd = new scala.util.Random(11)
    (1 to 30).foreach { trial =>
      val nV = 2 + rnd.nextInt(12)
      val nE = rnd.nextInt(14)
      val edges = (0 until nE).map(_ => (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      // local ground truth: classic union-find with min-root normalization
      val parent = Array.tabulate(nV)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until nV).map(v => v.toLong -> find(v).toLong).toMap
      val vdf = (0 until nV).map(_.toLong).toDF("id")
      val edf = edges.toDF("a", "b")
      val got = Dedup.connectedComponents(vdf, "id", edf, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: graph $edges → $got, want $expected")
    }
  }

  test("winnowOverlapPairs: lifted paragraph detected across different contexts; rotation survives") {
    val lifted = (1 to 12).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $lifted delta epsilon zeta eta theta"),
      (2L, s"one two three four five $lifted six seven eight nine"),
      (3L, "entirely different words nothing shared here at all today"),
      // rotation of doc 3 (first token to the end) — the case the
      // whole-document rolling fingerprint misses
      (4L, "different words nothing shared here at all today entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowOverlapPairs(docs, "text", "doc_id", k = 4, w = 4, minShared = 1)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // the ≥ w+k-1 = 7-token shared run guarantees ≥1 common fingerprint
    assert(out.contains((1L, 2L)), s"lifted paragraph not detected: $out")
    assert(out.contains((3L, 4L)), s"rotated copy not detected: $out")
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L)), out.toString)
    // overlap fraction is bounded and the share count is positive
    assert(out((1L, 2L)) >= 1L)
  }

  test("ngramContainmentPairs: embedded document scores ~1 while its Jaccard fails the near-dup bar") {
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val wrapper = s"intro line with framing words here : $body : " +
      "closing boilerplate trailer sentence with extra words at the end"
    val docs = Seq(
      (1L, body), (2L, wrapper),
      (3L, "totally unrelated content about spectral graph partitioning today"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.8).collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out(0)
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    // body: 10 tokens → 8 shingles, ALL present in the wrapper
    assert(r.getAs[Long]("n_shared") == 8L && r.getAs[Long]("size_a") == 8L)
    assert(r.getAs[Double]("containment") == 1.0)
    // the same pair is INVISIBLE to the Jaccard detector at 0.8
    assert(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.8).count() == 0L,
      "Jaccard must miss the embedding — that gap is this op's reason to exist")
    // symmetric orientation: wrapper listed first still finds the pair
    val flipped = Seq((5L, wrapper), (9L, body), (3L, "other words entirely"))
      .toDF("doc_id", "text")
    val f = Dedup.ngramContainmentPairs(flipped, "text", "doc_id",
      n = 3, threshold = 0.8).collect()
    assert(f.length == 1 && f(0).getAs[Long]("id_a") == 5L &&
      f(0).getAs[Long]("id_b") == 9L, f.mkString(";"))
  }

  test("ngramContainmentPairs: corpus-wide boilerplate shingle trips the maxShingleDf fail-fast") {
    val boiler = "cookie consent banner text" // shared 4-token head → shared shingles
    val docs = (1L to 6L)
      .map(i => (i, s"$boiler unique tail $i alpha$i beta$i gamma$i delta$i"))
      .toDF("doc_id", "text")
    // the boilerplate head's shingles occur in all 6 documents: df=6 > cap
    val e = intercept[Exception] {
      Dedup.ngramContainmentPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.9, maxShingleDf = 5L).count()
    }
    assert(e.getMessage.contains("maxShingleDf"), e.getMessage)
    // a deliberate raise passes: same corpus, permissive cap, runs clean —
    // even a bare count() (the guard wraps the join key, pruning-proof)
    assert(Dedup.ngramContainmentPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.9, maxShingleDf = 6L).count() >= 0L)
  }

  test("ngramContainmentPairs dropOverDfShingles: boilerplate dropped and reported, clean pairs survive") {
    val boiler = "cookie consent banner text"
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val wrapper = s"intro line with framing words here : $body : " +
      "closing boilerplate trailer sentence with extra words at the end"
    // 6 docs share the boilerplate head (df=6 > cap) + one genuine
    // embedded pair whose shared shingles are all under the cap
    val docs = ((1L to 6L)
      .map(i => (i, s"$boiler unique tail $i alpha$i beta$i gamma$i delta$i")) ++
      Seq((10L, body), (11L, wrapper))).toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.8, maxShingleDf = 5L, dropOverDfShingles = true)
    // soft mode: the same corpus that trips the fail-fast (previous
    // test's shape) now RUNS, drops the boilerplate index rows, and
    // still finds the genuine pair exactly
    val rows = out.collect()
    assert(rows.length == 1, rows.mkString(";"))
    assert(rows(0).getAs[Long]("id_a") == 10L &&
      rows(0).getAs[Long]("id_b") == 11L &&
      rows(0).getAs[Double]("containment") == 1.0, rows.mkString(";"))
    // the dropped volume is REPORTED: the 6-doc common prefix "cookie
    // consent banner text unique tail" yields 4 over-cap trigram
    // shingles × 6 docs = 24 dropped index rows
    val metric = out.queryExecution.observedMetrics("ngram_containment_df_guard")
    assert(metric.getAs[Long]("n_dropped_shingle_rows") == 24L, metric.toString)
  }

  test("triangleStats: hand-built graph — dups, reversals, and self-loops canonicalized") {
    // triangle 1-2-3, pendant 3-4, separate pair 5-6; edge 1-2 repeated
    // reversed, self-loop 7-7 dropped
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 6L),
      (2L, 1L), (7L, 7L)).toDF("s", "d")
    val out = Dedup.triangleStats(edges, "s", "d")
      .as[(Long, Long, Long, Long, Double)].collect()
    // degrees: 1:2, 2:2, 3:3, 4:1, 5:1, 6:1 → wedges 1+1+3 = 5
    assert(out.toSeq == Seq((6L, 5L, 5L, 1L, 0.6)), out.toSeq.toString)
  }

  test("triangleStats: disjoint cliques count C(k,3) each; empty graph is a zero row") {
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(1L to 4L) ++ clique(10L to 12L)).toDF("s", "d")
    val out = Dedup.triangleStats(edges, "s", "d")
      .as[(Long, Long, Long, Long, Double)].head()
    // K4: 6 edges, 12 wedges, 4 triangles; K3: 3 edges, 3 wedges, 1
    assert(out == ((7L, 9L, 15L, 5L, 1.0)), out.toString)
    val empty = Seq.empty[(Long, Long)].toDF("s", "d")
    val zero = Dedup.triangleStats(empty, "s", "d")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(zero == ((0L, 0L, 0L, 0L, 0.0)), zero.toString)
  }

  test("triangleStats: 30 seeded random graphs match a local brute-force census") {
    val rnd = new scala.util.Random(23)
    (1 to 30).foreach { trial =>
      val nV = 3 + rnd.nextInt(10)
      val nE = rnd.nextInt(20)
      val raw = (0 until nE).map(_ => (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val canon = raw.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val es = canon.toSet
      val verts = canon.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val tri = (for {
        a <- verts; b <- verts if a < b && es((a, b))
        c <- verts if b < c && es((b, c)) && es((a, c))
      } yield 1).size.toLong
      val deg = canon.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map(_._2.size.toLong)
      val wedges = deg.map(d => d * (d - 1) / 2).sum
      val got = Dedup.triangleStats(raw.toDF("s", "d"), "s", "d")
        .as[(Long, Long, Long, Long, Double)].head()
      val wantCc = if (wedges == 0) 0.0
        else BigDecimal(tri * 3d / wedges).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == ((verts.size.toLong, canon.size.toLong, wedges, tri, wantCc)),
        s"trial $trial: $canon → $got, want tri=$tri wedges=$wedges")
    }
  }

  test("connectedComponents: deep chain (diameter > 20) converges through per-round lineage checkpoints") {
    // a path graph converges in O(diameter) min-label rounds, so 25
    // vertices force ~2 dozen rounds. The label plan DOUBLES per round
    // (it feeds both propagation and merge): without the per-round
    // localCheckpoint, planning measured 155 s/round by round 8 and OOMed
    // a 16g driver before round 12 — this spec dies on exactly that shape
    val n = 25
    val vdf = (0 until n).map(_.toLong).toDF("id")
    val edf = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val got = Dedup.connectedComponents(vdf, "id", edf, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == (0 until n).map(_.toLong -> 0L).toMap)
  }

  test("connectedComponents: every checkpoint cadence yields identical labels on a deep chain") {
    // cadence > 1 lets the label plan double between truncations; the
    // result must not depend on WHEN lineage is cut, and the final
    // returned frame must still be checkpoint-backed (non-cadence-aligned
    // convergence round forces one)
    val n = 17
    val vdf = (0 until n).map(_.toLong).toDF("id")
    val edf = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val expected = (0 until n).map(_.toLong -> 0L).toMap
    Seq(2, 4, 7).foreach { every =>
      val got = Dedup.connectedComponents(vdf, "id", edf, "a", "b",
        checkpointEvery = every)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"cadence $every diverged: $got")
    }
  }

  test("crossCorpusContamination: only cross-side pairs, overlapping id spaces safe") {
    // eval doc 1 duplicates train docs 1 and (nearly) 3 — note the eval id
    // COLLIDES with a train id, which the separate-column output must keep apart
    val train = docs.filter(col("doc_id") =!= 2L)
    val eval = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (9L, "totally unrelated evaluation prompt about cooking pasta al dente"))
      .toDF("doc_id", "text")
    val pairs = Dedup.crossCorpusContamination(
        train, "text", "doc_id", eval, "text", "doc_id", n = 3, threshold = 0.5)
      .select("train_id", "eval_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 1L), (3L, 1L)), pairs)
    assert(pairs.head._3 == 1.0) // exact duplicate across corpora
    // no train×train leakage: docs 1 and 3 are near-dups WITHIN train but
    // must not appear as a contamination pair
    assert(!pairs.map(p => (p._1, p._2)).contains((1L, 3L)))
  }

  test("simhash: identical docs at hamming 0; near dup within 3; distinct docs excluded") {
    val pairs = Dedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(pairs.forall(p => p._3 <= 3))
    assert(!pairs.exists(p => p._2 == 4L))
  }

  test("groupOverlap: identical corpora ≈ 1.0, disjoint ≈ 0.0, partial in between") {
    val grouped = Seq(
      ("s1", "alpha beta gamma delta epsilon zeta eta theta"),
      ("s1", "one two three four five six seven eight"),
      ("s2", "alpha beta gamma delta epsilon zeta eta theta"),   // = s1 doc1
      ("s2", "one two three four five six seven eight"),          // = s1 doc2
      ("s3", "totally different words nothing shared here at all"),
      ("s4", "alpha beta gamma delta epsilon zeta eta theta"))    // half of s1
      .toDF("source", "text")
    val est = Dedup.groupOverlap(grouped, "source", "text")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(est(("s1", "s2")) == 1.0, "identical corpora")
    assert(est(("s1", "s3")) < 0.1, "disjoint corpora")
    assert(est(("s1", "s4")) > 0.2 && est(("s1", "s4")) < 0.8, "J=0.5 ground truth")
  }

  test("dedupLinesWithinDoc: first occurrence kept in order, short lines exempt, null passes through") {
    val docs = Seq(
      (1L, Some("a line\nb line\na line\n\nb line\n\nc")),
      (2L, Some("")),
      (3L, None: Option[String]))
      .toDF("doc_id", "text")
    val got = Dedup.dedupLinesWithinDoc(docs, "text")
      .as[(Long, Option[String])].collect().toMap
    // dups of 'a line'/'b line' dropped; both empty lines kept (exempt);
    // order preserved
    assert(got(1L).contains("a line\nb line\n\n\nc"))
    assert(got(2L).contains(""))
    assert(got(3L).isEmpty)
    // exemption threshold: at minLineLen=2 the 1-char line 'c' repeats freely
    val rep = Seq((1L, "c\nxx\nc\nxx")).toDF("doc_id", "text")
    val trimmed = Dedup.dedupLinesWithinDoc(rep, "text", minLineLen = 2)
      .as[(Long, String)].collect().head._2
    assert(trimmed == "c\nxx\nc")
  }

  test("exactSubstringDedup: keep-first span cut, in-doc repeats, short/null passthrough") {
    val corpus = Seq(
      (Some(1L), Some("a b c d e f")),           // all its grams are firsts
      (Some(2L), Some("x y a b c d e f z")),     // mid-span copy of doc 1
      (Some(3L), Some("p q r s p q r s")),       // in-doc self repeat
      (Some(4L), Some("t  u v")),                // < n tokens: byte-exact passthrough
      (Some(5L), None: Option[String]),          // null text passthrough
      (None: Option[Long], Some("a b c d e f"))) // null id: exempt entirely
      .toDF("doc_id", "text")
    val got = Dedup.exactSubstringDedup(corpus, "text", "doc_id", n = 4)
      .select("doc_id", "text", "n_tokens_cut")
      .as[(Option[Long], Option[String], Long)].collect()
    val byId = got.flatMap(r => r._1.map(id => id -> (r._2, r._3))).toMap
    // doc 1 holds every first occurrence -> untouched
    assert(byId(1L) == (Some("a b c d e f"), 0L))
    // doc 2: grams at pos 2,3,4 are redundant -> tokens 2..7 cut
    assert(byId(2L) == (Some("x y z"), 6L))
    // doc 3: second "p q r s" (pos 4) redundant -> tokens 4..7 cut
    assert(byId(3L) == (Some("p q r s"), 4L))
    // short doc: original whitespace preserved byte-exact
    assert(byId(4L) == (Some("t  u v"), 0L))
    assert(byId(5L) == (None, 0L))
    // null-id row kept unchanged
    assert(got.exists(r => r._1.isEmpty && r._2.contains("a b c d e f") && r._3 == 0L))
  }

  test("dedupAgainstHistory: exact flags (no bloom false positives survive), null text never flagged") {
    val history = Seq("seen one", "seen two", "seen three").toDF("text")
    val incoming = Seq(
      (1L, Some("seen one")),       // exact dup
      (2L, Some("brand new doc")),  // new
      (3L, Some("seen three")),     // exact dup
      (4L, None: Option[String]))   // null text: never flagged
      .toDF("doc_id", "text")
    val got = Dedup.dedupAgainstHistory(history, "text", incoming, "text")
      .select("doc_id", "in_history").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    // a tiny, collision-prone bloom still yields exact output (verify join
    // strips the false positives the 64-bit sketch must produce)
    val tiny = Dedup.dedupAgainstHistory(history, "text", incoming, "text",
      expectedItems = 1L, fpp = 0.5)
      .select("doc_id", "in_history").as[(Long, Boolean)].collect().toMap
    assert(tiny == got, "false positives must not survive the exact verify")
  }

  test("dedupAgainstHistory: prebuilt broadcast sketch matches, and never rides the plan as a literal") {
    val history = Seq("seen one", "seen two", "seen three").toDF("text")
    val incoming = Seq(
      (1L, Some("seen one")), (2L, Some("brand new doc")),
      (3L, Some("seen three")), (4L, None: Option[String]))
      .toDF("doc_id", "text")
    // build ONCE (the per-snapshot form), reuse across two batches
    val sketch = Dedup.historyBloomSketch(history, "text")
    val flagged = Dedup.dedupAgainstHistory(sketch, history, "text", incoming, "text")
    val got = flagged.select("doc_id", "in_history")
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    val batch2 = Dedup.dedupAgainstHistory(sketch, history, "text",
        incoming.filter(col("doc_id") === 2L), "text")
      .select("doc_id", "in_history").as[(Long, Boolean)].collect().toMap
    assert(batch2 == Map(2L -> false))
    // the sketch must ship via broadcast, not as an embedded binary
    // Literal bloating every plan/explain/task closure
    val plan = flagged.queryExecution.analyzed.toString
    assert(plan.contains("graft_bloom_might_contain_bcast"), plan.take(2000))
    assert(!plan.contains("bloom_filter_might_contain"), plan.take(2000))
  }

  test("dedupAgainstHistory: empty/all-null history flags nothing (bootstrap batch, no NPE)") {
    val incoming = Seq((1L, "a doc"), (2L, "another")).toDF("doc_id", "text")
    Seq(
      Seq.empty[String].toDF("text"),             // empty history
      Seq(null: String).toDF("text"))             // all-null-text history
      .foreach { history =>
        // the Bloom aggregate returns a NULL sketch over zero rows — the
        // first incremental batch against an unpopulated snapshot must
        // degrade to "nothing seen", not crash every task
        assert(Dedup.historyBloomSketch(history, "text") == null)
        val got = Dedup.dedupAgainstHistory(history, "text", incoming, "text")
          .select("doc_id", "in_history").as[(Long, Boolean)].collect().toMap
        assert(got == Map(1L -> false, 2L -> false))
      }
  }

  test("exactNgramContamination: full, partial, zero hit fractions; short/null-id eval docs excluded") {
    val train = Seq("alpha beta gamma delta epsilon").toDF("text")
    val eval = Seq(
      (Some(1L), "alpha beta gamma delta epsilon"),  // all 3 trigrams in train
      (Some(2L), "alpha beta gamma nine ten"),       // 1 of 3
      (Some(3L), "one two three four"),              // 0 of 2
      (Some(4L), "too short"),                       // < 3 tokens: no grams
      (None: Option[Long], "alpha beta gamma"))      // null id: excluded
      .toDF("doc_id", "text")
    val got = Dedup.exactNgramContamination(train, "text", eval, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 3L, 1.0)))
    assert(got(2L) == ((2L, 3L, 1L, 0.333333)))
    assert(got(3L) == ((3L, 2L, 0L, 0.0)))
    assert(got.keySet == Set(1L, 2L, 3L))
  }

  test("groupOverlapExact: exact Jaccard with set sizes (identical=1, disjoint=0, half=0.5)") {
    val grouped = Seq(
      ("s1", "alpha beta gamma delta epsilon zeta eta theta"),   // 6 shingles
      ("s1", "one two three four five six seven eight"),          // 6 shingles
      ("s2", "alpha beta gamma delta epsilon zeta eta theta"),
      ("s2", "one two three four five six seven eight"),
      ("s3", "totally different words nothing shared here at all"),
      ("s4", "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("source", "text")
    val got = Dedup.groupOverlapExact(grouped, "source", "text")
      .select("group_a", "group_b", "n_a", "n_b", "n_inter", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("s1", "s2"))._6 == 1.0 && got(("s1", "s2"))._5 == 12L)
    assert(got(("s1", "s3"))._6 == 0.0 && got(("s1", "s3"))._5 == 0L)
    assert(got(("s1", "s4")) == (("s1", "s4", 12L, 6L, 6L, 0.5)))
    assert(got.size == 6, "all C(4,2) ordered pairs present, zero-overlap included")
  }

  test("groupOverlap sketch tracks groupOverlapExact within MinHash error on the bench corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val exact = Dedup.groupOverlapExact(docs, "source", "text")
      .select("group_a", "group_b", "jaccard")
      .as[(String, String, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val est = Dedup.groupOverlap(docs, "source", "text")
      .select("group_a", "group_b", "est_jaccard")
      .as[(String, String, Double)].collect()
    // same pair universe, both a<b ordered
    assert(est.nonEmpty && est.length == exact.size,
      s"pair sets differ: sketch ${est.length} vs exact ${exact.size}")
    // k=128 signature agreement has stderr ≈ √(J(1−J)/k) ≤ 0.045; 3σ plus
    // small-set bias margin → 0.15 absolute. A broken sketch (hash drift,
    // union bug) errors by O(1), far outside this band.
    val maxErr = est.map { case (a, b, e) => math.abs(e - exact((a, b))) }.max
    info(f"max |sketch − exact| over ${est.length} pairs = $maxErr%.4f")
    assert(maxErr <= 0.15, f"sketch error $maxErr%.4f exceeds MinHash bound")
  }

  test("simhash: zero-token docs get null signatures and never pair (no hot bucket)") {
    // 1000 blank docs would all share signature 0 and form one quadratic
    // LSH bucket (~500k pairs); the null-signature contract drops them.
    val blanks = (1L to 1000L).map(i => (i, if (i % 2 == 0) "" else "  \t\n "))
    val corpus = (blanks :+ (2000L, "real content words here")).toDF("doc_id", "text")
    assert(Dedup.simhashNearDups(corpus, "text", "doc_id", maxHamming = 3).count() == 0L)
    val sig = corpus.select(Dedup.simhash64(col("text")).as("s"))
      .filter(col("s").isNull).count()
    assert(sig == 1000L)
  }

  test("simhash64 is deterministic and sensitive to token multiset") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
  }

  private lazy val lineCorpus = Seq(
    (1L, "alpha line\nshared boilerplate\nunique one"),
    (2L, "shared boilerplate\nbeta line\n\ngamma"),
    (3L, "shared boilerplate"),
    (4L, "\n\n")) // only empty lines — exempt from dedup
    .toDF("doc_id", "text")

  test("dedupLines keeps the corpus-wide first occurrence and rebuilds line order") {
    val out = Dedup.dedupLines(lineCorpus, "text", "doc_id")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha line\nshared boilerplate\nunique one",
      "first occurrence keeps its line")
    assert(out(2L) == "beta line\n\ngamma",
      "later duplicate removed; exempt empty line survives in place")
    assert(!out.contains(3L), "a doc whose every line is removed drops")
    assert(out(4L) == "\n\n", "empty-line-only docs pass through unchanged")
  }

  test("dedupLines excludes null-id docs entirely — they never claim a first occurrence") {
    val corpus = Seq(
      (Option(1L), "alpha\nshared"),
      (Option.empty[Long], "shared\nnullonly"),
      (Option(2L), "shared\nbeta"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(corpus, "text", "doc_id")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "alpha\nshared", 2L -> "beta"),
      "first occurrence resolves among non-null docs only; null-id doc dropped")
  }

  test("crossDocShingleProfile counts shingles shared with at least one other doc") {
    val corpus = Seq(
      (1L, "a b c d"),     // shingles: "a b c", "b c d"
      (2L, "a b c x"),     // shingles: "a b c", "b c x"
      (3L, "q r s"),       // shingle:  "q r s" (unique)
      (4L, "a b"))         // < 3 tokens → no shingles → absent
      .toDF("doc_id", "text")
    val out = Dedup.crossDocShingleProfile(corpus, "text", "doc_id", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, a, b, f) => id -> ((a, b, f)) }.toMap
    assert(out(1L) == ((2L, 1L, 0.5)), "doc 1: 'a b c' shared with doc 2")
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((1L, 0L, 0.0)), "unique shingle is unshared")
    assert(!out.contains(4L), "sub-width docs have no profile")
  }

  test("dedupLines minLineLen exempts short lines entirely") {
    val out = Dedup.dedupLines(lineCorpus, "text", "doc_id", minLineLen = 100)
      .as[(Long, String)].collect().toMap
    val orig = lineCorpus.as[(Long, String)].collect().toMap
    assert(out == orig, "all lines under the threshold ⇒ identity")
  }
}
