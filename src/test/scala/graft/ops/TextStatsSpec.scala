package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[T]("r")

  test("whitespace tokens + count: trim, collapse runs, empty → 0") {
    assert(one[Int](TextStats.tokenCount(col("t")), "  a  b\tc\nd ") == 4)
    assert(one[Int](TextStats.tokenCount(col("t")), "") == 0)
    assert(one[Int](TextStats.tokenCount(col("t")), "   ") == 0)
    assert(one[Int](TextStats.tokenCount(col("t")), "word") == 1)
  }

  test("bpe-ish token count: letters/digits/punct splits") {
    // "Hello, world 42!" → [Hello][,][ world][ 42][!] = 5
    assert(one[Long](TextStats.bpeishTokenCount(col("t")), "Hello, world 42!") == 5L)
    assert(one[Long](TextStats.bpeishTokenCount(col("t")), "it's") == 2L) // [it]['s]
    assert(one[Long](TextStats.bpeishTokenCount(col("t")), "") == 0L)
  }

  test("bpeMergeCount: hand-checked greedy merges over the default table") {
    import graft.functions.TextKernels
    // full three-level chain: "with" = [w,i,t,h] -> t+h(r0) -> [w,i,th]
    // -> w+i(r41) -> [wi,th] -> wi+th(r42) -> [with] = 1 token
    // greedy preemption: "this" = [t,h,i,s] -> t+h(r0) -> [th,i,s] ->
    // i+s(r15) BEATS th+i(r34) -> [th,is], no (th,is) entry -> 2 tokens
    // (exactly the rank-priority behavior trained BPE tables exhibit)
    for ((w, n) <- Seq("with" -> 1L, "this" -> 2L, "and" -> 1L,
        "the" -> 1L, "what" -> 2L, "you" -> 2L, "forest" -> 3L)) {
      assert(TextKernels.bpeMergeCount(w) == n, s"'$w'")
      assert(one[Long](graft.functions.bpe_merge_count(col("t")), w) == n, s"expr '$w'")
    }
    // uppercase stays per-char (lowercase-only vocab): THIS -> 4 symbols
    assert(TextKernels.bpeMergeCount("THIS") == 4L)
    // leading space is never a symbol: [What][ is][ this][?] merge
    // independently — What=[W,h,at]=3 (uppercase W pairs with nothing),
    // is=[is]=1, this=[th,is]=2, ?=1 — total 7
    assert(TextKernels.bpeMergeCount("What is this?") == 7L)
    // contraction pre-tokens merge independently: [it]['s] -> it(r16)=1, 's=2
    assert(TextKernels.bpeMergeCount("it's") == 3L)
    assert(TextKernels.bpeMergeCount("") == 0L)
  }

  test("bpeCustomCounts: broadcast vocab path ≡ codegen expression on the default table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    val viaExpr = TextStats.bpeCounts(docs, "text")
      .select(col("doc_id"), col("n_bpe_tokens"))
    val viaBroadcast = TextStats.bpeCustomCounts(docs, "text",
      graft.functions.TextKernels.BpeMerges.toSeq)
      .select(col("doc_id"), col("n_bpe_tokens").as("n_udf"))
    val diff = viaExpr.join(viaBroadcast, Seq("doc_id"))
      .filter(col("n_bpe_tokens") =!= col("n_udf")).count()
    assert(diff == 0L, "broadcast path must equal the compiled-table kernel")
    // merging can only shrink the pre-token char totals, never below word count
    val bad = TextStats.bpeCounts(docs, "text")
      .select(TextStats.bpeishTokenCount(col("text")).as("pre"), col("n_bpe_tokens"))
      .filter(col("n_bpe_tokens") < col("pre")).count()
    assert(bad == 0L, "merged count can never undercut the pre-token count")
  }

  test("bpeTrainMerges: the classic Sennrich corpus learns the textbook merges") {
    // low ×5, lower ×2, newest ×6, widest ×3 — the worked example from
    // Sennrich et al. 2016. Pair counts round 1: es=9, st=9 (tie → the
    // lexicographically smaller 'e s'), then es+t=9, then lo=7 / ow=7
    // (tie → 'l o'), then lo+w=7.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = TextStats.bpeTrainMerges(corpus, "text", numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      merges.toString)
    // applying the learned table: "lowest" = [low, est] -> 2 tokens;
    // "newest" = [n, e, w, est] -> ne? no ('n e' unlearned) -> 4
    val counts = TextStats.bpeCustomCounts(
      Seq((1L, "lowest newest")).toDF("id", "text"), "text", merges)
      .select("n_bpe_tokens").as[Long].head()
    assert(counts == 2L + 4L, s"got $counts")
    // minPairCount floor stops before memorizing the tail: with an
    // impossible floor nothing is learned
    assert(TextStats.bpeTrainMerges(corpus, "text", 4, minPairCount = 100L).isEmpty)
  }

  test("randomized: bpeMergeCount ≡ naive list-fold reference on 300 seeded strings") {
    import graft.functions.TextKernels
    val ranks = TextKernels.BpeMerges.zipWithIndex
      .map { case ((a, b), r) => (a + " " + b) -> r }.toMap
    def naive(text: String): Long = {
      val pat = TextStats.BpePretokenPattern.r
      pat.findAllIn(text).map { tok =>
        val w = if (tok.startsWith(" ")) tok.substring(1) else tok
        var syms = w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp)))
        var go = true
        while (go && syms.length >= 2) {
          val scored = syms.zip(syms.tail).zipWithIndex
            .flatMap { case ((a, b), i) => ranks.get(a + " " + b).map(r => (r, i)) }
          if (scored.isEmpty) go = false
          else {
            val (_, i) = scored.minBy { case (r, i) => (r, i) }
            syms = syms.take(i) ++ ((syms(i) + syms(i + 1)) :: syms.drop(i + 2))
          }
        }
        syms.length.toLong
      }.sum
    }
    val rnd = new scala.util.Random(77)
    val alphabet = "the inas dortwy?!'THE éß7"
    (1 to 300).foreach { _ =>
      val s = Seq.fill(3 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(TextKernels.bpeMergeCount(s) == naive(s), s"diverged on '$s'")
    }
  }

  test("shingles: n=3 over 5 tokens → 3 shingles, short text → empty") {
    val got = one[scala.collection.Seq[String]](TextStats.shingles(col("t"), 3), "a b c d e")
    assert(got.toSeq == Seq("a b c", "b c d", "c d e"))
    assert(one[scala.collection.Seq[String]](TextStats.shingles(col("t"), 3), "a b").isEmpty)
  }

  test("shingleSet deduplicates") {
    val got = one[scala.collection.Seq[String]](TextStats.shingleSet(col("t"), 2), "x y x y x y")
    assert(got.toSeq.sorted == Seq("x y", "y x"))
  }

  test("shingle_string_set kernel ≡ array_distinct(shingles) on edge cases AND the sf0.01 corpus") {
    val samples = Seq(
      "", " ", "a", "a b", "a b c", "a b c d", "a a a a", "x y x y x y",
      "  lead and trail  ", "tabs\tand\nnewlines here too", "é ü 的 是 了 a")
    val df = samples.toDF("t")
    val viaKernel = df.select(graft.functions.shingle_string_set(col("t"), 3).as("s"))
      .as[Seq[String]].collect()
    val viaHof = df.select(TextStats.shingleSet(col("t"), 3).as("s"))
      .as[Seq[String]].collect()
    samples.indices.foreach { i =>
      assert(viaKernel(i) == viaHof(i),
        s"shingle set diverges on '${samples(i)}': ${viaKernel(i)} vs ${viaHof(i)}")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val diverged = docs.select(
        col("doc_id"),
        graft.functions.shingle_string_set(col("text"), 3).as("k"),
        TextStats.shingleSet(col("text"), 3).as("h"))
      .filter(col("k") =!= col("h"))
    assert(diverged.isEmpty, diverged.limit(5).collect().mkString("; "))
  }

  test("langId: stopword-based winner; und when no hits") {
    val en = "the cat sat on the mat and it is that for"
    val fr = "le chat est sur la table et il est que pour"
    assert(one[String](TextStats.langIdExpr(col("t")), en) == "en")
    assert(one[String](TextStats.langIdExpr(col("t")), fr) == "fr")
    assert(one[String](TextStats.langIdExpr(col("t")), "zzz qqq") == "und")
  }

  test("quality metrics: hand-computed on a tiny doc") {
    val text = "The cat sat." // 12 chars, 3 tokens, 1 punct, 1 upper, 1 stopword(The)
    val row = Seq(text).toDF("t")
      .select(TextStats.qualityMetrics(col("t")): _*).collect()(0)
    assert(row.getAs[Long]("n_chars") == 12L)
    assert(row.getAs[Long]("n_tokens") == 3L)
    assert(row.getAs[Long]("n_punct") == 1L)
    assert(row.getAs[Long]("n_upper") == 1L) // just the leading T
    assert(row.getAs[Long]("n_stopwords") == 1L)
    assert(row.getAs[Double]("quality_score") == 0.0) // < 20 chars
  }

  test("text_metrics kernel ≡ regex formulation, char by char") {
    // every count the kernel emits, recomputed with the original
    // regexp_count/split formulation, over strings picked to break it:
    // word-boundary edges (the2, _the, a_b), unicode (CJK non-word chars,
    // supplementary-plane 𝄞 = surrogate pair), \s variants, punct classes
    val samples = Seq(
      "", "   ", "word", "The cat sat.", "the the the", "that", "a",
      "A_b a_b the2 2the _the the_ thethe", "it's it is it", "  \t\nthe\tof\n",
      "héllo wörld the", "的 是 的是 a的b", "athé aé á thé ist",
      // explicit NFD / mark-boundary cases: thé (mark after stopword),
      // éthe (mark+base before), _́the (mark with non-letter base),
      // ́the (mark at string start, no base)
      "thé x éthe _́the ́the á a",
      "100% #1! [ok] {x} `y` ~z~",
      "THE OF AND tHaT", "𝄞 clef 𝄞the the𝄞 the", "for for for for for",
      "digits 0123456789 42x x42", "multi  spacesthe")
    val df = samples.toDF("t")
    val regex = df.select(
      length(col("t")).cast("long").as("n_chars"),
      TextStats.tokenCount(col("t")).cast("long").as("n_tokens"),
      coalesce(regexp_count(col("t"), lit("""[\p{Punct}]""")), lit(0)).cast("long").as("n_punct"),
      coalesce(regexp_count(col("t"), lit("[0-9]")), lit(0)).cast("long").as("n_digits"),
      coalesce(regexp_count(col("t"), lit("[A-Z]")), lit(0)).cast("long").as("n_upper"),
      TextStats.stopwordCount(col("t")).cast("long").as("n_stopwords")).collect()
    val kernel = df.select(graft.functions.text_metrics(col("t")).as("m"))
      .select("m.*").collect()
    samples.indices.foreach { i =>
      assert(kernel(i) == regex(i), s"metrics diverge on ${samples(i)}")
    }
  }

  test("bpe token count kernel ≡ regexp_count on edge cases AND the sf0.01 corpus") {
    // contractions (valid, bare, capitalized), space-joined runs, unicode
    // "punct" (é, CJK), whitespace variants, apostrophe runs
    val samples = Seq(
      "", " ", "  ", "Hello, world 42!", "it's it'll they're we've I'm he'd can't",
      "don't 'S 'rex 'l '' ' s x' é", "a1b2", "  leading", "trailing  ",
      "tabs\tand\nnewlines", "héllo wörld", "的是了 a 的", "100%#1![ok]{x}`y`~z~",
      "'", "''", "'s's's", "mixed 'reUP 42.5e3")
    val df = samples.toDF("t")
    val viaKernel = df.select(TextStats.bpeishTokenCount(col("t")).as("c")).as[Long].collect()
    val viaRegex = df.select(TextStats.bpeishTokenCountRegex(col("t")).cast("long").as("c"))
      .as[Long].collect()
    samples.indices.foreach { i =>
      assert(viaKernel(i) == viaRegex(i),
        s"bpe count diverges on '${samples(i)}': ${viaKernel(i)} vs ${viaRegex(i)}")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val diverged = docs.select(
        col("doc_id"),
        TextStats.bpeishTokenCount(col("text")).as("k"),
        TextStats.bpeishTokenCountRegex(col("text")).cast("long").as("r"))
      .filter(col("k") =!= col("r"))
    assert(diverged.isEmpty, diverged.limit(5).collect().mkString("; "))
  }

  test("lang_id kernel ≡ five-regex formulation on edge cases AND the sf0.01 corpus") {
    // overlap words (de/la/un/que shared between fr+es), CJK isolated vs
    // run-embedded, case folding, NFD marks, ties, empty
    val samples = Seq(
      "", "   ", "zzz qqq", "the cat is it", "LE la LES de et",
      "el los de y un", "der und das ist nicht", "的 是 了", "的是了他不",
      "a的b 的 x", "de de de", "la la un que", "thé le la les de",
      "DER Und dAs", "the le el 的", "it is the of and to in that for a")
    val df = samples.toDF("t")
    val viaKernel = df.select(TextStats.langIdExpr(col("t")).as("l")).as[String].collect()
    val viaRegex = df.select(TextStats.langIdRegexExpr(col("t")).as("l")).as[String].collect()
    samples.indices.foreach { i =>
      assert(viaKernel(i) == viaRegex(i),
        s"lang diverges on '${samples(i)}': ${viaKernel(i)} vs ${viaRegex(i)}")
    }
    // the whole driver-generated corpus: every document must agree
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val diverged = docs.select(
        col("doc_id"),
        TextStats.langIdExpr(col("text")).as("k"),
        TextStats.langIdRegexExpr(col("text")).as("r"))
      .filter(col("k") =!= col("r"))
    assert(diverged.isEmpty, diverged.limit(5).collect().mkString("; "))
  }

  test("randomized kernel ≡ regex equivalence: 300 seeded adversarial strings, all three kernels") {
    // seeded generator over an alphabet chosen to hit every boundary rule:
    // stopwords (all 5 languages), word/punct/digit/space/tab/newline,
    // precomposed and COMBINING accents, CJK, surrogate pairs, apostrophe
    // contractions, underscores
    val atoms = Seq(
      "the", "a", "of", "la", "de", "und", "的", "是", "THE", "tHaT",
      "x", "7", "_", " ", "  ", "\t", "\n", ".", ",", "%", "'", "'s", "'re",
      "é", "́", "é", "𝄞", "word", "42", "-", "@")
    val rnd = new scala.util.Random(42)
    val samples = (0 until 300).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    }.distinct
    val df = samples.toDF("t")
    val regexSide = df.select(
      length(col("t")).cast("long").as("n_chars"),
      TextStats.tokenCount(col("t")).cast("long").as("n_tokens"),
      coalesce(regexp_count(col("t"), lit("""[\p{Punct}]""")), lit(0)).cast("long").as("n_punct"),
      coalesce(regexp_count(col("t"), lit("[0-9]")), lit(0)).cast("long").as("n_digits"),
      coalesce(regexp_count(col("t"), lit("[A-Z]")), lit(0)).cast("long").as("n_upper"),
      TextStats.stopwordCount(col("t")).cast("long").as("n_stopwords"),
      TextStats.bpeishTokenCountRegex(col("t")).cast("long").as("bpe"),
      TextStats.langIdRegexExpr(col("t")).as("lang")).collect()
    val kernelSide = df.select(
      col("t"),
      graft.functions.text_metrics(col("t")).as("m"),
      TextStats.bpeishTokenCount(col("t")).as("bpe"),
      TextStats.langIdExpr(col("t")).as("lang"))
      .select("t", "m.*", "bpe", "lang").collect()
    samples.indices.foreach { i =>
      val r = regexSide(i)
      val k = kernelSide(i)
      (0 until 8).foreach { f =>
        assert(k.get(f + 1) == r.get(f),
          s"field ${r.schema(f).name} diverges on '${k.getString(0)}'")
      }
    }
  }

  test("normalizeText kernel ≡ three-regex formulation on edge cases AND the sf0.01 corpus") {
    val samples = Seq(
      "", " ", "  Hello\t\nWORLD x  ", "a\u0001b\u007f c", " \t\u000b\f\r ",
      "Él Dijo", "的 是", "no controlshere", "x", " x ", "multi   spaces")
    val df = samples.toDF("t")
    val viaKernel = df.select(TextStats.normalizeText(col("t")).as("n")).as[String].collect()
    val viaRegex = df.select(TextStats.normalizeTextRegex(col("t")).as("n")).as[String].collect()
    samples.indices.foreach { i =>
      assert(viaKernel(i) == viaRegex(i),
        s"normalize diverges on '${samples(i)}': '${viaKernel(i)}' vs '${viaRegex(i)}'")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val diverged = docs.select(
        TextStats.normalizeText(col("text")).as("k"),
        TextStats.normalizeTextRegex(col("text")).as("r"))
      .filter(col("k") =!= col("r"))
    assert(diverged.isEmpty)
  }

  test("normalizeText: controls stripped, whitespace collapsed, trimmed, lowercased") {
    assert(one[String](TextStats.normalizeText(col("t")), "  Hello\t\nWORLD x  ") ==
      "hello world x")
    assert(one[String](TextStats.normalizeText(col("t")), "") == "")
    assert(one[String](TextStats.normalizeText(col("t")), "Él Dijo") == "él dijo")
    assert(one[String](TextStats.normalizeText(col("t")), "a\u0001b\u007f c") == "a b c")
    assert(one[String](TextStats.normalizeText(col("t")), " \t ") == "")
  }

  test("scrubPii masks emails and phones; counts match") {
    val text = "mail a@b.co or x.y+z@mail-host.example.com, call 555-123-4567 or 555.987.6543 x"
    assert(one[String](TextStats.scrubPii(col("t")), text) ==
      "mail <EMAIL> or <EMAIL>, call <PHONE> or <PHONE> x")
    val row = Seq(text).toDF("t").select(TextStats.piiCounts(col("t")): _*).collect()(0)
    assert(row.getAs[Long]("n_emails") == 2L && row.getAs[Long]("n_phones") == 2L)
    assert(one[String](TextStats.scrubPii(col("t")), "no pii here") == "no pii here")
  }

  test("dupLineStats: duplicate-line fraction, empty lines excluded") {
    val row = Seq("a\nb\na\n\nb\nc").toDF("t")
      .select(TextStats.dupLineStats(col("t")): _*).collect()(0)
    assert(row.getAs[Long]("n_lines") == 5L)         // empty line dropped
    assert(row.getAs[Long]("n_distinct_lines") == 3L)
    assert(row.getAs[Double]("dup_line_frac") == 0.4) // 2 repeats of 5
    val empty = Seq("").toDF("t")
      .select(TextStats.dupLineStats(col("t")): _*).collect()(0)
    assert(empty.getAs[Long]("n_lines") == 0L && empty.getAs[Double]("dup_line_frac") == 0.0)
  }

  test("fingerprints: rolling is order-sensitive, content is order-robust on shingle sets") {
    def fp(c: org.apache.spark.sql.Column, t: String): Long = one[Long](c, t)
    val r1 = fp(TextStats.rollingFingerprint(col("t")), "a b c d")
    val r2 = fp(TextStats.rollingFingerprint(col("t")), "d c b a")
    val r3 = fp(TextStats.rollingFingerprint(col("t")), "a b c d")
    assert(r1 == r3 && r1 != r2)
    val c1 = fp(TextStats.contentFingerprint(col("t"), 1), "a b c d")
    val c2 = fp(TextStats.contentFingerprint(col("t"), 1), "d c b a")
    assert(c1 == c2, "1-gram content fingerprint ignores order")
  }

  test("compressionRatio separates repetitive from varied text, deterministically") {
    val rows = Seq(
      (1L, "a" * 4000),                               // maximally repetitive
      (2L, (0 until 500).map(i => (i * 2654435761L).toHexString).mkString(" ")),
      (3L, ""),                                       // empty → 1.0
      (4L, "a" * 4000))
      .toDF("id", "t")
    val r = rows.select(col("id"), TextStats.compressionRatio(col("t")).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(r(1L) < 0.01, s"runs compress away: ${r(1L)}")
    assert(r(2L) > 0.5, s"hex soup stays mostly incompressible: ${r(2L)}")
    assert(r(3L) == 1.0, "empty convention")
    assert(r(1L) == r(4L), "deterministic for identical input")
    // incompressible input can exceed 1.0 only by the deflate framing
    assert(r(2L) < 1.1)
  }

  test("gopherKeep: each fixture violates exactly ONE rule (deleting that rule flips it)") {
    def keep(t: String): Boolean =
      Seq(t).toDF("t").select(TextStats.gopherKeep(col("t")).as("k"))
        .as[Boolean].head()
    val good = (("the of and is " * 13) + "sensible words follow here now").trim
    assert(keep(good), "a prose-like doc passes every rule")
    // token-count floor: 3 tokens, stopwords present, mean length in band
    assert(!keep("short the of"), "under 50 tokens")
    // token-count ceiling: all-stopword doc, mean length 4 in band
    assert(!keep(("the " * 100001).trim), "over 100000 tokens")
    // mean-length floor: 60 one-char tokens, ALL stopwords ('a' is one)
    assert(!keep(("a " * 60).trim), "mean token length under 3 chars")
    // mean-length ceiling: long words + two stopwords keep other rules green
    assert(!keep(("the of " + "extraordinarily magnificently " * 30).trim),
      "mean token length over 10 chars")
    // punct share: chars 799, tokens 100 (mean 8, in band), stopwords 40
    assert(!keep((("the of " + "!!!!!!!!!! " * 3) * 20).trim), "punct over 20% of chars")
    // digit share: 5-char digit tokens keep mean length ~4.7, stopwords 40
    assert(!keep(("the of 12345 67890 " * 20).trim), "digits over 30% of chars")
    // stopword floor: everything else prose-like
    val noStops = ("wordy tokens without common function terms " * 10).trim
    assert(!keep(noStops + " qq ww ee rr tt yy uu ii oo pp"),
      "fewer than 2 stopwords")
  }

  test("unigramFamiliarity: avg corpus token frequency and OOV count, hand-computed") {
    val corpus = Seq(
      (1L, "a a b"), (2L, "a c"), (3L, "zzz"), (4L, ""))
      .toDF("doc_id", "text")
    // corpus freqs: a=3, b=1, c=1, zzz=1
    val out = TextStats.unigramFamiliarity(corpus, "doc_id", "text", oovBelow = 2L)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 1L, 2.333333)), "sum 3+3+1 over 3 tokens; b is OOV")
    assert(out(2L) == ((2L, 1L, 2.0)))
    assert(out(3L) == ((1L, 1L, 1.0)), "hapax doc: familiarity 1, all OOV")
    assert(!out.contains(4L), "token-less docs have no score")
  }

  test("bigramFamiliarity: continuation rate and rare-bigram count, hand-computed") {
    val corpus = Seq(
      (1L, "a b a b"), (2L, "a b c"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
    // corpus bigrams: (a,b)=3, (b,a)=1, (b,c)=1; left counts a=3, b=2
    val out = TextStats.bigramFamiliarity(corpus, "doc_id", "text", rareBelow = 2L)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 1L, 0.875)), "s12=3+1+3=7 over s1=3+2+3=8; (b,a) is rare")
    assert(out(2L) == ((2L, 1L, 0.8)), "s12=3+1=4 over s1=3+2=5; (b,c) is rare")
    assert(!out.contains(3L), "single-token docs have no bigrams")
    assert(!out.contains(4L), "empty docs have no bigrams")
  }

  test("winnowFingerprints: window minima of 60-bit gram hashes; guarantee + degenerate cases") {
    // reference hash: same truncated-md5 the operator computes
    def h60(gram: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val words = (1 to 20).map(i => s"w$i")
    val text = words.mkString(" ")
    val fps = TextStats.winnowFingerprints(col("text"), 4, 4)
    val got = Seq(Tuple1(text)).toDF("text")
      .select(fps.as("f")).as[Seq[Long]].head()
    // replay: 17 4-gram hashes, window-4 minima, distinct
    val hashes = words.sliding(4).map(g => h60(g.mkString(" "))).toSeq
    val want = hashes.sliding(4).map(_.min).toSeq.distinct
    assert(got == want, s"$got vs $want")
    // guarantee: every window's min is selected; selected ⊆ gram hashes
    assert(got.toSet.subsetOf(hashes.toSet))
    // short docs: fewer than w grams keep every gram hash; < k tokens → []
    val short = Seq(Tuple1("a b c d e")).toDF("text")
      .select(fps.as("f")).as[Seq[Long]].head()
    assert(short == Seq("a b c d", "b c d e").map(h60))
    assert(Seq(Tuple1("a b c")).toDF("text")
      .select(fps.as("f")).as[Seq[Long]].head().isEmpty)
  }

  test("dsirWeights: target-vs-raw evidence ratio, hand-computed") {
    val corpus = Seq(
      (Some(1L), "a a", "t"), (Some(2L), "a b", "t"),
      (Some(3L), "c c", "r"), (Some(4L), "a c", "r"),
      (Some(5L), "", "r"), (None, "a", "t"))
      .toDF("doc_id", "text", "slice")
    // target tokens (docs 1, 2): a=3, b=1; raw (all): a=4, b=1, c=3
    val out = TextStats.dsirWeights(corpus, "doc_id", "text",
        isTarget = col("slice") === "t")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((2L, 0.8)), "st=(3+1)*2, sr=(4+1)*2")
    assert(out(2L) == ((2L, 0.857143)), "st=4+2, sr=5+2")
    assert(out(3L) == ((2L, 0.25)), "target-unseen c gets the smoothing floor")
    assert(out(4L) == ((2L, 0.555556)), "st=4+1, sr=5+4")
    assert(!out.contains(5L), "token-less docs have no weight")
    assert(out.size == 4, "null ids are excluded")
    // the ranking DSIR needs: target-like docs outrank target-alien ones
    assert(out(2L)._2 > out(4L)._2 && out(4L)._2 > out(3L)._2)
  }

  test("bm25TopK matches a naive reference computation") {
    val docs = Map(
      1L -> Seq("apple", "banana", "apple"),
      2L -> Seq("banana", "cherry"),
      3L -> Seq("apple", "apple", "apple", "banana"),
      4L -> Seq("durian", "elderberry", "fig"),
      5L -> Nil)
    val corpus = docs.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val terms = Seq("apple", "banana")
    val res = TextStats.bm25TopK(corpus, "doc_id", "text", terms, k = 3)
      .as[(Long, Double, Long)].collect().toSeq.sortBy(_._3)

    val n = docs.size
    val sumdl = docs.values.map(_.size).sum
    def score(id: Long): Double = terms.map { t =>
      val df = docs.values.count(_.contains(t))
      val tf = docs(id).count(_ == t).toLong
      val dl = docs(id).size.toLong
      val idf = math.log(1.0 + ((n - df).toDouble + 0.5) / (df.toDouble + 0.5))
      val satur = (22L * tf * sumdl).toDouble /
        (10L * tf * sumdl + 3L * sumdl + 9L * dl * n).toDouble
      idf * satur
    }.sum
    val expected = docs.keys.toSeq
      .filter(id => terms.exists(docs(id).contains))
      .map(id => (id, math.floor(score(id) * 1e4 + 0.5) / 1e4)) // half-up round(4)
      .sortBy { case (id, s) => (-s, id) }
      .take(3)
    assert(res.map(r => (r._1, r._2)) == expected,
      s"engine ${res.toList} vs naive $expected")
    assert(res.map(_._3) == Seq(1L, 2L, 3L), "dense top-k ranks")
    // only matching docs rank: 4 (no query terms) and 5 (empty) never appear
    val all = TextStats.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(all.map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("classifierScore: exact match vs naive scalar recomputation (md5 path)") {
    val texts = Map(
      1L -> "alpha beta gamma alpha",
      2L -> "beta",
      5L -> "delta epsilon zeta eta theta iota")
    val docs = (texts.toSeq ++ Seq(3L -> "   \t  ", 4L -> ""))
      .toDF("doc_id", "text")
      .unionByName(Seq("orphan text").toDF("text")
        .withColumn("doc_id", lit(null).cast("long"))
        .select("doc_id", "text"))
    val dim = 1 << 20
    val res = TextStats.classifierScore(docs, "doc_id", "text", dim)
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(_._1)

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def naive(text: String): (Long, Double, Int) = {
      val w = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val feats = w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val wsum = feats.map { f =>
        val b = java.lang.Long.parseLong(md5hex(f).take(15), 16) % dim
        (b * 2654435761L) % 2000001L
      }.sum
      val n = feats.size.toLong
      val logit = BigDecimal((wsum - n * 1000000L).toDouble / (n * 1000000L).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (n, logit, if (wsum >= n * 1000000L) 1 else 0)
    }
    val expected = texts.toSeq.sortBy(_._1).map { case (id, tx) =>
      val (n, logit, label) = naive(tx)
      (id, n, logit, label)
    }
    // whitespace-only (3), empty (4), and null-id docs never score
    assert(res == expected, s"engine $res vs naive $expected")

    // the kernel ≡ the declarative HOF-md5 formulation (the executable
    // spec of the bucket hash) — exact row equality
    val hof = TextStats.classifierScoreHof(docs, "doc_id", "text", dim,
      bucketHash = TextStats.md5BucketHash)
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(_._1)
    assert(hof == res, s"kernel $res vs HOF $hof")

    // production xxhash64 path: same feature counts, labels still binary,
    // logits still mean-weights in [-1, 1] — only the bucket ids differ
    val xx = TextStats.classifierScoreHof(docs, "doc_id", "text", dim)
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(_._1)
    assert(xx.map(r => (r._1, r._2)) == expected.map(r => (r._1, r._2)))
    assert(xx.forall(r => r._3 >= -1.0 && r._3 <= 1.0 && (r._4 == 0 || r._4 == 1)))
  }

  test("blocktermProfile: whole-token matches only, exact threshold, empty doc keeps") {
    val docs = Seq(
      (1L, "bad bad word here"),         // 2 of 4 flagged → ratio 0.5, drop at 25%
      (2L, "badge embadded notbad"),     // substrings never fire → keep
      (3L, "bad"),                       // 1 of 1 → drop
      (4L, "clean text only here"),      // keep
      (5L, " \t ")                       // zero tokens → vacuous keep, ratio 0
    ).toDF("doc_id", "text")
    val out = TextStats.blocktermProfile(docs, "doc_id", "text",
      Seq("bad", "word"), maxPerMyriad = 2500)
      .as[(Long, Long, Long, Long, Double, Int)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, 4L, 3L, 2L, 0.75, 0),
      (2L, 3L, 0L, 0L, 0.0, 1),
      (3L, 1L, 1L, 1L, 1.0, 0),
      (4L, 4L, 0L, 0L, 0.0, 1),
      (5L, 0L, 0L, 0L, 0.0, 1)), s"got $out")
    // exact boundary: ratio == threshold keeps (<=, cross-multiplied)
    val boundary = TextStats.blocktermProfile(
      Seq((1L, "bad a b c")).toDF("doc_id", "text"), "doc_id", "text",
      Seq("bad"), maxPerMyriad = 2500)
      .as[(Long, Long, Long, Long, Double, Int)].collect().head
    assert(boundary._6 == 1, s"boundary must keep: $boundary")
  }

  test("Luhn card masking: checksum decides, 13/19 length bounds, non-card digits survive") {
    val cases = Seq(
      // valid 16-digit masked; the same number with a flipped check digit is not
      (1L, "pay 4532015112830366 now", "pay <CC> now", 1L, 1L),
      (2L, "pay 4532015112830367 now", "pay 4532015112830367 now", 1L, 0L),
      // boundary lengths: 13 and 19 digit valid cards mask
      (3L, "a 4222222222222 b", "a <CC> b", 1L, 1L),
      (4L, "a 6221267890123456780 b", "a <CC> b", 1L, 1L),
      // Luhn-valid but OUTSIDE 13..19 → never a candidate
      (5L, "id 422222222222 x", "id 422222222222 x", 0L, 0L),
      (6L, "id 42222222222222222228 x", "id 42222222222222222228 x", 0L, 0L),
      // run boundaries are digit runs, not word boundaries; two runs count twice
      (7L, "x4532015112830366y 4222222222222", "x<CC>y <CC>", 2L, 2L),
      (8L, "no digits at all", "no digits at all", 0L, 0L),
      (9L, "", "", 0L, 0L))
    val out = TextStats.luhnStats(col("text"))
    val res = cases.map(c => (c._1, c._2)).toDF("id", "text")
      .select(col("id"), TextStats.scrubCreditCards(col("text")).as("masked"),
        out.getField("n_candidates").as("nc"), out.getField("n_valid").as("nv"))
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    cases.zip(res).foreach { case (exp, got) =>
      assert(got == ((exp._1, exp._3, exp._4, exp._5)),
        s"case ${exp._1}: got $got expected ${(exp._1, exp._3, exp._4, exp._5)}")
    }
  }

  test("Luhn card masking: separator-formatted cards (space/dash groups) mask as one span") {
    val cases = Seq(
      // the common real-world grouping forms — masked as ONE span
      (1L, "pay 4532 0151 1283 0366 now", "pay <CC> now", 1L, 1L),
      (2L, "pay 4532-0151-1283-0366 now", "pay <CC> now", 1L, 1L),
      // flipped check digit: candidate, not valid, untouched
      (3L, "pay 4532-0151-1283-0367 now", "pay 4532-0151-1283-0367 now", 1L, 0L),
      // mixed separators still one span
      (4L, "a 4532 0151-1283 0366 b", "a <CC> b", 1L, 1L),
      // small groups merge into one sub-13-digit span → not a candidate
      (5L, "num 123 456", "num 123 456", 0L, 0L),
      // DOUBLE separator breaks the span (single-separator rule)
      (6L, "a 4532  0151 1283 0366 b", "a 4532  0151 1283 0366 b", 0L, 0L),
      // trailing separator is not absorbed into the span
      (7L, "a 4532 0151 1283 0366- b", "a <CC>- b", 1L, 1L),
      // documented limitation: adjacent numbers one separator apart merge
      // past 19 digits and the card escapes (greedy maximal match)
      (8L, "t 555-123-4567 4532015112830366 u",
           "t 555-123-4567 4532015112830366 u", 0L, 0L))
    val out = TextStats.luhnStats(col("text"))
    val res = cases.map(c => (c._1, c._2)).toDF("id", "text")
      .select(col("id"), TextStats.scrubCreditCards(col("text")).as("masked"),
        out.getField("n_candidates").as("nc"), out.getField("n_valid").as("nv"))
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    cases.zip(res).foreach { case (exp, got) =>
      assert(got == ((exp._1, exp._3, exp._4, exp._5)),
        s"case ${exp._1}: got $got expected ${(exp._1, exp._3, exp._4, exp._5)}")
    }
  }

  test("encodingProfile: replacement chars, C1 controls, double-encoding signature") {
    val cases = Seq(
      (1L, "clean text here", 0L, 0L, 0L, 0.0),
      // one replacement char in 6 chars
      (2L, "caf�e!", 1L, 0L, 0L, 0.166667),
      // Ã£ double-encoding pair (Ã itself is NOT C1)
      (3L, "SÃ£o", 0L, 0L, 1L, 0.25),
      // C1 control (NEL)
      (4L, "ab", 0L, 1L, 0L, 0.333333),
      // ÃÃ© : first match consumes ÃÃ (leftmost, non-overlapping) → 1
      (5L, "ÃÃéx", 0L, 0L, 1L, 0.25),
      (6L, "", 0L, 0L, 0L, 0.0))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "text")
      .select(col("id") +: TextStats.encodingProfile(col("text")): _*)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    cases.zip(got).foreach { case (exp, g) =>
      assert(g == ((exp._1, exp._3, exp._4, exp._5, exp._6)), s"case ${exp._1}: got $g")
    }
  }

  test("gopherRepetition: top-2-gram coverage, duplicate-5-gram coverage, duplicate-line chars") {
    val cases = Seq(
      // "a b" ×3 of 5 bigrams; len 11 → 3·3/11; no dup 5-grams, one line
      (1L, "a b a b a b", 0.0, 0.818182, 0.0),
      // dup line "x": 1 of 4 line chars; top bigram tie → lexicographic
      // "x x" (count 1, len 3) over len-6 text
      (2L, "x\nx\nyy", 0.25, 0.5, 0.0),
      // period-3 repeat: every 5-gram duplicated (Σ c·len = 72 > len 23
      // → capped 1.0); top bigram "p q" ×4 → 12/23
      (3L, "p q r p q r p q r p q r", 0.0, 0.521739, 1.0),
      // sub-5-token doc: no 5-grams, no bigram dups, single line
      (4L, "just four words here", 0.0, 0.5, 0.0))
    val got = TextStats.gopherRepetition(
      cases.map(c => (c._1, c._2)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    cases.zip(got).foreach { case (exp, g) =>
      assert(g == ((exp._1, exp._3, exp._4, exp._5)), s"case ${exp._1}: got $g")
    }
  }

  test("c4LineFilter: word floor, terminal punctuation, javascript lines, doc flags") {
    val cases = Seq(
      // survives: >=3 words, ends in period
      (1L, "This sentence survives fine.", "This sentence survives fine.", 1L, 1L, 0, 0),
      // dropped: two words
      (2L, "Too short.", "", 1L, 0L, 0, 0),
      // dropped: no terminal punctuation
      (3L, "No punctuation at the end", "", 1L, 0L, 0, 0),
      // javascript line dropped (case-insensitive), good line kept
      (4L, "Enable JavaScript to proceed.\nA real sentence stays here.",
           "A real sentence stays here.", 2L, 1L, 0, 0),
      // closing quote counts as terminal punctuation
      (5L, "He said \"this is fine.\"", "He said \"this is fine.\"", 1L, 1L, 0, 0),
      // doc flags: brace and lorem ipsum
      (6L, "int f() { return 1; }\nLorem Ipsum dolor sits here.",
           "Lorem Ipsum dolor sits here.", 2L, 1L, 1, 1),
      // empty lines don't count
      (7L, "\n\nOnly this one counts here.\n\n", "Only this one counts here.", 1L, 1L, 0, 0))
    val res = cases.map(c => (c._1, c._2)).toDF("id", "text")
      .select(col("id") +: TextStats.c4LineFilter(col("text")): _*)
      .as[(Long, String, Long, Long, Int, Int)].collect().toSeq.sortBy(_._1)
    cases.zip(res).foreach { case (exp, got) =>
      assert(got == ((exp._1, exp._3, exp._4, exp._5, exp._6, exp._7)),
        s"case ${exp._1}: got $got")
    }
  }

  test("htmlExtract: scripts/styles/comments gone, block tags break lines, entities decode in order") {
    def ext(s: String): (String, Int) =
      Seq(s).toDF("t").select(TextStats.htmlExtract(col("t")): _*)
        .as[(String, Int)].collect().head
    // full wrapper: script/style CONTENTS removed, h1/p/div break lines
    assert(ext("<html><head><style type=\"text/css\">body {color: red}</style>" +
      "<script>var x = 1 < 2;</script></head><body><!-- note -->" +
      "<h1>Title</h1><p>Body text here.</p><div>footer</div></body></html>") ==
      ("Title\nBody text here.\nfooter", 1))
    // entity decode after tag strip; &amp; last so &amp;lt; -> literal &lt;
    assert(ext("<p>a &lt;b&gt; &quot;q&quot; &#39;s&#39; 1 &amp; 2 &amp;lt;raw</p>") ==
      ("a <b> \"q\" 's' 1 & 2 &lt;raw", 1))
    // stray less-than is not a tag; nbsp + runs collapse; edges trim
    assert(ext("  a < b    and\t\tmore  ") == ("a < b and more", 0))
    // escaped markup stays literal text, never re-stripped
    assert(ext("&lt;script&gt;alert(1)&lt;/script&gt;") == ("<script>alert(1)</script>", 0))
    // self-closing + attributes; blank-line collapse
    assert(ext("one<br/>two<br />three\n\n\nfour") == ("one\ntwo\nthree\nfour", 1))
    // comment flags had_html even without tags
    assert(ext("plain <!-- hidden --> text") == ("plain text", 1))
    // null passes through
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextStats.htmlExtract(col("t")): _*)
      .as[(Option[String], Option[Int])].collect().head
    assert(n == ((None, None)))
  }

  test("classifierScore kernel ≡ HOF-md5 formulation on the sf0.01 corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val kernel = TextStats.classifierScore(docs, "doc_id", "text")
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(_._1)
    val hof = TextStats.classifierScoreHof(docs, "doc_id", "text",
      bucketHash = TextStats.md5BucketHash)
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(_._1)
    assert(kernel.size == 500 && kernel == hof)
  }

  test("pmiCollocations: exact lift arithmetic and minCount floor") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "x"))
      .toDF("doc_id", "text")
    // bigrams: (a,b) x2, (a,c) x1; NB=3; c1(a)=3; c2(b)=2, c2(c)=1
    val all = TextStats.pmiCollocations(docs, "text", minCount = 1L, topK = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(all == Seq(("a", "b", 2L, 1.0), ("a", "c", 1L, 1.0)),
      s"lift ties break on (w1, w2): $all")
    val floored = TextStats.pmiCollocations(docs, "text", minCount = 2L, topK = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(floored == Seq(("a", "b", 2L, 1.0)), floored.toString)
  }

  test("pmiCollocations: a glued pair outlifts a promiscuous one") {
    // "p q" always together (c12=4, NB=10: lift 4*10/(4*4)=2.5) vs "the *"
    // spreading over three partners (lift(the,x) = 2*10/(6*2) = 1.667)
    val docs = (1 to 4).map(i => (i.toLong, "p q")) ++
      Seq((5L, "the x"), (6L, "the x"), (7L, "the y"), (8L, "the y"),
        (9L, "the z"), (10L, "the z"))
    val out = TextStats.pmiCollocations(
      docs.toDF("doc_id", "text"), "text", minCount = 2L, topK = 2)
      .select("w1", "w2").as[(String, String)].collect()
    assert(out.head == (("p", "q")), out.toSeq.toString)
  }

  test("ngramNextTable: argmax successor, lexicographic ties, prefix floor") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"),
      (4L, "x z"), (5L, "x y")   // tie on count: y < z wins
    ).toDF("doc_id", "text")
    val out = TextStats.ngramNextTable(docs, "text", minPrefixCount = 1L)
      .orderBy("w1")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 2L, 3L, 0.666667),
      ("x", "y", 1L, 2L, 0.5)), out.toString)
    val floored = TextStats.ngramNextTable(docs, "text", minPrefixCount = 3L)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(floored.map(_._1) == Seq("a"), floored.toString)
  }

  test("featureHash: fixed-schema buckets, token mass conserved, identical tokens collide") {
    val df = Seq((Some(1L), "aa bb aa cc"), (Some(2L), "aa"), (Some(3L), "   "),
      (Option.empty[Long], "dd")).toDF("doc_id", "text")
    val rows = TextStats.featureHash(df, "doc_id", "text", dim = 8).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    // mass conservation: doc 1 has 4 tokens across its buckets
    assert(byDoc(1L).map(_.getAs[Long]("n")).sum == 4L)
    assert(rows.forall(r => r.getAs[Long]("bucket") >= 0L &&
      r.getAs[Long]("bucket") < 8L))
    // "aa" lands in the SAME bucket in both docs (vocab-free determinism)
    val aaBucket1 = byDoc(1L).filter(_.getAs[Long]("n") == 2L)
      .map(_.getAs[Long]("bucket")).toSet
    val aaBucket2 = byDoc(2L).map(_.getAs[Long]("bucket")).toSet
    assert(aaBucket2.subsetOf(aaBucket1), s"$aaBucket1 vs $aaBucket2")
    // wordless doc and null id emit nothing
    assert(!byDoc.contains(3L) && byDoc.keySet.forall(_ != null))
  }

  test("readabilityProfile: exact count features, fixed-order scores, wordless null") {
    // "The cat sat. It ran!" → 5 words, 2 sentences,
    // vowel groups: e, a, a, i, a = 5
    val r = Seq("The cat sat. It ran!").toDF("t")
      .select(TextStats.readabilityProfile(col("t")): _*).collect()(0)
    assert(r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllable_groups") == 5L)
    // flesch = 206.835 − 1.015·2.5 − 84.6·1.0; fk = 0.39·2.5 + 11.8·1.0 − 15.59
    assert(r.getAs[Double]("flesch") ==
      math.rint((206.835 - 1.015 * 2.5 - 84.6 * 1.0) * 10000) / 10000)
    assert(r.getAs[Double]("fk_grade") ==
      math.rint((0.39 * 2.5 + 11.8 * 1.0 - 15.59) * 10000) / 10000)
    // no terminal punctuation: sentence floor of 1 (a fragment IS a sentence)
    val frag = Seq("just a fragment").toDF("t")
      .select(TextStats.readabilityProfile(col("t")): _*).collect()(0)
    assert(frag.getAs[Long]("n_sentences") == 1L)
    // wordless: counts zero, scores null
    val empty = Seq("   ").toDF("t")
      .select(TextStats.readabilityProfile(col("t")): _*).collect()(0)
    assert(empty.getAs[Long]("n_words") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("flesch")))
  }
}
