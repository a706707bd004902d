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
  * Hashing: FNV-1a 64 over UTF-16 code units (both bytes of each char —
  * see [[hashRange]]; NOT UTF-8: encoding would cost an allocation per
  * token for identical determinism/uniformity after the final mix),
  * finalized with SplitMix64, and the i-th MinHash permutation derives
  * from the base hash with one SplitMix64 round per i — standard "hash
  * once, permute cheaply" MinHash practice.
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

  /** FNV-1a 64 over the UTF-16 code units of `s[from, until)` (low byte
    * then high byte of each char), SplitMix64-mixed.
    */
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

  /** Distinct word-n-gram shingle STRINGS (space-joined tokens), in
    * first-occurrence order — the oracle-parity (unhashed) twin of
    * [[shingleHashSet]], for operators whose shuffle key must be
    * reproducible in plain SQL. One pass over token bounds with
    * substring copies; no regex, no interpreted HOFs. Same distinct +
    * first-occurrence-order semantics as
    * `array_distinct(TextStats.shingles(text, n))`.
    */
  def shingleStringSet(text: String, n: Int): Array[String] = {
    if (text == null) return null
    val b = tokenBounds(text)
    val nTok = b.length / 2
    if (nTok < n) return Array.empty[String]
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= nTok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(text, b(2 * (i + j)), b(2 * (i + j) + 1))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
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

  /** English stopword list for the quality-metrics kernel — the single
    * source of truth: `TextStats.Stopwords("en")` and the DuckDB oracle
    * regex are both generated from this array, so the three sides cannot
    * drift. Order matters only for the generated regex alternation.
    */
  val EnStopwords: Array[String] =
    Array("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Per-language stopword lists for the language-ID kernel, lang codes
    * ascending (the tie-break order). Canonical here for the same
    * no-drift reason as [[EnStopwords]]: `TextStats.Stopwords`, the
    * generated oracle SQL, and [[langId]] all read this table.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "nicht", "mit"),
    "en" -> EnStopwords.toSeq,
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "他"))

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** ASCII `\p{Punct}` / POSIX `[[:punct:]]`: !-/ :-@ [-` {-~ . */
  @inline private def isAsciiPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  /** Java-regex `\b` word character. Subtle but load-bearing: without
    * UNICODE_CHARACTER_CLASS, Java's `\w` is ASCII but `\b` is STILL
    * Unicode-aware — `Pattern.Bound.isWord` checks
    * `ch == '_' || Character.isLetterOrDigit(ch)` on the adjacent code
    * point. So `\ba\b` does NOT match the "a" in "a的b" (的 is a letter)
    * even though 的 is not `\w`. The kernel must reproduce exactly this
    * or stopword counts drift from the regexp_count formulation the
    * oracle mirrors.
    */
  @inline private def isJavaBoundWord(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** Second `Pattern.Bound` quirk: a non-spacing mark (Mn) with a
    * letter/digit base character also counts as a word char for `\b` —
    * so `\bthe\b` does NOT match in "thé" (NFD "thé"). This is the
    * JDK's `hasBaseCharacter`: walk backward one CHAR at a time from
    * `from`, skipping Mn code points; the first non-mark must be a letter
    * or digit (note: underscore does NOT qualify as a base).
    */
  private def hasBaseCharacter(s: String, from: Int): Boolean = {
    var x = from
    while (x >= 0) {
      val cp = s.codePointAt(x)
      if (Character.isLetterOrDigit(cp)) return true
      if (Character.getType(cp) != Character.NON_SPACING_MARK) return false
      x -= 1
    }
    false
  }

  /** Is there a `\b` word char immediately LEFT of index `pos`?
    * (`Pattern.Bound`'s left check: `codePointBefore` + the Mn clause.)
    */
  private def boundWordBefore(s: String, pos: Int): Boolean = {
    val cp = s.codePointBefore(pos)
    isJavaBoundWord(cp) ||
      (Character.getType(cp) == Character.NON_SPACING_MARK &&
        hasBaseCharacter(s, pos - 1))
  }

  /** Is there a `\b` word char AT index `pos`? (`Pattern.Bound`'s right
    * check: `codePointAt` + the Mn clause.)
    */
  private def boundWordAt(s: String, pos: Int): Boolean = {
    val cp = s.codePointAt(pos)
    isJavaBoundWord(cp) ||
      (Character.getType(cp) == Character.NON_SPACING_MARK &&
        hasBaseCharacter(s, pos))
  }

  /** Case-insensitive match of `s[from, from+len)` against [[EnStopwords]].
    *
    * A match of `(?i)\b(the|a|...)\b` is a maximal ASCII-`\w+` run equal
    * (ASCII case-insensitively) to one of the words — so partial-run
    * matches like the "a" in "that" or the "the" in "the2" never fire —
    * whose adjacent code points are additionally non-word per
    * [[isJavaBoundWord]] (Unicode `\b` semantics).
    */
  private def isEnStopword(s: String, from: Int, len: Int): Boolean = {
    if (len < 1 || len > 4) return false
    @inline def lc(i: Int): Char = {
      val c = s.charAt(from + i)
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
    }
    len match {
      case 1 => lc(0) == 'a'
      case 2 =>
        val a = lc(0); val b = lc(1)
        (a == 'o' && b == 'f') || (a == 't' && b == 'o') ||
          (a == 'i' && (b == 'n' || b == 's' || b == 't'))
      case 3 =>
        val a = lc(0); val b = lc(1); val c = lc(2)
        (a == 't' && b == 'h' && c == 'e') ||
          (a == 'a' && b == 'n' && c == 'd') ||
          (a == 'f' && b == 'o' && c == 'r')
      case _ => lc(0) == 't' && lc(1) == 'h' && lc(2) == 'a' && lc(3) == 't'
    }
  }

  /** All quality-metric counts in ONE pass over the string:
    * `[n_chars, n_tokens, n_punct, n_digits, n_upper, n_stopwords]`.
    *
    * Replaces 4 `regexp_count` passes + 3 tokenizer `split`s per row
    * (≈16 java.util.regex scans once Catalyst duplicates the score tree
    * into Filter AND Project — there is no cross-operator subexpression
    * elimination, so the fix that holds at 100 TB is making each
    * evaluation a single cheap scan). Semantics are bit-identical to the
    * regex forms: n_chars counts code points (Spark `length` /
    * DuckDB `length`), tokens split on Java `\s`, punct is ASCII
    * `\p{Punct}`, stopwords are `(?i)\b(...)\b` word-run matches.
    */
  def textMetrics(s: String): Array[Long] = {
    if (s == null) return null
    val n = s.length
    var nTok = 0L; var nPunct = 0L; var nDigit = 0L; var nUpper = 0L
    var nStop = 0L
    var inTok = false // inside a non-whitespace token
    var runStart = -1 // start of the current \w+ run, -1 when outside
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) inTok = false
      else if (!inTok) { inTok = true; nTok += 1 }
      if (isAsciiPunct(c)) nPunct += 1
      if (c >= '0' && c <= '9') nDigit += 1
      if (c >= 'A' && c <= 'Z') nUpper += 1
      if (isWordChar(c)) { if (runStart < 0) runStart = i }
      else if (runStart >= 0) {
        if (isEnStopword(s, runStart, i - runStart) &&
          (runStart == 0 || !boundWordBefore(s, runStart)) &&
          !boundWordAt(s, i)) nStop += 1
        runStart = -1
      }
      i += 1
    }
    if (runStart >= 0 && isEnStopword(s, runStart, n - runStart) &&
      (runStart == 0 || !boundWordBefore(s, runStart))) nStop += 1
    Array(s.codePointCount(0, n).toLong, nTok, nPunct, nDigit, nUpper, nStop)
  }

  // --- whitespace-canonicalization kernel ----------------------------------

  /** One-pass equivalent of the regex composition
    * `regexp_replace(regexp_replace(regexp_replace(s,
    * '[\x00-\x1f\x7f]', ' '), '[ \t\n\f\r\x0b]+', ' '), '^ | $', '')`:
    * control chars become spaces, whitespace runs collapse to one space,
    * edges trim. (The collapse class is a subset of the control class ∪
    * space, so a single run-collapse over {controls, \x7f, space} is
    * exactly the composition.) Lowercasing stays OUTSIDE the kernel —
    * callers apply Spark's own `lower` so Unicode case semantics are the
    * engine's, not a reimplementation.
    */
  def cleanWhitespace(s: String): String = {
    if (s == null) return null
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c <= '\u001f' || c == '\u007f' || c == ' ') {
        if (sb.length > 0) pendingSpace = true // leading run = trim
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString // trailing pending space dropped = trim
  }

  // --- BPE-ish pretokenizer kernel ----------------------------------------

  @inline private def isAsciiLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  @inline private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'
  /** `[^\sA-Za-z0-9]` — anything non-\s, non-ASCII-alphanumeric (includes
    * all non-ASCII letters: é counts as "punct" to this pretokenizer,
    * exactly as the regex class reads).
    */
  @inline private def isBpePunct(c: Char): Boolean =
    !isWs(c) && !isAsciiLetter(c) && !isAsciiDigit(c)

  /** Non-overlapping match count of the GPT-2-style pretokenizer
    * alternation `'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+`
    * in one scan — a hand-rolled replica of java.util.regex's
    * leftmost-first semantics: at each position the contraction
    * alternative wins if its (case-sensitive) suffix follows an
    * apostrophe; otherwise an optional literal space prefixes a maximal
    * letter, digit, or "punct" run; unmatched whitespace advances one
    * char. Spec-checked against `regexp_count` char-for-char
    * (TextStatsSpec) including on the full test corpus.
    */
  def bpeTokenCount(s: String): Long = {
    val n = s.length
    var i = 0
    var count = 0L
    @inline def runEnd(from: Int, cls: Char => Boolean): Int = {
      var j = from
      while (j < n && cls(s.charAt(j))) j += 1
      j
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        val d = if (i + 1 < n) s.charAt(i + 1) else ' '
        val e = if (i + 2 < n) s.charAt(i + 2) else ' '
        val len =
          if (d == 's' || d == 't' || d == 'm' || d == 'd') 2
          else if ((d == 'r' || d == 'v') && e == 'e') 3
          else if (d == 'l' && e == 'l') 3
          else 0
        if (len > 0) { count += 1; i += len }
        else { count += 1; i = runEnd(i, isBpePunct) } // bare-punct fallback
      }
      else if (isAsciiLetter(c)) { count += 1; i = runEnd(i, isAsciiLetter) }
      else if (isAsciiDigit(c)) { count += 1; i = runEnd(i, isAsciiDigit) }
      else if (c == ' ' && i + 1 < n && !isWs(s.charAt(i + 1))) {
        // ` ?X+`: the space joins the following run (contractions excluded
        // — their alternative has no space prefix, so ` 's` pretokenizes
        // as " '" + "s", and the punct run swallows the apostrophe)
        val d = s.charAt(i + 1)
        count += 1
        i = if (isAsciiLetter(d)) runEnd(i + 1, isAsciiLetter)
          else if (isAsciiDigit(d)) runEnd(i + 1, isAsciiDigit)
          else runEnd(i + 1, isBpePunct)
      }
      else if (isBpePunct(c)) { count += 1; i = runEnd(i, isBpePunct) }
      else i += 1 // whitespace: no alternative matches, engine advances one
    }
    count
  }

  // --- vocab-merge BPE kernel ---------------------------------------------

  /** Default merge-rank vocabulary for [[bpeMergeCount]] — rank =
    * position, lower merges first (the merges.txt convention of
    * Sennrich et al. 2016 / GPT-2). Pairs compose multi-level English
    * merges (t+h→th, th+e→the, w+i→wi, wi+th→with …) so the greedy
    * loop exercises real depth — including rank preemption (i+s at
    * rank 15 beats th+i at 34, so "this" lands as [th,is]: exactly the
    * priority behavior trained tables exhibit) — and the list is a small
    * code literal so the DuckDB oracle embeds the SAME table verbatim.
    * A production vocabulary (a trained 50k-merge table) goes through
    * [[graft.ops.TextStats.bpeCustomCounts]]'s broadcast path instead.
    */
  val BpeMerges: Array[(String, String)] = Array(
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
    ("e", "n"), ("e", "s"), ("o", "r"), ("t", "e"), ("e", "d"),
    ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"), ("s", "t"),
    ("t", "o"), ("en", "t"), ("o", "u"), ("l", "e"), ("c", "h"),
    ("s", "e"), ("m", "e"), ("n", "e"), ("l", "l"), ("c", "e"),
    ("u", "r"), ("r", "o"), ("u", "n"), ("r", "i"), ("th", "i"),
    ("thi", "s"), ("w", "h"), ("wh", "a"), ("wha", "t"), ("f", "o"),
    ("fo", "r"), ("w", "i"), ("wi", "th"), ("b", "e"), ("h", "a"),
    ("ha", "t"), ("y", "o"), ("yo", "u"))

  /** Rank lookup key: `left + " " + right`. The space separator is
    * unambiguous — symbols never contain whitespace (pre-token runs
    * exclude `\s` and the leading space is stripped before merging).
    */
  def bpeRankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    for (((a, b), r) <- merges.zipWithIndex) m.put(a + " " + b, Integer.valueOf(r))
    m
  }

  private val defaultBpeRanks = bpeRankMap(BpeMerges.toSeq)

  /** Greedy merged-symbol count of ONE pre-token (leading space already
    * stripped): symbols start as single code points (code points, not
    * UTF-16 units — the oracle's char slicing is code-point-based);
    * each step merges the LEFTMOST occurrence of the LOWEST-RANKED
    * adjacent pair present in the vocabulary; stops when no adjacent
    * pair is in the table. Deterministic: ranks are unique by
    * construction and positional ties resolve leftmost. (This is the
    * one-merge-per-step variant of the BPE apply loop — same priority
    * rule as GPT-2's `bpe()`, stepping one occurrence at a time so an
    * engine-independent replay is a pure fold.)
    */
  def bpeMergedSymbols(word: String,
      ranks: java.util.HashMap[String, Integer]): Int =
    bpeMergeSymbolList(word, ranks).size

  /** The surviving symbol list itself (the greedy loop of
    * [[bpeMergedSymbols]], exposed for pair-statistics consumers —
    * notably [[bpeAdjacentPairs]], the training-side counting pass).
    */
  def bpeMergeSymbolList(word: String,
      ranks: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    val syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      syms.add(word.substring(i, i + cc))
      i += cc
    }
    var live = syms.size >= 2
    while (live) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestI = j
        }
        j += 1
      }
      if (bestI < 0) live = false
      else {
        syms.set(bestI, syms.get(bestI) + syms.get(bestI + 1))
        syms.remove(bestI + 1)
        live = syms.size >= 2
      }
    }
    syms
  }

  /** The pre-tokenizer's words (leading space stripped — the same word
    * definition every BPE entry point uses). Shared by the training
    * counting pass; the counting kernels keep their fused scanners.
    */
  def bpeWords(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val n = s.length
    var i = 0
    @inline def runEnd(from: Int, cls: Char => Boolean): Int = {
      var j = from
      while (j < n && cls(s.charAt(j))) j += 1
      j
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        val d = if (i + 1 < n) s.charAt(i + 1) else ' '
        val e = if (i + 2 < n) s.charAt(i + 2) else ' '
        val len =
          if (d == 's' || d == 't' || d == 'm' || d == 'd') 2
          else if ((d == 'r' || d == 'v') && e == 'e') 3
          else if (d == 'l' && e == 'l') 3
          else 0
        if (len > 0) { out.add(s.substring(i, i + len)); i += len }
        else { val j = runEnd(i, isBpePunct); out.add(s.substring(i, j)); i = j }
      }
      else if (isAsciiLetter(c)) { val j = runEnd(i, isAsciiLetter); out.add(s.substring(i, j)); i = j }
      else if (isAsciiDigit(c)) { val j = runEnd(i, isAsciiDigit); out.add(s.substring(i, j)); i = j }
      else if (c == ' ' && i + 1 < n && !isWs(s.charAt(i + 1))) {
        val d = s.charAt(i + 1)
        val j = if (isAsciiLetter(d)) runEnd(i + 1, isAsciiLetter)
          else if (isAsciiDigit(d)) runEnd(i + 1, isAsciiDigit)
          else runEnd(i + 1, isBpePunct)
        out.add(s.substring(i + 1, j))
        i = j
      }
      else if (isBpePunct(c)) { val j = runEnd(i, isBpePunct); out.add(s.substring(i, j)); i = j }
      else i += 1
    }
    out
  }

  /** Adjacent symbol pairs (`"left right"` keys) of every pre-token
    * after greedy merging under `ranks` — ONE training-iteration
    * counting pass of Sennrich et al.'s BPE learner: the argmax of
    * these pair counts over the corpus is the next merge.
    */
  def bpeAdjacentPairs(s: String,
      ranks: java.util.HashMap[String, Integer]): Array[String] = {
    val words = bpeWords(s)
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var w = 0
    while (w < words.size) {
      val syms = bpeMergeSymbolList(words.get(w), ranks)
      var j = 0
      while (j < syms.size - 1) {
        out += syms.get(j) + " " + syms.get(j + 1)
        j += 1
      }
      w += 1
    }
    out.toArray
  }

  /** Vocab-merge BPE token count: the SAME pre-tokenizer scan as
    * [[bpeTokenCount]], but each pre-token (leading space dropped — the
    * byte-level Ġ-join is implicit in this char-level formulation) is
    * greedily merged against the rank table and its surviving symbol
    * count summed. With an empty table this equals summed pre-token
    * code-point lengths; with [[BpeMerges]] it is a true
    * merge-compressed count — the token accounting `token_budget` /
    * `sequence_pack`-style budgeting wants.
    */
  def bpeMergeCountWith(s: String,
      ranks: java.util.HashMap[String, Integer]): Long = {
    val n = s.length
    var i = 0
    var count = 0L
    @inline def runEnd(from: Int, cls: Char => Boolean): Int = {
      var j = from
      while (j < n && cls(s.charAt(j))) j += 1
      j
    }
    @inline def word(from: Int, until: Int): Unit =
      count += bpeMergedSymbols(s.substring(from, until), ranks)
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        val d = if (i + 1 < n) s.charAt(i + 1) else ' '
        val e = if (i + 2 < n) s.charAt(i + 2) else ' '
        val len =
          if (d == 's' || d == 't' || d == 'm' || d == 'd') 2
          else if ((d == 'r' || d == 'v') && e == 'e') 3
          else if (d == 'l' && e == 'l') 3
          else 0
        if (len > 0) { word(i, i + len); i += len }
        else { val j = runEnd(i, isBpePunct); word(i, j); i = j }
      }
      else if (isAsciiLetter(c)) { val j = runEnd(i, isAsciiLetter); word(i, j); i = j }
      else if (isAsciiDigit(c)) { val j = runEnd(i, isAsciiDigit); word(i, j); i = j }
      else if (c == ' ' && i + 1 < n && !isWs(s.charAt(i + 1))) {
        // ` ?X+`: the space prefixes the run but is NOT a merge symbol
        val d = s.charAt(i + 1)
        val j = if (isAsciiLetter(d)) runEnd(i + 1, isAsciiLetter)
          else if (isAsciiDigit(d)) runEnd(i + 1, isAsciiDigit)
          else runEnd(i + 1, isBpePunct)
        word(i + 1, j)
        i = j
      }
      else if (isBpePunct(c)) { val j = runEnd(i, isBpePunct); word(i, j); i = j }
      else i += 1 // whitespace: no alternative matches, engine advances one
    }
    count
  }

  /** [[bpeMergeCountWith]] over the default [[BpeMerges]] table. */
  def bpeMergeCount(s: String): Long = bpeMergeCountWith(s, defaultBpeRanks)

  // --- language-ID kernel --------------------------------------------------

  /** Lang codes ascending — index aligns with [[LangStopwords]]. */
  private val LangCodes: Array[String] = LangStopwords.map(_._1).toArray

  /** lowercase word → indices of the languages whose list contains it
    * (words overlap: "de"/"la"/"un"/"que"/"es" appear in ≥2 lists).
    */
  private val langDict: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for (((_, words), idx) <- LangStopwords.zipWithIndex; w <- words) {
      val prev = m.get(w)
      m.put(w, if (prev == null) Array(idx) else prev :+ idx)
    }
    m
  }
  private val MaxStopwordLen: Int =
    LangStopwords.iterator.flatMap(_._2).map(_.length).max

  private def tallyRun(s: String, from: Int, until: Int, counts: Array[Int]): Unit = {
    val len = until - from
    if (len < 1 || len > MaxStopwordLen) return
    val chars = new Array[Char](len)
    var k = 0
    while (k < len) {
      val c = s.charAt(from + k)
      chars(k) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      k += 1
    }
    val hit = langDict.get(new String(chars))
    if (hit != null) { var m = 0; while (m < hit.length) { counts(hit(m)) += 1; m += 1 } }
  }

  /** Language ID in one pass: winner = language with the most stopword
    * hits, ascending lang code breaking ties, "und" when nothing matches.
    *
    * Equivalent to five `regexp_count(text, '(?i)\b(w|…)\b')` scans: since
    * every stopword consists solely of `\b`-word characters, a
    * boundary-valid match is exactly a maximal `\b`-word-char run equal to
    * the word (ASCII case-insensitively). Runs use the full Java `\b`
    * word definition — Unicode letters/digits (so an isolated 的 matches
    * but 的是 does not), underscore, and non-spacing marks with a
    * letter/digit base ([[boundWordBefore]]'s Mn clause: NFD "thé" is ONE
    * run ending in the mark, never the stopword "the").
    */
  def langId(s: String): String = {
    if (s == null) return null
    val n = s.length
    val counts = new Array[Int](LangCodes.length)
    var runStart = -1
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val isW = isJavaBoundWord(cp) ||
        (Character.getType(cp) == Character.NON_SPACING_MARK && hasBaseCharacter(s, i))
      if (isW) { if (runStart < 0) runStart = i }
      else if (runStart >= 0) { tallyRun(s, runStart, i, counts); runStart = -1 }
      i += Character.charCount(cp)
    }
    if (runStart >= 0) tallyRun(s, runStart, n, counts)
    var best = -1
    var bestC = 0
    var j = 0
    while (j < counts.length) {
      if (counts(j) > bestC) { bestC = counts(j); best = j }
      j += 1
    }
    if (best < 0) "und" else LangCodes(best)
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

  def shingleStringSetArray(s: UTF8String, n: Int): ArrayData = {
    val arr = shingleStringSet(s.toString, n)
    if (arr == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      arr.map(x => UTF8String.fromString(x): Any))
  }

  def simhash64U(s: UTF8String): java.lang.Long = simhash64(s.toString)

  def langIdU(s: UTF8String): UTF8String = UTF8String.fromString(langId(s.toString))

  def bpeTokenCountU(s: UTF8String): Long = bpeTokenCount(s.toString)

  def bpeMergeCountU(s: UTF8String): Long = bpeMergeCount(s.toString)

  def cleanWhitespaceU(s: UTF8String): UTF8String =
    UTF8String.fromString(cleanWhitespace(s.toString))

  /** Unicode NFC canonical composition (e + U+0301 → é): the
    * normalization every multilingual corpus pipeline applies before
    * hashing/dedup, since byte-different decompositions of the same text
    * would never collide. Fast path: `Normalizer.isNormalized` is a scan
    * with NO allocation, and real-world corpora are overwhelmingly
    * already-NFC — the original UTF8String is returned untouched then.
    */
  def nfcNormalizeU(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def textMetricsRow(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val m = textMetrics(s.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m(0), m(1), m(2), m(3), m(4), m(5)))
  }

  def rollingFingerprintU(s: UTF8String): Long = rollingFingerprint(s.toString).longValue()

  def contentFingerprintU(s: UTF8String, n: Int): Long = contentFingerprint(s.toString, n)

  def jaccardSortedArrays(a: ArrayData, b: ArrayData): java.lang.Double =
    jaccardSorted(a.toLongArray(), b.toLongArray())

  /** Deflate (zlib level 6, raw) compression ratio of the UTF-8 bytes:
    * compressed/raw length, rounded half-up to 6 dp. Repetitive or
    * templated text compresses far below natural prose — the standard
    * cheap repetition signal (used alongside the Gopher rules). The
    * deflate algorithm at a fixed level/strategy is deterministic for a
    * given input, so the ratio is reproducible across runs and
    * executors. Empty input → 1.0 by convention (nothing to compress).
    */
  // one native zlib stream per executor thread, reset per document —
  // per-row Deflater allocation would pay native init/teardown billions
  // of times and leak if deflate threw before end(); reset() at entry
  // also clears any dirty state a previous failed call left behind
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  def compressionRatio(raw: Array[Byte]): Double =
    if (raw.isEmpty) 1.0
    else {
      val d = deflaters.get()
      d.reset()
      d.setInput(raw)
      d.finish()
      var buf = new Array[Byte](raw.length / 2 + 128)
      var n = 0
      while (!d.finished()) {
        if (n == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        n += d.deflate(buf, n, buf.length - n)
      }
      math.floor(n.toDouble / raw.length * 1e6 + 0.5) / 1e6
    }

  def compressionRatioU(s: UTF8String): Double = compressionRatio(s.getBytes)

  // --- Luhn-validated payment-card masking ---------------------------------

  /** Luhn checksum over the DIGITS of `text[start, end)`, skipping the
    * single-char group separators a card-shaped span may contain (digit
    * detection is the ASCII [[isAsciiDigit]] — the oracle's `[0-9]` —
    * NOT Character.isDigit, which also fires on Unicode digit blocks):
    * double every second digit from the right, fold >9 back by −9,
    * valid iff the sum is ≡ 0 mod 10 — the ISO/IEC 7812 check every
    * real payment card passes, which is what separates a card number
    * from a 16-digit order id (the regex-only PII scrubber's
    * false-positive class).
    */
  private def luhnValid(text: String, start: Int, end: Int): Boolean = {
    var sum = 0
    var alt = false
    var i = end - 1
    while (i >= start) {
      val c = text.charAt(i)
      if (isAsciiDigit(c)) {
        var d = c - '0'
        if (alt) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        alt = !alt
      }
      i -= 1
    }
    sum % 10 == 0
  }

  /** Advance over one card-shaped span starting at the digit at `i`: a
    * maximal sequence of ASCII digit groups joined by SINGLE space or
    * dash separators — the regex `[0-9]+(?:[ -][0-9]+)*`, the form real
    * cards are written in ('4532 0151 1283 0366', '4532-0151-…').
    * Returns `(spanEnd << 32) | digitCount` packed in one long.
    * Known limitation (documented on `scrubCreditCards`): two distinct
    * numbers one separator apart merge into a single span, so a card
    * glued to a phone number by one space can exceed 19 digits and
    * escape — the price of the greedy maximal match both the kernel and
    * the RE2 oracle pattern share.
    */
  private def cardSpan(text: String, i0: Int): Long = {
    var i = i0
    var nDigits = 0L
    while (i < text.length && isAsciiDigit(text.charAt(i))) { i += 1; nDigits += 1 }
    var done = false
    while (!done) {
      if (i + 1 < text.length && (text.charAt(i) == ' ' || text.charAt(i) == '-') &&
          isAsciiDigit(text.charAt(i + 1))) {
        i += 1
        while (i < text.length && isAsciiDigit(text.charAt(i))) { i += 1; nDigits += 1 }
      } else done = true
    }
    (i.toLong << 32) | nDigits
  }

  /** Per-document card scan in one pass over maximal card-shaped spans
    * (see [[cardSpan]]): a span is a CANDIDATE when its DIGIT count is
    * 13–19 (the issued card range), VALID when the digits also pass
    * [[luhnValid]]. Returns `{n_candidates, n_valid}`.
    */
  def luhnStatsRow(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val text = s.toString
    var nCand = 0L
    var nValid = 0L
    var i = 0
    while (i < text.length) {
      while (i < text.length && !isAsciiDigit(text.charAt(i))) i += 1
      if (i < text.length) {
        val start = i
        val packed = cardSpan(text, i)
        val end = (packed >>> 32).toInt
        val nDigits = packed & 0xffffffffL
        if (nDigits >= 13 && nDigits <= 19) {
          nCand += 1
          if (luhnValid(text, start, end)) nValid += 1
        }
        i = end
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nCand, nValid))
  }

  /** Masked text: every Luhn-VALID card-shaped span with 13–19 digits
    * (including its internal space/dash separators) replaced by `<CC>`;
    * candidate spans failing the checksum (and any other digits) pass
    * through untouched. Span detection is [[cardSpan]], identical to
    * [[luhnStatsRow]]'s scan.
    */
  def maskLuhnU(s: UTF8String): UTF8String = {
    val text = s.toString
    val out = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!isAsciiDigit(c)) { out.append(c); i += 1 }
      else {
        val start = i
        val packed = cardSpan(text, i)
        val end = (packed >>> 32).toInt
        val nDigits = packed & 0xffffffffL
        if (nDigits >= 13 && nDigits <= 19 && luhnValid(text, start, end)) out.append("<CC>")
        else out.append(text, start, end)
        i = end
      }
    }
    UTF8String.fromString(out.toString)
  }

  // --- hashed-linear classifier fold ---------------------------------------

  private val md5s = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of an MD5 digest as a non-negative long — EXACTLY
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`, the DuckDB-mirrorable
    * hash idiom, computed from the digest bytes with no hex round-trip.
    */
  private def md5Top60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Java-regex `\s` (the 6 ASCII whitespace chars `split("\\s+")` uses —
    * deliberately NOT `Character.isWhitespace`, which would diverge from
    * the declarative tokenizer on NBSP etc.). All are single-byte ASCII,
    * so byte-level token splitting is UTF-8 safe.
    */
  private def isAsciiSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** One-pass fold of the hashed-linear classifier over a document:
    * tokenize on `\s+`, hash word unigrams and adjacent bigrams
    * (`"w1 w2"`) through the md5-top-60 bucket hash mod `dim`, accumulate
    * the micro-scaled Knuth weights `(bucket · 2654435761) % 2000001`.
    * Returns `{n_feats, wsum}`; the logit/label arithmetic stays
    * declarative on top (`TextStats.classifierScore`). Semantics are
    * IDENTICAL to the HOF + `md5`/`conv` formulation (spec-pinned) — this
    * kernel exists because that path paid ~4 µs/feature in interpreted
    * lambda + hex/conv overhead, the difference between the slowest gate
    * in the bench and a sub-second one.
    */
  def hashedLinearRow(s: UTF8String, dim: Long): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val md = md5s.get()
    var nFeats = 0L
    var wsum = 0L
    def fold(digest: Array[Byte]): Unit = {
      val bucket = java.lang.Long.remainderUnsigned(md5Top60(digest), dim)
      // floorMod: for dim ≳ 2^32 the product overflows int64 and plain %
      // would yield a negative residue, diverging from the declarative
      // pmod spec; below that bound floorMod ≡ % bit-for-bit.
      wsum += java.lang.Math.floorMod(bucket * 2654435761L, 2000001L)
      nFeats += 1
    }
    var i = 0
    var prevStart = -1
    var prevLen = 0
    while (i < bytes.length) {
      while (i < bytes.length && isAsciiSpace(bytes(i))) i += 1
      val start = i
      while (i < bytes.length && !isAsciiSpace(bytes(i))) i += 1
      if (i > start) {
        md.reset()
        md.update(bytes, start, i - start)
        fold(md.digest())
        if (prevStart >= 0) {
          md.reset()
          md.update(bytes, prevStart, prevLen)
          md.update(' '.toByte)
          md.update(bytes, start, i - start)
          fold(md.digest())
        }
        prevStart = start
        prevLen = i - start
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nFeats, wsum))
  }
}
