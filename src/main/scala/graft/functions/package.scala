package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.ColumnShim

/** The engine's custom column-function surface — native codegen'd Catalyst
  * expressions (see [[functions.expressions]]), exposed Column-first like
  * `org.apache.spark.sql.functions`, plus live-session SQL registration.
  */
package object functions {

  private def c(e: Expression): Column = ColumnShim.column(e)
  private def e(col: Column): Expression = ColumnShim.expression(col)

  /** Sorted distinct 64-bit hashes of word-`n`-gram shingles. */
  def shingle_hash_set(text: Column, n: Int): Column =
    c(expressions.ShingleHashSet(e(text), n))

  /** Spark's internal Bloom-filter aggregate (the engine behind runtime
    * row-level filtering), exposed Column-first: builds a serialized Bloom
    * filter over a LONG column (hash first — `xxhash64`). Not SQL-registered
    * upstream, but a public-Spark catalyst class — no UDF, codegen'd probe.
    */
  def bloom_filter_agg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    c(new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      e(hashed),
      org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Probe of a serialized Bloom filter (constant byte array) against a
    * LONG hash column.
    */
  def might_contain(bloomBytes: Array[Byte], hashed: Column): Column =
    c(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(
        bloomBytes, org.apache.spark.sql.types.BinaryType),
      e(hashed)))

  /** [[might_contain]] with the sketch shipped as a BROADCAST instead of a
    * plan literal — the form for MB-scale sketches reused across batches
    * (see [[expressions.BloomMightContainBroadcast]]).
    */
  def might_contain_broadcast(
      bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]],
      hashed: Column): Column =
    c(expressions.BloomMightContainBroadcast(bloom, e(hashed)))

  /** MinHash signature (`k` permutations) of a hashed shingle set. */
  def minhash_signature(hashes: Column, k: Int): Column =
    c(expressions.MinhashSignature(e(hashes), k))

  /** LSH band hashes of a MinHash signature. */
  def band_hashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    c(expressions.BandHashes(e(sig), bands, rowsPerBand))

  /** 64-bit SimHash of the whitespace-token multiset. */
  def simhash64(text: Column): Column =
    c(expressions.SimHash64(e(text)))

  /** Order-sensitive rolling token-hash fingerprint. */
  def rolling_fingerprint(text: Column): Column =
    c(expressions.RollingFingerprint(e(text)))

  /** Order-insensitive content fingerprint (min hashed shingle). */
  def content_fingerprint(text: Column, n: Int): Column =
    c(expressions.ContentFingerprint(e(text), n))

  /** Exact Jaccard similarity of two sorted hashed shingle sets. */
  def jaccard_sorted(a: Column, b: Column): Column =
    c(expressions.JaccardSorted(e(a), e(b)))

  /** Dot product of two numeric array columns (double precision). */
  def vec_dot(a: Column, b: Column): Column =
    c(expressions.VecDot(e(a), e(b)))

  /** One-pass text-quality counts struct
    * (`n_chars, n_tokens, n_punct, n_digits, n_upper, n_stopwords`).
    */
  def text_metrics(text: Column): Column =
    c(expressions.TextMetricsCounts(e(text)))

  /** Multi-table hyperplane-LSH bucket keys (`numTables` tagged longs). */
  def lsh_keys(vec: Column, dim: Int, numPlanes: Int, numTables: Int): Column =
    c(expressions.LshKeys(e(vec), dim, numPlanes, numTables))

  /** One-pass whitespace canonicalization (controls→space, collapse, trim). */
  def clean_whitespace(text: Column): Column =
    c(expressions.CleanWhitespace(e(text)))

  /** Unicode NFC canonical composition (no-alloc passthrough when already
    * normalized).
    */
  def nfc_normalize(text: Column): Column =
    c(expressions.NfcNormalize(e(text)))

  /** One-pass stopword-based language ID ("und" when nothing matches). */
  def lang_id(text: Column): Column =
    c(expressions.LangId(e(text)))

  /** One-pass BPE-ish (GPT-2 pretokenizer) token count. */
  def bpe_token_count(text: Column): Column =
    c(expressions.BpeTokenCount(e(text)))

  /** Vocab-merge BPE token count (greedy merge-rank application over
    * the default code-literal table; custom vocabularies go through
    * `TextStats.bpeCustomCounts`'s broadcast path).
    */
  def bpe_merge_count(text: Column): Column =
    c(expressions.BpeMergeCount(e(text)))

  /** `{n_feats, wsum}` of the md5-bucketed hashed-linear classifier fold
    * (unigrams + bigrams mod `dim`, micro-scaled Knuth weights).
    */
  def hashed_linear(text: Column, dim: Long): Column =
    c(expressions.HashedLinearFold(e(text), dim))

  /** `{n_candidates, n_valid}` of the Luhn payment-card scan. */
  def luhn_stats(text: Column): Column =
    c(expressions.LuhnStats(e(text)))

  /** Luhn-valid 13–19-digit runs masked to `<CC>`. */
  def mask_luhn(text: Column): Column =
    c(expressions.MaskLuhn(e(text)))

  /** PSL registrable domain of a lowercased host (null for bare public
    * suffixes); rules from [[Psl.rules]].
    */
  def psl_registrable_domain(host: Column): Column =
    c(expressions.PslRegistrableDomain(e(host)))

  /** PSL public suffix of a lowercased host. */
  def psl_public_suffix(host: Column): Column =
    c(expressions.PslPublicSuffix(e(host)))

  /** Fingerprint of the evaluating JVM's active PSL rule set (executor
    * side of the driver/executor agreement check; non-foldable).
    */
  def psl_fingerprint(): Column =
    c(expressions.PslFingerprint())

  /** Deflate compression ratio (compressed/raw UTF-8 bytes, 6 dp). */
  def compression_ratio(text: Column): Column =
    c(expressions.CompressionRatio(e(text)))

  /** Distinct word-n-gram shingle strings (unhashed, SQL-reproducible). */
  def shingle_string_set(text: Column, n: Int): Column =
    c(expressions.ShingleStringSet(e(text), n))

  /** Symmetric int8 quantization: struct(scale, q array<tinyint>). */
  def quantize_int8(vec: Column): Column =
    c(expressions.QuantizeInt8(e(vec)))

  /** Exact int64 dot product of two int8 code arrays. */
  def vec_dot_int8(a: Column, b: Column): Column =
    c(expressions.VecDotInt8(e(a), e(b)))

  /** Aggregate: element-wise min of MinHash signatures = the signature of
    * the group's union (for group-vs-group Jaccard estimation).
    */
  def minhash_union(sig: Column, k: Int): Column =
    c(MinHashUnionAgg(e(sig), k).toAggregateExpression())

  /** Estimated Jaccard between two MinHash signatures: fraction of
    * agreeing positions.
    */
  def minhash_agreement(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{size => asize, _}
    round(
      asize(org.apache.spark.sql.functions.filter(
        zip_with(a, b, (x, y) => x === y), p => p))
        .cast("double") / asize(a), 6)
  }

  private[functions] def intLitArg(ex: Expression): Int = ex match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected integer literal argument, got $other")
  }

  /** The single name → expression-builder table both registration paths
    * ([[registerSql]] and [[GraftExtensions]]) consume — one list, no
    * drift between live-session and config-built SQL surfaces.
    */
  private[functions] val sqlFunctionBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_shingle_hash_set" ->
      ((args: Seq[Expression]) => expressions.ShingleHashSet(args(0), intLitArg(args(1)))),
    "graft_minhash_signature" ->
      ((args: Seq[Expression]) => expressions.MinhashSignature(args(0), intLitArg(args(1)))),
    "graft_band_hashes" ->
      ((args: Seq[Expression]) => expressions.BandHashes(args(0), intLitArg(args(1)), intLitArg(args(2)))),
    "graft_simhash64" ->
      ((args: Seq[Expression]) => expressions.SimHash64(args(0))),
    "graft_rolling_fingerprint" ->
      ((args: Seq[Expression]) => expressions.RollingFingerprint(args(0))),
    "graft_content_fingerprint" ->
      ((args: Seq[Expression]) => expressions.ContentFingerprint(args(0), intLitArg(args(1)))),
    "graft_jaccard_sorted" ->
      ((args: Seq[Expression]) => expressions.JaccardSorted(args(0), args(1))),
    "graft_vec_dot" ->
      ((args: Seq[Expression]) => expressions.VecDot(args(0), args(1))),
    "graft_text_metrics" ->
      ((args: Seq[Expression]) => expressions.TextMetricsCounts(args(0))),
    "graft_lang_id" ->
      ((args: Seq[Expression]) => expressions.LangId(args(0))),
    "graft_clean_whitespace" ->
      ((args: Seq[Expression]) => expressions.CleanWhitespace(args(0))),
    "graft_nfc_normalize" ->
      ((args: Seq[Expression]) => expressions.NfcNormalize(args(0))),
    "graft_bpe_token_count" ->
      ((args: Seq[Expression]) => expressions.BpeTokenCount(args(0))),
    "graft_bpe_merge_count" ->
      ((args: Seq[Expression]) => expressions.BpeMergeCount(args(0))),
    "graft_compression_ratio" ->
      ((args: Seq[Expression]) => expressions.CompressionRatio(args(0))),
    "graft_shingle_string_set" ->
      ((args: Seq[Expression]) => expressions.ShingleStringSet(args(0), intLitArg(args(1)))),
    "graft_quantize_int8" ->
      ((args: Seq[Expression]) => expressions.QuantizeInt8(args(0))),
    "graft_vec_dot_int8" ->
      ((args: Seq[Expression]) => expressions.VecDotInt8(args(0), args(1))),
    "graft_lsh_keys" ->
      ((args: Seq[Expression]) => expressions.LshKeys(
        args(0), intLitArg(args(1)), intLitArg(args(2)), intLitArg(args(3)))),
    "graft_hashed_linear" ->
      ((args: Seq[Expression]) => expressions.HashedLinearFold(args(0), intLitArg(args(1)).toLong)),
    "graft_luhn_stats" ->
      ((args: Seq[Expression]) => expressions.LuhnStats(args(0))),
    "graft_mask_luhn" ->
      ((args: Seq[Expression]) => expressions.MaskLuhn(args(0))),
    "graft_minhash_union" ->
      ((args: Seq[Expression]) => MinHashUnionAgg(args(0), intLitArg(args(1))).toAggregateExpression()))

  /** Make the functions SQL-callable on an already-built session
    * (`SELECT graft_simhash64(text) FROM docs`). For sessions built from
    * config, `spark.sql.extensions=graft.functions.GraftExtensions` does
    * the same at build time.
    */
  def registerSql(spark: SparkSession): Unit =
    sqlFunctionBuilders.foreach { case (name, builder) =>
      ColumnShim.register(spark, name, builder)
    }
}
