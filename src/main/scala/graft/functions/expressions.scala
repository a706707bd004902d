package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, LeafExpression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions over the [[TextKernels]] kernels.
  *
  * These replace the Scala-UDF wrappers: a UDF forces
  * catalyst-to-Scala conversion of every input/output and breaks
  * whole-stage codegen at its boundary; these expressions generate a
  * direct static call into the kernel inside the produced Java, so the
  * surrounding projection stays one codegen'd stage and the only cost is
  * the kernel itself. Interpreted `eval` paths are provided for
  * completeness (codegen fallback, filters on literals, etc.).
  */
object expressions {

  private val K = "graft.functions.TextKernels"

  /** Hashed word-n-gram shingle set (sorted, distinct). */
  case class ShingleHashSet(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_hash_set"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.shingleHashSetArray(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.shingleHashSetArray($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
      copy(child = newChild)
  }

  /** MinHash signature of a hashed shingle set; null for empty sets. */
  case class MinhashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_minhash_signature"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.minhashSignatureArray(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = $K.minhashSignatureArray($c, $k);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
           |""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
      copy(child = newChild)
  }

  /** LSH band hashes of a MinHash signature; null when the signature is
    * shorter than bands·rowsPerBand.
    */
  case class BandHashes(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_band_hashes"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.bandHashesArray(input.asInstanceOf[ArrayData], bands, rowsPerBand)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = $K.bandHashesArray($c, $bands, $rowsPerBand);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
           |""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): BandHashes =
      copy(child = newChild)
  }

  /** 64-bit SimHash of the whitespace-token multiset; null for zero-token
    * text (see [[TextKernels.simhash64]] — avoids the degenerate shared
    * bucket for empty docs).
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_simhash64"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.simhash64U(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("sh")
        s"""java.lang.Long $tmp = $K.simhash64U($c);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.longValue(); }
           |""".stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Order-sensitive rolling token-hash fingerprint. */
  case class RollingFingerprint(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_rolling_fingerprint"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.rollingFingerprintU(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.rollingFingerprintU($c)")
    override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
      copy(child = newChild)
  }

  /** Order-insensitive content fingerprint (min hashed shingle). */
  case class ContentFingerprint(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_content_fingerprint"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.contentFingerprintU(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.contentFingerprintU($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): ContentFingerprint =
      copy(child = newChild)
  }

  /** All text-quality counts in one kernel pass
    * ([[TextKernels.textMetrics]]): a struct of
    * `n_chars, n_tokens, n_punct, n_digits, n_upper, n_stopwords` longs.
    * The ratio/score arithmetic stays declarative ON TOP of this struct
    * (see `TextStats.qualityMetrics`), so rounding is Spark's own
    * `round` — only the O(len) regex scans are replaced.
    */
  case class TextMetricsCounts(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = TextMetricsCounts.schema
    override def prettyName: String = "graft_text_metrics"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.textMetricsRow(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.textMetricsRow($c)")
    override protected def withNewChildInternal(newChild: Expression): TextMetricsCounts =
      copy(child = newChild)
  }

  object TextMetricsCounts {
    val schema: StructType = StructType(
      Seq("n_chars", "n_tokens", "n_punct", "n_digits", "n_upper", "n_stopwords")
        .map(StructField(_, LongType, nullable = false)))
  }

  /** Distinct word-n-gram shingle strings (first-occurrence order) —
    * the unhashed, SQL-reproducible twin of [[ShingleHashSet]].
    */
  case class ShingleStringSet(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_shingle_string_set"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.shingleStringSetArray(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.shingleStringSetArray($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShingleStringSet =
      copy(child = newChild)
  }

  /** Deflate compression ratio of the UTF-8 bytes
    * ([[TextKernels.compressionRatio]]) — the cheap repetition/quality
    * signal; deterministic at fixed level, rounded to 6 dp in-kernel.
    */
  case class CompressionRatio(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_compression_ratio"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.compressionRatioU(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.compressionRatioU($c)")
    override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
      copy(child = newChild)
  }

  /** One-pass BPE-ish pretokenizer match count
    * ([[TextKernels.bpeTokenCount]]) — replaces a `regexp_count` over the
    * GPT-2-style alternation.
    */
  case class BpeTokenCount(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bpe_token_count"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.bpeTokenCountU(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.bpeTokenCountU($c)")
    override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
      copy(child = newChild)
  }

  /** Vocab-merge BPE token count over the default merge-rank table
    * ([[TextKernels.bpeMergeCount]]): pre-tokenize, then greedy
    * lowest-rank-leftmost pair merging per word — real merge-table BPE
    * accounting (not just the pre-tokenizer proxy), still inside
    * whole-stage codegen.
    */
  case class BpeMergeCount(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bpe_merge_count"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.bpeMergeCountU(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.bpeMergeCountU($c)")
    override protected def withNewChildInternal(newChild: Expression): BpeMergeCount =
      copy(child = newChild)
  }

  /** One-pass hashed-linear classifier fold
    * ([[TextKernels.hashedLinearRow]]): `{n_feats, wsum}` of the
    * md5-bucketed unigram+bigram feature weights. The logit/label
    * arithmetic stays declarative on top (`TextStats.classifierScore`).
    */
  case class HashedLinearFold(child: Expression, dim: Long)
      extends UnaryExpression {
    require(dim > 0, s"dim must be positive: $dim")
    override def dataType: DataType = HashedLinearFold.schema
    override def prettyName: String = "graft_hashed_linear"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.hashedLinearRow(input.asInstanceOf[UTF8String], dim)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.hashedLinearRow($c, ${dim}L)")
    override protected def withNewChildInternal(newChild: Expression): HashedLinearFold =
      copy(child = newChild)
  }

  object HashedLinearFold {
    val schema: StructType = StructType(Seq(
      StructField("n_feats", LongType, nullable = false),
      StructField("wsum", LongType, nullable = false)))
  }

  /** Per-document payment-card scan ([[TextKernels.luhnStatsRow]]):
    * `{n_candidates, n_valid}` over maximal ASCII digit runs of length
    * 13–19, Luhn-checked.
    */
  case class LuhnStats(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LuhnStats.schema
    override def prettyName: String = "graft_luhn_stats"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.luhnStatsRow(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.luhnStatsRow($c)")
    override protected def withNewChildInternal(newChild: Expression): LuhnStats =
      copy(child = newChild)
  }

  object LuhnStats {
    val schema: StructType = StructType(Seq(
      StructField("n_candidates", LongType, nullable = false),
      StructField("n_valid", LongType, nullable = false)))
  }

  /** Luhn-validated card masking ([[TextKernels.maskLuhnU]]): valid
    * 13–19-digit runs → `<CC>`, everything else untouched.
    */
  case class MaskLuhn(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_mask_luhn"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.maskLuhnU(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.maskLuhnU($c)")
    override protected def withNewChildInternal(newChild: Expression): MaskLuhn =
      copy(child = newChild)
  }

  /** One-pass whitespace canonicalization
    * ([[TextKernels.cleanWhitespace]]): controls → space, runs collapsed,
    * edges trimmed. Replaces three regexp_replace passes.
    */
  case class CleanWhitespace(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_clean_whitespace"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.cleanWhitespaceU(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.cleanWhitespaceU($c)")
    override protected def withNewChildInternal(newChild: Expression): CleanWhitespace =
      copy(child = newChild)
  }

  /** Unicode NFC canonical composition
    * ([[TextKernels.nfcNormalizeU]]) — allocation-free passthrough for
    * already-normalized text.
    */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_nfc_normalize"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.nfcNormalizeU(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.nfcNormalizeU($c)")
    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
  }

  /** PSL registrable domain ([[Psl.registrableDomain]]): public suffix
    * plus one label under the active Public Suffix List rules (wildcard
    * and exception rules included); null when the host IS a public
    * suffix. Hash-set lookup per label suffix — no join.
    */
  case class PslRegistrableDomain(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_psl_registrable_domain"
    override protected def nullSafeEval(input: Any): Any =
      Psl.registrableDomainU(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.functions.Psl.registrableDomainU($c);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
           |""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): PslRegistrableDomain =
      copy(child = newChild)
  }

  /** PSL public suffix ([[Psl.publicSuffix]]) of a lowercased host. */
  case class PslPublicSuffix(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_psl_public_suffix"
    override protected def nullSafeEval(input: Any): Any =
      Psl.publicSuffixU(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.functions.Psl.publicSuffixU($c);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
           |""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): PslPublicSuffix =
      copy(child = newChild)
  }

  /** Fingerprint of the EVALUATING JVM's active PSL rule set
    * ([[Psl.Rules.fingerprint]]). Marked [[Nondeterministic]] — the same
    * treatment Spark gives its environment-dependent leaves
    * (SparkPartitionID, InputFileName): the value depends on WHICH JVM
    * evaluates it, and its whole point is to run inside executor tasks
    * so a production job can assert driver/executor rule agreement —
    * `df.select(psl_fingerprint()).distinct()` must yield exactly the
    * driver's `Psl.rules.fingerprint`, or some executor JVM resolved
    * different rules (e.g. `-Dgraft.psl.path` visible only to the
    * driver) and is silently computing divergent registrable domains.
    * `foldable=false` alone is NOT enough: optimizer rules that evaluate
    * deterministic projections driver-side (ConvertToLocalRelation over
    * a `Seq(...).toDF`) would still compute it on the driver and make
    * the agreement check vacuous for local-relation inputs.
    */
  case class PslFingerprint() extends LeafExpression with Nondeterministic {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_psl_fingerprint"
    override protected def initializeInternal(partitionIndex: Int): Unit = ()
    override protected def evalInternal(input: InternalRow): Any = Psl.fingerprintU()
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      ev.copy(
        code = code"UTF8String ${ev.value} = graft.functions.Psl.fingerprintU();",
        isNull = FalseLiteral)
  }

  /** One-pass language ID ([[TextKernels.langId]]): the language with the
    * most stopword hits, "und" when none match. Replaces five
    * `regexp_count` scans (one per language) per row.
    */
  case class LangId(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_lang_id"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.langIdU(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.langIdU($c)")
    override protected def withNewChildInternal(newChild: Expression): LangId =
      copy(child = newChild)
  }

  /** Multi-table LSH bucket keys of an embedding vector in one kernel pass
    * ([[VecKernels.lshKeys]]): `numTables` longs, bit p of table t's
    * bucket = sign of the vector's projection on pseudo-random hyperplane
    * t·numPlanes+p (SplitMix64-derived inside the kernel). Replaces the
    * literal-plane-array formulation whose m·L·dim constant doubles made
    * plans untruncatable and risked codegen fallback.
    */
  case class LshKeys(child: Expression, dim: Int, numPlanes: Int, numTables: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_lsh_keys"
    private def isFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires an array<float|double> argument, got ${other.simpleString}")
      }
    override protected def nullSafeEval(input: Any): Any =
      VecKernels.lshKeysArray(
        input.asInstanceOf[ArrayData], isFloat, dim, numPlanes, numTables)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.VecKernels.lshKeysArray($c, $isFloat, $dim, $numPlanes, $numTables)")
    override protected def withNewChildInternal(newChild: Expression): LshKeys =
      copy(child = newChild)
  }

  /** Symmetric int8 quantization of a float/double vector
    * ([[VecKernels.quantizeInt8]]): struct(scale double, q array<tinyint>).
    */
  case class QuantizeInt8(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = QuantizeInt8.schema
    override def prettyName: String = "graft_quantize_int8"
    private def isFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires an array<float|double> argument, got ${other.simpleString}")
      }
    override protected def nullSafeEval(input: Any): Any =
      VecKernels.quantizeInt8Row(input.asInstanceOf[ArrayData], isFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.quantizeInt8Row($c, $isFloat)")
    override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
      copy(child = newChild)
  }

  object QuantizeInt8 {
    val schema: StructType = StructType(Seq(
      StructField("scale", DoubleType, nullable = false),
      StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))
  }

  /** Dot product of two numeric array columns (float or double elements),
    * in sequential double precision; null when inputs or any consumed
    * element are null.
    */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_vec_dot"
    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    private def supported(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    // analysis-time rejection: without this, wrong element types would
    // surface as executor-side failures instead of an AnalysisException
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (supported(left) && supported(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    override protected def nullSafeEval(a: Any, b: Any): Any =
      VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isFloat(left), isFloat(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("dotv")
        s"""java.lang.Double $tmp = graft.functions.VecKernels.dot($a, $b, ${isFloat(left)}, ${isFloat(right)});
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecDot =
      copy(left = newLeft, right = newRight)
  }

  /** Exact int64 dot product of two int8 code arrays
    * ([[VecKernels.dotInt8]]) — compressed-domain inner product.
    */
  case class VecDotInt8(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_vec_dot_int8"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<tinyint> arguments, got ${l.simpleString} and ${r.simpleString}")
      }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      VecKernels.dotInt8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.dotInt8($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecDotInt8 =
      copy(left = newLeft, right = newRight)
  }

  /** Exact Jaccard of two sorted long arrays; null when both empty. */
  case class JaccardSorted(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_jaccard_sorted"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      TextKernels.jaccardSortedArrays(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("jac")
        s"""java.lang.Double $tmp = $K.jaccardSortedArrays($a, $b);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaccardSorted =
      copy(left = newLeft, right = newRight)
  }

  /** Bloom membership probe against a BROADCAST serialized sketch.
    *
    * The built-in `BloomFilterMightContain` requires its sketch side as a
    * foldable expression, i.e. the serialized filter rides the PLAN as a
    * binary Literal — a ~MB sketch then bloats every explain/plan
    * canonicalization and is re-shipped inside each task binary. Holding a
    * `Broadcast[Array[Byte]]` handle instead serializes as a tiny
    * broadcast id in the task closure; executors fetch the sketch once
    * via the broadcast machinery and deserialize it lazily per task
    * (transient lazy val). Child is the 64-bit hash of the probed value
    * (xxhash64 — the same hash the aggregate ingested).
    */
  case class BloomMightContainBroadcast(
      bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]],
      child: Expression) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_bloom_might_contain_bcast"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a LONG hash child, got ${child.dataType.simpleString}")
    @transient private lazy val filter =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloom.value))
    def mightContain(h: Long): Boolean = filter.mightContainLong(h)
    override protected def nullSafeEval(h: Any): Any =
      mightContain(h.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomMC", this,
        classOf[BloomMightContainBroadcast].getName)
      nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.mightContain($h);")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomMightContainBroadcast =
      copy(child = newChild)
  }
}
