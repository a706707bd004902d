package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Config-time registration of the engine's SQL functions:
  * `spark.sql.extensions=graft.functions.GraftExtensions` makes every
  * `graft_*` function available to pure-SQL users at session build —
  * the standard Catalyst-extension deployment path. For sessions that
  * already exist, [[functions.registerSql]] does the same imperatively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(ex: Expression): Int = ex match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected integer literal argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.JaccardLengthFilter)
    def info(name: String) = new ExpressionInfo("graft.functions.expressions", name)
    ext.injectFunction((FunctionIdentifier("graft_shingle_hash_set"),
      info("graft_shingle_hash_set"),
      (args: Seq[Expression]) => expressions.ShingleHashSet(args(0), intLit(args(1)))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_signature"),
      info("graft_minhash_signature"),
      (args: Seq[Expression]) => expressions.MinhashSignature(args(0), intLit(args(1)))))
    ext.injectFunction((FunctionIdentifier("graft_band_hashes"),
      info("graft_band_hashes"),
      (args: Seq[Expression]) => expressions.BandHashes(args(0), intLit(args(1)), intLit(args(2)))))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64"),
      (args: Seq[Expression]) => expressions.SimHash64(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_rolling_fingerprint"),
      info("graft_rolling_fingerprint"),
      (args: Seq[Expression]) => expressions.RollingFingerprint(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_content_fingerprint"),
      info("graft_content_fingerprint"),
      (args: Seq[Expression]) => expressions.ContentFingerprint(args(0), intLit(args(1)))))
    ext.injectFunction((FunctionIdentifier("graft_jaccard_sorted"),
      info("graft_jaccard_sorted"),
      (args: Seq[Expression]) => expressions.JaccardSorted(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_vec_dot"),
      info("graft_vec_dot"),
      (args: Seq[Expression]) => expressions.VecDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_union"),
      info("graft_minhash_union"),
      (args: Seq[Expression]) =>
        MinHashUnionAgg(args(0), intLit(args(1))).toAggregateExpression()))
  }
}
