package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain operators for web-corpus curation: host extraction and
  * registrable-domain grouping — the keys behind per-domain quotas,
  * blocklists, and source-mix profiles in every large crawl pipeline.
  * All pure column expressions (codegen'd built-ins), shuffle-free until
  * the caller aggregates.
  */
object Domains {

  /** Multi-label public suffixes the EXPRESSION-ONLY fallback rule
    * ([[registrableDomainLite]]) recognizes — a tiny subset for callers
    * that must stay on pure built-in expressions (e.g. a DuckDB-mirrored
    * differential check). The canonical path is [[registrableDomain]],
    * which runs the full PSL algorithm (wildcards + exceptions) over the
    * file-driven rule set in [[graft.functions.Psl]].
    */
  val MultiLabelSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "org.uk", "co.jp", "com.au", "com.br", "co.in")

  /** Lowercased host of a URL via Spark's native `try_parse_url`; null
    * for null, hostless, or MALFORMED inputs — the strict `parse_url`
    * throws on the first bad URL, which at corpus scale means one
    * mangled crawl record kills the job. A trailing root-label dot
    * (`example.com.` — legal FQDN form) is stripped: left in place it
    * would both split the host from its dotless twin AND derail the
    * suffix rule below into a bare `com.` registrable domain.
    */
  def urlHost(url: Column): Column =
    regexp_replace(lower(try_parse_url(url, lit("HOST"))), "\\.$", "")

  /** Registrable domain of a lowercased host under the full Public
    * Suffix List algorithm ([[graft.functions.Psl]]): public suffix plus
    * one label, with wildcard (`*.ck`) and exception (`!www.ck`) rules
    * honored; null when the host is itself a public suffix. Rule data is
    * the embedded PSL snapshot unless a full list file is loaded
    * (`Psl.loadFile` / `-Dgraft.psl.path`). A codegen'd hash-set lookup
    * per host — no join, no broadcast of rule literals into the plan.
    * IPs and ports are out of scope (crawl frontiers canonicalize those
    * upstream).
    */
  def registrableDomain(host: Column): Column =
    graft.functions.psl_registrable_domain(host)

  /** The prevailing PSL public suffix of a lowercased host. */
  def publicSuffix(host: Column): Column =
    graft.functions.psl_public_suffix(host)

  /** Expression-only FALLBACK registrable-domain rule: last two labels,
    * or last three when the last two are a listed multi-label suffix
    * ([[MultiLabelSuffixes]]); hosts with ≤ 2 labels pass through —
    * including bare suffixes, which the PSL form maps to null. Kept for
    * differential checks and for callers that cannot carry the kernel.
    */
  def registrableDomainLite(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(host.isNull, lit(null).cast("string"))
      .when(n <= 2, host)
      .when(last2.isin(MultiLabelSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** The active PSL rule set as a DataFrame `(kind, pattern, source,
    * fingerprint)` — kind ∈ exact|wildcard|exception, wildcard stored as
    * its parent suffix; `source`/`fingerprint` are constant across rows
    * and identify WHICH rule set the driver resolved
    * ([[graft.functions.Psl.Rules.fingerprint]]), so a production job
    * can assert executor agreement:
    * `df.select(graft.functions.psl_fingerprint()).distinct()` must
    * equal this frame's `fingerprint`. Verify dumps this so the DuckDB
    * oracle replays the SAME rules the engine resolved (embedded or
    * file-driven).
    */
  def pslRulesFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val r = graft.functions.Psl.rules
    val rows =
      r.exact.asScala.toSeq.sorted.map(("exact", _)) ++
      r.wildcardParents.asScala.toSeq.sorted.map(("wildcard", _)) ++
      r.exceptions.asScala.toSeq.sorted.map(("exception", _))
    import spark.implicits._
    rows.toDF("kind", "pattern")
      .withColumn("source", lit(r.source))
      .withColumn("fingerprint", lit(r.fingerprint))
  }

  /** Tracking query parameters stripped by [[normalizeUrl]] — the
    * standard crawl-canonicalization set (marketing attribution params
    * carry no content identity).
    */
  private val TrackingParamPattern = "^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)="

  /** Canonical URL for exact dedup keys: fragment stripped,
    * scheme+authority lowercased, default ports (:80 http / :443 https)
    * dropped, tracking params removed, surviving query params SORTED so
    * param order never splits a dedup group. Path case and trailing
    * slashes are preserved (paths are case-significant on most servers).
    *
    * Built entirely from regexp/array primitives — NOT `parse_url` — so
    * the DuckDB oracle replays every step with the same semantics;
    * non-URL input degrades to (input minus fragment) rather than null,
    * and nulls pass through. One codegen'd projection, shuffle-free.
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val prefix = regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val rest = substr(noFrag, length(prefix) + lit(1), lit(1000000))
    val lp = regexp_replace(
      regexp_replace(lower(prefix), "^(http://[^/:]*):80$", "$1"),
      "^(https://[^/:]*):443$", "$1")
    val qpos = instr(rest, "?")
    val path = when(qpos > 0, substr(rest, lit(1), qpos - 1)).otherwise(rest)
    val q = when(qpos > 0, substr(rest, qpos + 1, lit(1000000))).otherwise(lit(""))
    val params = filter(split(q, "&"),
      x => x =!= "" && !x.rlike(TrackingParamPattern))
    val canq = array_join(array_sort(params), "&")
    when(url.isNull, lit(null).cast("string"))
      .otherwise(concat(lp, path,
        when(canq === "", lit("")).otherwise(concat(lit("?"), canq))))
  }

  /** Per-registrable-domain corpus profile: document count and distinct
    * host count. One shuffle on the domain key (partial-aggregated
    * map-side); the distinct-host count shuffles (domain, host) pairs —
    * bounded by distinct hosts, not documents.
    */
  def domainProfile(df: DataFrame, urlCol: String): DataFrame = {
    val host = urlHost(col(urlCol))
    df.filter(col(urlCol).isNotNull)
      .select(host.as("host"))
      .filter(col("host").isNotNull)
      .select(registrableDomain(col("host")).as("domain"), col("host"))
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"))
  }
}
