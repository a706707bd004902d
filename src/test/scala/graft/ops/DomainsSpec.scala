package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DomainsSpec extends SparkSpec {
  import spark.implicits._

  test("urlHost: lowercased host; null for null/hostless") {
    val got = Seq(
      "https://WWW.Example.COM/path?q=1",
      "http://sub.host.co.uk/",
      // legal trailing-dot FQDN — must fold into its dotless twin, not
      // split the host group or derail the suffix rule into bare "com."
      "https://Example.COM./x",
      "not a url",
      null: String)
      .toDF("url")
      .select(Domains.urlHost(col("url")).as("h"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("www.example.com"), Some("sub.host.co.uk"),
      Some("example.com"), None, None))
  }

  test("registrableDomain: full PSL algorithm — exact, wildcard, exception, private, default") {
    val cases: Seq[(String, Option[String])] = Seq(
      "www.example.com" -> Some("example.com"),
      "a.b.site.co.uk" -> Some("site.co.uk"),      // exact multi-label rule
      "example.com" -> Some("example.com"),
      "sub.x.com.au" -> Some("x.com.au"),          // .com.au exact rule
      "user.github.io" -> Some("user.github.io"),  // private-section rule
      "pages.user.github.io" -> Some("user.github.io"),
      "a.b.ck" -> Some("a.b.ck"),                  // *.ck wildcard: b.ck is the suffix
      "b.ck" -> None,                              // bare wildcard suffix → no registrant
      "www.ck" -> Some("www.ck"),                  // !www.ck exception
      "x.city.kawasaki.jp" -> Some("city.kawasaki.jp"), // !city exception under *.kawasaki.jp
      "other.kawasaki.jp" -> None,                 // wildcard suffix itself
      "foo.zz" -> Some("foo.zz"),                  // unlisted TLD → default rule
      "deep.sub.tree.example.org" -> Some("example.org"),
      "localhost" -> None,                         // bare label IS the default suffix
      "com" -> None)
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), Domains.registrableDomain(col("host")).as("d"),
        Domains.publicSuffix(col("host")).as("s"))
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> r._2).toMap
    cases.foreach { case (h, want) => assert(got(h) == want, s"$h → ${got(h)}, want $want") }
    // null passthrough
    val n = Seq(null: String).toDF("host")
      .select(Domains.registrableDomain(col("host"))).as[Option[String]].collect()
    assert(n.toSeq == Seq(None))
  }

  test("registrableDomainLite fallback: subset rule, short hosts pass through") {
    val cases = Seq(
      "www.example.com" -> "example.com",
      "a.b.site.co.uk" -> "site.co.uk",
      "example.com" -> "example.com",
      "localhost" -> "localhost",          // lite passthrough (PSL form → null)
      "deep.sub.tree.example.org" -> "example.org")
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), Domains.registrableDomainLite(col("host")).as("d"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) => assert(got(h) == want, s"$h → ${got(h)}, want $want") }
  }

  test("Psl parser: full upstream format — comments, sections, wildcard and exception prefixes") {
    val r = graft.functions.Psl.parse(Seq(
      "// comment", "", "com", "co.uk", "*.ck", "!www.ck",
      "  padded.example  ", "UPPER.CASE").iterator)
    assert(r.exact.contains("com") && r.exact.contains("co.uk"))
    assert(r.exact.contains("padded.example") && r.exact.contains("upper.case"))
    assert(r.wildcardParents.contains("ck") && r.exceptions.contains("www.ck"))
    assert(r.maxLabels == 2)
    // embedded resource loads and carries all three rule classes
    val emb = graft.functions.Psl.rules
    assert(emb.exact.size > 100 && !emb.wildcardParents.isEmpty && !emb.exceptions.isEmpty)
  }

  test("normalizeUrl: canonical dedup key — case, port, fragment, tracking params, param order") {
    val cases = Seq(
      // every messy axis at once
      "HTTPS://WWW.Site.COM:443/Path/X?utm_source=a&b=2&a=1#frag" ->
        "https://www.site.com/Path/X?a=1&b=2",
      // http default port; path case preserved
      "HTTP://host.org:80/CaseSensitive" -> "http://host.org/CaseSensitive",
      // non-default port kept
      "https://host.org:8443/x" -> "https://host.org:8443/x",
      // all params tracking → no '?'
      "https://h.co/p?utm_campaign=x&gclid=1&ref=z" -> "https://h.co/p",
      // stable when already canonical (idempotent on its own output)
      "https://h.co/p?a=1&b=2" -> "https://h.co/p?a=1&b=2",
      // non-URL degrades to input-minus-fragment, never null
      "not a url#x" -> "not a url")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Domains.normalizeUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"$in → ${got(in)}") }
    // null passthrough
    val n = Seq(null: String).toDF("url")
      .select(Domains.normalizeUrl(col("url"))).as[Option[String]].collect()
    assert(n.toSeq == Seq(None))
  }

  test("psl fingerprint: executor expression agrees with driver rules; frame carries source") {
    import graft.functions.Psl
    // the task-evaluated expression must yield exactly the driver-side
    // fingerprint (the agreement check production jobs run)
    val distinctFp = spark.range(64).repartition(8)
      .select(graft.functions.psl_fingerprint().as("fp"))
      .distinct().as[String].collect().toSeq
    assert(distinctFp == Seq(Psl.rules.fingerprint))
    // non-foldable: the plan must NOT constant-fold it away on the driver
    val analyzed = spark.range(1)
      .select(graft.functions.psl_fingerprint()).queryExecution.optimizedPlan
    assert(analyzed.toString.contains("graft_psl_fingerprint"))
    // frame metadata: constant source + fingerprint columns on every row
    val meta = Domains.pslRulesFrame(spark)
      .select("source", "fingerprint").distinct().as[(String, String)].collect()
    assert(meta.length == 1)
    assert(meta.head._1 == Psl.rules.source && meta.head._2 == Psl.rules.fingerprint)
    // fingerprint tracks content: a different rule set fingerprints differently
    val other = Psl.parse(Iterator("com", "co.uk"), "test")
    assert(other.fingerprint != Psl.rules.fingerprint)
    assert(other.fingerprint.startsWith("2-"))
  }

  test("domainProfile: counts docs and distinct hosts per registrable domain") {
    val docs = Seq(
      "https://www.a.com/1", "https://a.com/2", "https://b.a.com/3",
      "https://x.co.uk/1", "https://www.x.co.uk/2",
      null: String)
      .toDF("url")
    val got = Domains.domainProfile(docs, "url")
      .as[(String, Long, Long)].collect()
      .map { case (d, nd, nh) => d -> ((nd, nh)) }.toMap
    assert(got == Map("a.com" -> ((3L, 3L)), "x.co.uk" -> ((2L, 2L))))
  }
}
