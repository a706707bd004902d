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

  test("registrableDomain: PSL rule on the listed suffixes, short hosts pass through") {
    val cases = Seq(
      "www.example.com" -> "example.com",
      "a.b.site.co.uk" -> "site.co.uk",   // multi-label suffix → 3 labels
      "example.com" -> "example.com",      // 2 labels pass through
      "localhost" -> "localhost",          // 1 label passes through
      "deep.sub.tree.example.org" -> "example.org")
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), Domains.registrableDomain(col("host")).as("d"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) => assert(got(h) == want, s"$h → ${got(h)}, want $want") }
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
