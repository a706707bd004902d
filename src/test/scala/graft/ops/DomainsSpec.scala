package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DomainsSpec extends SparkSpec {
  import spark.implicits._

  test("urlHost: lowercased host; null for null/hostless") {
    val got = Seq(
      "https://WWW.Example.COM/path?q=1",
      "http://sub.host.co.uk/",
      "not a url",
      null: String)
      .toDF("url")
      .select(Domains.urlHost(col("url")).as("h"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("www.example.com"), Some("sub.host.co.uk"), None, None))
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
