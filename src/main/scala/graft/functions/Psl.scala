package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Public Suffix List lookup — the standard registrable-domain algorithm
  * (https://publicsuffix.org/list/) over a rule file in the upstream
  * format: exact rules (`co.uk`), wildcard rules (`*.ck` — any single
  * label under the parent is a public suffix), and exception rules
  * (`!www.ck` — overrides a matching wildcard; the public suffix is the
  * rule minus its leftmost label). The prevailing match is the exception
  * if one matches, else the matching rule with the most labels, else the
  * implicit default rule `*` (the last label alone). The registrable
  * domain is the public suffix plus one more label — null when the host
  * IS a public suffix (a bare `com` / `co.uk` / `github.io` host has no
  * registrant).
  *
  * Rule data: an embedded SUBSET snapshot of the upstream file ships as a
  * resource (`graft/public_suffix_list.dat`) and is the fallback;
  * production deployments load the full current list FILE-DRIVEN via
  * [[loadFile]] or `-Dgraft.psl.path=…` (checked once at first use). The
  * parser accepts the full upstream file unchanged. On a cluster the
  * resource loads per executor JVM from the application jar; a
  * file-driven path must be visible to executors (`--files` / shared FS).
  *
  * Hosts are expected LOWERCASED with no trailing root dot (what
  * [[graft.ops.Domains.urlHost]] emits). IDN labels match only in the
  * form the rules are written in (the upstream list is punycode).
  *
  * Lookup cost is O(labels²) character work per host against three
  * read-only hash sets — no join, no shuffle, stays inside whole-stage
  * codegen via the `psl_*` expressions.
  */
object Psl {

  final class Rules(
      val exact: java.util.HashSet[String],
      val wildcardParents: java.util.HashSet[String],
      val exceptions: java.util.HashSet[String],
      val maxLabels: Int,
      val source: String = "explicit") {
    def size: Int = exact.size + wildcardParents.size + exceptions.size

    /** Stable content fingerprint of the rule set: md5 over the sorted
      * `kind:pattern` lines plus the rule count. Two JVMs computing
      * registrable domains agree iff their fingerprints agree —
      * production jobs assert driver/executor agreement by comparing
      * this value (driver-side) against `psl_fingerprint()` (evaluated
      * in executor tasks).
      */
    lazy val fingerprint: String = {
      import scala.jdk.CollectionConverters._
      val lines =
        exact.asScala.toSeq.sorted.map("exact:" + _) ++
        wildcardParents.asScala.toSeq.sorted.map("wildcard:" + _) ++
        exceptions.asScala.toSeq.sorted.map("exception:" + _)
      val d = java.security.MessageDigest.getInstance("MD5")
      lines.foreach(l => d.update((l + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      s"$size-" + d.digest().map(b => f"$b%02x").mkString
    }

    /** [[fingerprint]] pre-encoded as UTF8String — shared (immutable) so
      * the per-row `psl_fingerprint()` hot path never re-encodes.
      */
    lazy val fingerprintU8: UTF8String = UTF8String.fromString(fingerprint)
  }

  /** Parse rule lines in the upstream format: `//` comments and blanks
    * skipped, `!` prefix = exception, `*.` prefix = wildcard (stored as
    * the parent suffix), anything else exact. Only the first
    * whitespace-delimited token of a line is the rule (upstream spec).
    */
  def parse(lines: Iterator[String], source: String = "explicit"): Rules = {
    val exact = new java.util.HashSet[String]()
    val wild = new java.util.HashSet[String]()
    val exc = new java.util.HashSet[String]()
    var maxLabels = 1
    def nLabels(s: String): Int = {
      var n = 1; var i = 0
      while (i < s.length) { if (s.charAt(i) == '.') n += 1; i += 1 }
      n
    }
    lines.foreach { raw =>
      val line = raw.trim.takeWhile(!_.isWhitespace)
      if (line.nonEmpty && !line.startsWith("//")) {
        val lower = line.toLowerCase
        if (lower.startsWith("!")) {
          val r = lower.substring(1)
          exc.add(r); maxLabels = math.max(maxLabels, nLabels(r))
        } else if (lower.startsWith("*.")) {
          val parent = lower.substring(2)
          wild.add(parent); maxLabels = math.max(maxLabels, nLabels(parent) + 1)
        } else {
          exact.add(lower); maxLabels = math.max(maxLabels, nLabels(lower))
        }
      }
    }
    new Rules(exact, wild, exc, maxLabels, source)
  }

  private def loadEmbedded(): Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "embedded PSL resource missing from jar")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines(), "embedded:graft/public_suffix_list.dat")
    finally src.close()
  }

  @volatile private var active: Rules = null

  /** Every path that activates a rule set logs through here, so "grep
    * executor stderr for `graft PSL:`" audits ALL of them — the lazy
    * default, [[loadFile]], and [[setRules]] alike (a loadFile that went
    * unlogged would hide exactly the drift the fingerprint check hunts).
    */
  private def logResolved(r: Rules): Unit =
    System.err.println(
      s"graft PSL: resolved ${r.source} (${r.size} rules, fingerprint ${r.fingerprint})")

  /** The active rule set: `-Dgraft.psl.path` file if set, else the
    * embedded subset. Loaded once per JVM; read-only thereafter. The
    * resolution is logged ONCE per JVM (source + size + fingerprint) —
    * on a cluster, grep executor stderr for `graft PSL:` lines to see
    * which JVMs silently fell back to the embedded subset because the
    * `-Dgraft.psl.path` file was only visible to the driver.
    */
  def rules: Rules = {
    var r = active
    if (r == null) synchronized {
      r = active
      if (r == null) {
        r = sys.props.get("graft.psl.path") match {
          case Some(p) => parseFile(p)
          case None => loadEmbedded()
        }
        active = r
        logResolved(r)
      }
    }
    r
  }

  private def parseFile(path: String): Rules = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines(), s"file:$path") finally src.close()
  }

  /** Replace the active rules with a full PSL file (production path).
    * Call BEFORE the first query uses a `psl_*` expression — on a
    * cluster, from the same init that runs on each executor, or ship the
    * full file as the embedded resource instead.
    */
  def loadFile(path: String): Unit = synchronized {
    val r = parseFile(path)
    active = r
    logResolved(r)
  }

  /** Test/bootstrap hook: swap in explicit rules (null = back to lazy
    * default resolution).
    */
  def setRules(r: Rules): Unit = synchronized {
    active = r
    if (r != null) logResolved(r)
  }

  /** Number of labels of the prevailing public suffix for `labels`
    * (1-based from the right). Exceptions win outright; else the longest
    * matching exact/wildcard rule; else the default rule `*` = 1.
    */
  private def publicSuffixLen(labels: Array[String], r: Rules): Int = {
    val nl = labels.length
    val kMax = math.min(nl, r.maxLabels)
    var best = 1
    var k = 1
    val sb = new java.lang.StringBuilder()
    while (k <= kMax) {
      sb.setLength(0)
      var i = nl - k
      while (i < nl) {
        if (i > nl - k) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      val suf = sb.toString
      if (r.exceptions.contains(suf)) return k - 1
      if (r.exact.contains(suf)) best = math.max(best, k)
      if (k >= 2) {
        // wildcard rule `*.parent`: suffix of k labels whose last k-1
        // labels are a listed parent
        val parent = suf.substring(suf.indexOf('.') + 1)
        if (r.wildcardParents.contains(parent)) best = math.max(best, k)
      }
      k += 1
    }
    best
  }

  private def lastLabels(labels: Array[String], n: Int): String = {
    val sb = new java.lang.StringBuilder()
    var i = labels.length - n
    while (i < labels.length) {
      if (i > labels.length - n) sb.append('.')
      sb.append(labels(i))
      i += 1
    }
    sb.toString
  }

  private def splitLabels(host: String): Array[String] = {
    // split on '.', KEEPING trailing empty labels (Java split drops
    // them) so malformed hosts degrade identically to the SQL mirror's
    // string_split — urlHost strips the one legal trailing root dot
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    var start = 0
    var i = 0
    while (i <= host.length) {
      if (i == host.length || host.charAt(i) == '.') {
        out += host.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  /** Registrable domain of a lowercased host; null when the host is
    * itself a public suffix (or empty).
    */
  def registrableDomain(host: String): String = {
    if (host.isEmpty) return null
    val labels = splitLabels(host)
    val ps = publicSuffixLen(labels, rules)
    if (labels.length > ps) lastLabels(labels, ps + 1) else null
  }

  /** The prevailing public suffix of a lowercased host (always defined
    * for non-empty hosts — the default rule makes the last label a
    * suffix).
    */
  def publicSuffix(host: String): String = {
    if (host.isEmpty) return null
    val labels = splitLabels(host)
    lastLabels(labels, publicSuffixLen(labels, rules))
  }

  def registrableDomainU(host: UTF8String): UTF8String = {
    val r = registrableDomain(host.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def publicSuffixU(host: UTF8String): UTF8String = {
    val r = publicSuffix(host.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Fingerprint of THIS JVM's active rule set as a UTF8String — the
    * executor-side half of the driver/executor agreement check (called
    * by the `psl_fingerprint()` expression from generated code).
    */
  def fingerprintU(): UTF8String = rules.fingerprintU8
}
