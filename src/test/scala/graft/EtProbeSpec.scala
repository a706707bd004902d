package graft

/** Pins the EtProbe MIRROR CONTRACT (r15 verdict finding #1 / ADVICE):
  * the probe deliberately re-derives the `stream_*_et` gate staging
  * (cutoff arithmetic, the event_id % 3 nullify, the read schema)
  * instead of calling the production path — this spec makes the
  * documented drift risk a failing test by staging BOTH on sf0.001 and
  * asserting chunk-count and per-chunk row-multiset equality. If the
  * pinned gate design moves (EtReplayDays, bucket width, nullify rule,
  * epoch arithmetic) without the probe's day12 case moving with it, the
  * probe would price a design that no longer ships — and this fails.
  */
class EtProbeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("EtProbe day12 staging ≡ the gate's etReplayChunkDir staging, chunk by chunk") {
    assume(new java.io.File(sfDir, "events.parquet").exists(), s"$sfDir missing")
    val probeDir = EtProbe.stage(spark, sfDir,
      bucketUs = 86_400_000_000L, days = SparkEntry.EtReplayDays)
    val gateDir = SparkEntry.etReplayChunkDir(spark, sfDir, nullifyThirds = true)
    def chunks(dir: String): Seq[java.io.File] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).toSeq
    val (pc, gc) = (chunks(probeDir), chunks(gateDir))
    assert(pc.map(_.getName) == gc.map(_.getName),
      s"chunk layout drifted: probe=${pc.map(_.getName)} gate=${gc.map(_.getName)}")
    // per-chunk multiset equality: same rows in the same micro-batch —
    // sort each chunk by a total key and compare collected rows
    pc.zip(gc).foreach { case (p, g) =>
      def rows(f: java.io.File) = spark.read.parquet(f.getAbsolutePath)
        .select("user_id", "event_id", "ts", "value")
        .collect().map(_.toSeq).sortBy(_.toString()).toSeq
      assert(rows(p) == rows(g), s"chunk ${p.getName} content drifted")
    }
  }
}
