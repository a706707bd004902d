package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, Similarity}

/** Dev utility: scaling behavior of the near-dup/similarity operators.
  *
  * Replicates the documents/embeddings corpora k× (with id offsets, plus a
  * content perturbation so replicas aren't trivial exact dups) and times
  * each operator at 1× and k× — the ratio exposes any superlinear
  * candidate-explosion long before a real 100 TB run would.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def replicate(times: Int): DataFrame = {
      val n = 1000000L
      (0 until times).map { i =>
        docs.select(
          (col("doc_id") + lit(i * n)).as("doc_id"),
          // perturb replicas so they're near-dups, not byte-dups
          (if (i == 0) col("text")
           else concat(col("text"), lit(s" replica$i"))).as("text"))
      }.reduce(_.unionByName(_))
    }

    // dev subset filter (comma-separated name prefixes), mirrors Verify's
    // SPARK_GRAFT_ONLY — lets a single op's 1×/k× ratio be re-measured in
    // seconds instead of re-running the whole probe battery
    val probeOnly = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    // a whole family (banner counts included) is skipped when the filter
    // names none of its probes — keeps targeted PROBE_ONLY runs from
    // paying corpus-replication counts for families they skip
    def familyOn(names: String*): Boolean =
      probeOnly.forall(f => names.exists(n => f.exists(n.startsWith)))

    def time(name: String, df: => DataFrame): Double = {
      if (probeOnly.exists(f => !f.exists(name.startsWith))) return 0.0
      // isolate measurements: the dedup ops persist their kernel-pass
      // frames (deliberately, see Dedup scaladoc); letting those
      // accumulate across probes causes eviction thrash that measured 3×
      // worse than any op in isolation
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s ${sec}%7.2f s  rows=$rows")
      sec
    }

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq(1, k).foreach { times =>
      val d = replicate(times)
      println(s"--- corpus ${times}x (${d.count()} docs) ---")
      time(s"minhashNearDups", Dedup.minhashNearDups(d, "text", "doc_id"))
      time(s"ngramJaccardPairs", Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.8))
      time(s"simhashNearDups", Dedup.simhashNearDups(d, "text", "doc_id"))
      time(s"nearDupFilter", Dedup.nearDupFilter(d, "text", "doc_id"))
      time(s"dedupLines", Dedup.dedupLines(d, "text", "doc_id"))
      time(s"bm25TopK", graft.ops.TextStats.bm25TopK(
        d, "doc_id", "text", Seq("hash", "vector", "data"), k = 10))
    }

    // curation prefix-sum family: the interesting probe is the global
    // ordering op — confirm wall time stays ~linear in rows (two range
    // shuffles + parallel windows; the single-task step is O(partitions))
    Seq(1, k).foreach { times =>
      val d = replicate(times).withColumn("n_tokens", length(col("text")).cast("long"))
      println(s"--- curation ${times}x (${d.count()} docs) ---")
      time("packSequences", Curation.packSequences(d, "doc_id", "n_tokens", 2048L))
      time("shuffleOrder", Curation.shuffleOrder(d, "doc_id"))
      time("chunkDocuments", Curation.chunkDocuments(d, "text", 256, 192))
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def replicateEmb(times: Int): DataFrame = {
      val n = 1000000L
      (0 until times).map { i =>
        emb.select(
          (col("vec_id") + lit(i * n)).as("vec_id"),
          // perturb the first dimension so replicas aren't identical
          (if (i == 0) col("embedding")
           else concat(
             array((element_at(col("embedding"), 1) + lit(0.01f * i)).cast("float")),
             slice(col("embedding"), 2, 63))).as("embedding"))
      }.reduce(_.unionByName(_))
    }
    // fixed query set + replicated corpus: the ratio shows how each ANN
    // path scales with CORPUS size (all-as-queries would conflate the
    // quadratic query growth with the corpus scaling under test)
    Seq(1, k).foreach { times =>
      val e = replicateEmb(times)
      val q = e.filter(col("vec_id") < 100)
      println(s"--- embeddings ${times}x (${e.count()} vecs) ---")
      time("cosineNearDupPairs", Similarity.cosineNearDupPairs(e, "vec_id", "embedding", 0.9))
      time("lshTopK(100 queries)", Similarity.lshTopK(
        e, "vec_id", "embedding", q, "vec_id", "embedding", dim = 64, k = 10))
      time("ivfTopK(100 queries)", Similarity.ivfTopK(
        e, "vec_id", "embedding", q, "vec_id", "embedding",
        k = 10, numCentroids = 64, nProbe = 8))
      time("ivfpqTopK(100 queries)", Similarity.ivfpqTopK(
        e, "vec_id", "embedding", q, "vec_id", "embedding",
        dim = 64, k = 10, numCentroids = 64, nProbe = 8,
        numSubspaces = 4, pqCentroids = 16, candK = 50))
      time("cosineClusters", Similarity.cosineClusters(e, "vec_id", "embedding", 0.9))
    }

    // events-keyed fan-out family (round-3 ops): replication offsets
    // user_id, so KEY cardinality grows k× while each key's span stays
    // fixed — the axis that matters for the dense-grid explode (Σ per-key
    // spans) and the funnel's per-key joins.
    // canonical read: ts is epoch-µs LongType whatever the file stored
    val ev = SparkEntry.events(spark, sfDir)
      .select("user_id", "ts", "event_type")
    def replicateEv(times: Int): DataFrame = {
      val n = 100000000L
      (0 until times).map { i =>
        ev.select((col("user_id") + lit(i * n)).as("user_id"), col("ts"), col("event_type"))
      }.reduce(_.unionByName(_))
    }
    Seq(1, k).foreach { times =>
      val e = replicateEv(times)
      println(s"--- events ${times}x (${e.count()} events) ---")
      time("denseCounts(hourly)",
        graft.ops.TimeSeries.denseCounts(e, "user_id", "ts", 3600L * 1000000L))
      time("funnelSteps(view,click,purchase)",
        graft.ops.Funnel.funnelSteps(
          e.withColumn("tus", col("ts")),
          "user_id", "tus", "event_type",
          Seq("view", "click", "purchase"), 1800000000L))
      // lag-gap sessionization: two window passes over ONE (user_id)
      // hash shuffle + sort — Σ per-key events, never keys × span.
      // Probe-only shape (the gate's version in SparkEntry additionally
      // tiebreaks the ordering on event_id for determinism; the probe's
      // replicated frame carries no event_id and only timing matters)
      time("sessionizeGap(30min)", {
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_type"))
        e.withColumn("__prev", lag(col("ts"), 1).over(wOrd))
          .withColumn("__new",
            when(col("__prev").isNull || col("ts") - col("__prev") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("__new")).over(
            wOrd.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"))
      })
      // as-of join: union-tag + one window over the same (user) shuffle
      // class — per-key linear, no range-join candidate blowup
      time("asofJoin(click<-view)", {
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("tus"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("vts"),
            col("ts").cast("double").as("view_value"))
        graft.ops.AsofJoin.asofJoin(
          clicks, views, Seq("user_id"), "tus", "vts", Seq("view_value"))
      })
    }

    // zorderBy: one range exchange + in-partition sort — ratio should be
    // ~linear (sort) with no single-task step
    Seq(1, k).foreach { times =>
      val d = replicate(times).withColumn("n_chars", length(col("text")).cast("long"))
      println(s"--- zorder ${times}x ---")
      time("zorderBy(doc_id,n_chars)",
        Curation.zorderBy(d, col("doc_id") % 1024, col("n_chars") % 1024,
          bits = 10, tiebreak = Seq(col("doc_id"))))
    }

    // round-4 operator family: overlap/contamination/history-dedup/quota.
    // Replication grows docs k× (near-dup replicas); group count is fixed
    // (source values repeat), so groupOverlapExact stresses the
    // per-shingle group fan-in and exactNgramContamination the gram-set
    // join, both on the axis that grows at 100 TB.
    Seq(1, k).foreach { times =>
      val d = replicate(times)
        .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(20))))
      println(s"--- round-4 ops ${times}x (${d.count()} docs) ---")
      time("groupOverlapExact",
        Dedup.groupOverlapExact(d, "source", "text"))
      time("exactNgramContamination",
        Dedup.exactNgramContamination(
          d.filter(pmod(col("doc_id"), lit(7)) =!= 0), "text",
          d.filter(pmod(col("doc_id"), lit(7)) === 0), "doc_id", "text", n = 13))
      time("dedupAgainstHistory",
        Dedup.dedupAgainstHistory(
          d.filter(pmod(col("doc_id"), lit(7)) =!= 0), "text",
          d.filter(pmod(col("doc_id"), lit(7)) === 0), "text"))
      time("groupQuota(15)",
        Curation.groupQuota(d, "source", "doc_id", maxPerGroup = 15))
    }

    // round-5 operator family. classifierScore is the kernel linear-scan
    // bound (expect ~k×); temperatureMixture one group shuffle (~k×);
    // kmeansClusters grows the per-round assignment linearly while the
    // codebook cost is fixed; scd2 windows scale with rows at fixed
    // per-key history growth.
    Seq(1, k).foreach { times =>
      val d = replicate(times)
        .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(5))))
      println(s"--- round-5 ops ${times}x (${d.count()} docs) ---")
      time("classifierScore",
        graft.ops.TextStats.classifierScore(d, "doc_id", "text"))
      time("temperatureMixture",
        Curation.temperatureMixture(d, "lang", "doc_id"))
      // bigram counts: shuffle bounded by distinct (w1,w2) pairs, joins
      // back by key — should track token volume, never pair out
      time("bigramFamiliarity",
        graft.ops.TextStats.bigramFamiliarity(d, "doc_id", "text"))
    }
    Seq(1, k).foreach { times =>
      val e = replicateEmb(times)
      println(s"--- round-5 embeddings ${times}x (${e.count()} vecs) ---")
      time("kmeansClusters(64)",
        Similarity.kmeansClusters(e, "vec_id", "embedding", k = 64, iters = 2))
    }
    Seq(1, k).foreach { times =>
      val e = replicateEv(times)
      println(s"--- round-5 events ${times}x (${e.count()} events) ---")
      time("scd2(user_id,event_type)",
        graft.ops.TimeSeries.scd2(e, Seq("user_id"), Seq("event_type"), Seq("ts")))
    }

    // round-6 iterative-path family (the 64× decade): run with
    // SPARK_GRAFT_PROBE_ONLY=ccCadence,leakageSafeSplit,historyDedup and
    // k=64. ccCadence isolates the CC loop on a SYNTHETIC diameter-32
    // chain graph (k-scaled vertex count) so the checkpoint-cadence
    // amortization curve is measured without the minhash pair stage in
    // front; leakageSafeSplit runs the full iterative composition;
    // historyDedup contrasts per-batch sketch rebuild vs one prebuilt
    // broadcast sketch over 3 batches.
    {
      val chainLen = 32
      val chains = 2048L * k
      def chainGraph(): (DataFrame, DataFrame) = {
        val verts = spark.range(chains * chainLen).select(col("id"))
        val edges = verts
          .filter(pmod(col("id"), lit(chainLen.toLong)) =!= (chainLen - 1).toLong)
          .select(col("id").as("src"), (col("id") + 1L).as("dst"))
        (verts, edges)
      }
      println(s"--- cc cadence (${chains * chainLen} vertices, diameter $chainLen) ---")
      // warm the CC code paths (codegen, shuffle setup) so the first
      // measured cadence doesn't absorb JVM warmup — the k=2 smoke run
      // showed cadence 1 inflated ~1.5× purely by running first
      if (!probeOnly.exists(f => !f.exists("ccCadence".startsWith))) {
        val wv = spark.range(1000).select(col("id"))
        val we = wv.filter(pmod(col("id"), lit(10L)) =!= 9L)
          .select(col("id").as("src"), (col("id") + 1L).as("dst"))
        Dedup.connectedComponents(wv, "id", we, "src", "dst").count()
      }
      Seq(1, 2, 4, 8).foreach { every =>
        val (v, e) = chainGraph()
        time(s"ccCadence($every)",
          Dedup.connectedComponents(v, "id", e, "src", "dst", checkpointEvery = every))
      }
    }
    if (familyOn("leakageSafeSplit")) Seq(1, k).foreach { times =>
      val d = replicate(times)
      println(s"--- leakage split ${times}x (${d.count()} docs) ---")
      time("leakageSafeSplit",
        Curation.leakageSafeSplit(d, "text", "doc_id", 9800, 100))
    }
    if (familyOn("historyDedup")) Seq(1, k).foreach { times =>
      val incoming = replicate(times)
      val history = docs.select(col("doc_id"), col("text"))
      println(s"--- history dedup ${times}x incoming (${incoming.count()} docs) ---")
      val batches = 3
      val t0 = System.nanoTime()
      if (!probeOnly.exists(f => !f.exists("historyDedup".startsWith))) {
        (1 to batches).foreach { _ =>
          spark.catalog.clearCache()
          Dedup.dedupAgainstHistory(history, "text", incoming, "text").count()
        }
        println(f"historyDedup(rebuild x$batches)   ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        val t1 = System.nanoTime()
        val sketch = Dedup.historyBloomSketch(history, "text")
        val bc = spark.sparkContext.broadcast(sketch)
        (1 to batches).foreach { _ =>
          spark.catalog.clearCache()
          Dedup.dedupAgainstHistory(bc, history, "text", incoming, "text").count()
        }
        println(f"historyDedup(reuse x$batches)     ${(System.nanoTime() - t1) / 1e9}%7.2f s")
        bc.destroy()
      }
    }

    // round-6 text-op family: repetition signals (tagged-explode
    // aggregate), the composed web pipeline, and the broadcast blockterm
    // join — the per-doc fan-out ops whose shuffles are bounded by
    // distinct (doc, gram)/(doc, token) pairs.
    if (familyOn("gopherRepetition", "curateWebCorpus", "blocktermProfileJoined"))
    Seq(1, k).foreach { times =>
      val d = replicate(times)
        .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(5))))
        .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(20))))
      println(s"--- round-6 text ops ${times}x (${d.count()} docs) ---")
      time("gopherRepetition",
        graft.ops.TextStats.gopherRepetition(d, "doc_id", "text"))
      time("curateWebCorpus",
        Curation.curateWebCorpus(
          d.withColumn("text", concat(col("text"), lit(" and this line ends here."))),
          "doc_id", "text"))
      time("blocktermProfileJoined", {
        val terms = spark.range(0, 10000)
          .select(concat(lit("zzterm"), col("id")).as("term"))
        graft.ops.TextStats.blocktermProfileJoined(d, "doc_id", "text", terms)
      })
    }

    // round-8/9 events family: LOCF resampling, forward/nearest as-of,
    // and the SCD2∘as-of point-in-time composition. Replication grows
    // KEY cardinality (user_id offset) at fixed per-key span — the LOCF
    // grid is Σ per-key buckets (linear in keys) and every as-of variant
    // is one union shuffle + window, so all four should track ~k×.
    if (familyOn("resampleLocf", "resampleInterp", "asofForward", "asofNearest",
        "pitLookup", "asofUnionPath", "asofBcastPath"))
    Seq(1, k).foreach { times =>
      val e = replicateEv(times)
      println(s"--- round-8 events ${times}x (${e.count()} events) ---")
      time("resampleLocf(hourly)",
        graft.ops.TimeSeries.resampleLocf(
          e.withColumn("value", (col("ts") % 1000L).cast("double")),
          "user_id", "ts", "value", 3600L * 1000000L, Seq(col("event_type"))))
      time("resampleInterp(hourly)",
        graft.ops.TimeSeries.resampleInterp(
          e.withColumn("value", (col("ts") % 1000L).cast("double")),
          "user_id", "ts", "value", 3600L * 1000000L, Seq(col("event_type"))))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("tus"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"),
          (col("ts") % 1000L).cast("double").as("view_value"))
      time("asofForward(click->view)",
        graft.ops.AsofJoin.asofJoinForward(
          clicks, views, Seq("user_id"), "tus", "vts", Seq("view_value")))
      time("asofNearest(click->view)",
        graft.ops.AsofJoin.asofJoinNearest(
          clicks, views, Seq("user_id"), "tus", "vts", Seq("view_value")))
      // point-in-time: SCD2 versions from the event stream's attr changes,
      // then a backward as-of of each event against its key's dim history
      time("pitLookup(scd2+asof)", {
        val dim = graft.ops.TimeSeries.scd2(
          e, Seq("user_id"), Seq("event_type"), Seq("ts"))
          .select(col("user_id"), col("valid_from"),
            col("event_type").as("d_type"), col("version"))
        graft.ops.AsofJoin.asofJoin(
          clicks, dim, Seq("user_id"), "tus", "valid_from",
          Seq("d_type", "version"))
      })
      // broadcast-vs-union head-to-head on the SAME probe/dim pair: the
      // delta is the left-side exchange+sort the broadcast path deletes
      time("asofUnionPath(events->dim)", {
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try graft.ops.AsofJoin.asofJoin(
          e.select(col("user_id"), col("ts").as("tus")), views,
          Seq("user_id"), "tus", "vts", Seq("view_value"))
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      })
      time("asofBcastPath(events->dim)",
        graft.ops.AsofJoin.asofJoinBroadcast(
          e.select(col("user_id"), col("ts").as("tus")), views,
          Seq("user_id"), "tus", "vts", Seq("view_value")))
    }

    // round-9b family: KS drift (distinct-value axis — the per-value
    // groupBy and the two-phase prefix sum both scale with distinct
    // values, which here grow ~k× with events), DSIR weighting (token
    // axis, familiarity shape), and the triangle census (replicas form
    // k-cliques per base doc, so edges grow C(k,2)× and triangles
    // C(k,3)× — the adversarial motif-density axis; the degree
    // orientation keeps outdeg ≤ k−1).
    if (familyOn("ksDrift", "dsirWeights", "triangleStats", "winnowOverlap")) {
      Seq(1, k).foreach { times =>
        val e = replicateEv(times)
          .withColumn("value", (col("ts") + pmod(col("user_id"), lit(97L))).cast("double"))
        println(s"--- round-9b events ${times}x (${e.count()} events) ---")
        time("ksDrift(parity split)",
          graft.ops.Profiling.ksDrift(
            e.filter(pmod(col("user_id"), lit(2)) === 0),
            e.filter(pmod(col("user_id"), lit(2)) === 1)
              .withColumn("value", col("value") * 1.1 + 5),
            "value"))
      }
      Seq(1, k).foreach { times =>
        val d = replicate(times)
        println(s"--- round-9b docs ${times}x (${d.count()} docs) ---")
        time("dsirWeights",
          graft.ops.TextStats.dsirWeights(d, "doc_id", "text",
            isTarget = pmod(col("doc_id"), lit(4)) === 0))
        time("triangleStats(jaccard 0.5)",
          Dedup.triangleStats(
            Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.5), "id_a", "id_b"))
        // replicas share their full base text, so every base doc's k
        // replicas pairwise-share fingerprints — the pair axis explodes
        // like the jaccard probes; wall should track pair volume
        time("winnowOverlapPairs",
          Dedup.winnowOverlapPairs(d, "text", "doc_id", 4, 4, 3))
      }
    }

    // round-9c additions. pageRank rides the same replica-clique edge
    // axis as triangleStats (edges C(k,2)× per base doc) — wall should
    // track EDGES × iterations, never node-pair volume; the profiling
    // trio rides the events axis (key-cardinality growth).
    if (familyOn("pageRank", "pmiCollocations", "groupZscores",
        "gapProfile", "benfordProfile", "pivotLatest", "cohortRetention",
        "cooccurrenceLift", "equidepthBins", "minmaxScale", "robustZscores",
        "transitionMatrix", "interleaveBySource", "rfmSegments")) {
      Seq(1, k).foreach { times =>
        val d = replicate(times)
        println(s"--- round-9c docs ${times}x (${d.count()} docs) ---")
        time("pageRank(jaccard 0.5)",
          graft.ops.GraphOps.pageRank(
            Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.5),
            "id_a", "id_b", iters = 3))
        time("pmiCollocations",
          graft.ops.TextStats.pmiCollocations(d, "text", minCount = 5L, topK = 50))
        time("interleaveBySource",
          Curation.interleaveBySource(
            d.withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20L)))),
            "doc_id", "source"))
      }
      Seq(1, k).foreach { times =>
        val e = replicateEv(times)
          .withColumn("value", (pmod(col("ts"), lit(997L)) +
            pmod(col("user_id"), lit(97L))).cast("double"))
          .withColumn("event_id", col("ts") * 1000L + pmod(col("user_id"), lit(1000L)))
        println(s"--- round-9c events ${times}x (${e.count()} events) ---")
        time("groupZscores(user)",
          graft.ops.Profiling.groupZscores(e, "user_id", "value"))
        time("gapProfile(user)",
          graft.ops.TimeSeries.gapProfile(e, "user_id", "ts"))
        time("benfordProfile",
          graft.ops.Profiling.benfordProfile(e, "value"))
        time("pivotLatest(3 types)",
          graft.ops.TimeSeries.pivotLatest(e, "user_id", "event_type",
            "ts", "value", Seq("view", "click", "purchase"), "event_id"))
        time("cohortRetention(daily)",
          graft.ops.TimeSeries.cohortRetention(e, "user_id", "ts",
            86400L * 1000000L))
        time("equidepthBins(10)",
          graft.ops.Profiling.equidepthBins(
            e.select(col("value"), col("event_id")), "value", "event_id", 10))
        time("minmaxScale(type)",
          graft.ops.Profiling.minmaxScale(e, "event_type", "value"))
        time("robustZscores(user)",
          graft.ops.Profiling.robustZscores(e, "user_id", "value"))
        time("rfmSegments(user)",
          graft.ops.Profiling.rfmSegments(
            e.withColumn("value", (pmod(col("ts"), lit(997L)) +
              pmod(col("user_id"), lit(97L))).cast("double")),
            "user_id", "ts", "value"))
        time("transitionMatrix(type)",
          graft.ops.TimeSeries.transitionMatrix(
            e.withColumn("event_id", col("ts") * 1000L +
              pmod(col("user_id"), lit(1000L))),
            "user_id", "ts", "event_type", "event_id"))
      }
      // basket axis: replicate lineitem by ORDER offset — items stay
      // fixed (Zipf head unchanged), baskets grow k×, so pair volume
      // must scale ~linearly in baskets, never quadratically in items
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      Seq(1, k).foreach { times =>
        val b = (0 until times).map { i =>
          li.select((col("l_orderkey") + lit(i * 1000000000L)).as("l_orderkey"),
            col("l_partkey"))
        }.reduce(_.unionByName(_))
        println(s"--- round-9c baskets ${times}x (${b.count()} rows) ---")
        time("cooccurrenceLift(order,part)",
          graft.ops.GraphOps.cooccurrenceLift(b, "l_orderkey", "l_partkey",
            minCount = 2L))
      }
    }

    // FHIR bundle-directory ingest (the reference's core workload,
    // json_pipeline.py:100-118): N small multiLine JSON files → explode →
    // route → extract → clean, counted across all six tables off ONE
    // cached entry parse. The interesting axis is FILE COUNT — multiLine
    // JSON is whole-file-per-record, so this measures the small-files
    // listing + per-file parse overhead that dominates bulk EHR ingest.
    // Corpora persist under target/ (deterministic, marker-gated), so
    // re-probes skip generation.
    if (familyOn("fhirIngest")) Seq(1, k).foreach { times =>
      val n = 500 * times
      val dir = java.nio.file.Paths.get(s"target/probe-fhir-$n").toAbsolutePath
      val tGen = System.nanoTime()
      graft.fhir.FhirCorpus.generate(dir, n)
      println(f"--- fhir ingest ${times}x ($n bundles, gen ${(System.nanoTime() - tGen) / 1e9}%.1f s) ---")
      // cache built INSIDE the timed block (time() clears the cache
      // first): the measurement covers one parse + six table derivations,
      // the same shape the fhir_scale gate and a real bulk load use
      time("fhirIngest(6 tables)", {
        val entries = graft.fhir.BundleReader.normalizedEntries(spark, dir.toString).cache()
        val tables = graft.fhir.Cleaning.all(graft.fhir.Extractors.allTables(entries))
        tables.values.map(_.select(lit(1L).as("one"))).reduce(_.unionByName(_))
      })
      spark.catalog.clearCache()
    }

    // round-10: the 256× octave for the quadratic-adjacent trio (verdict
    // item 7). cooccurrenceLift rides its LINEAR basket axis at full
    // corpus. The doc-replica corpus is edge-quadratic in the replica
    // count by construction (every base doc becomes a K_k clique —
    // C(256,2) ≈ 32.6k edges per base doc), so a full-corpus 256× run
    // would be ~2.8e10 wedge rows of corpus generation, not curve
    // evidence; instead the 256× octave holds the BASE-DOC set to 1/32
    // (triangles) and 1/8 (winnow), which still pushes the pair/edge
    // axis 30–60× past the earlier 8× full-corpus probes — the curve
    // being confirmed is wall vs EDGES/PAIRS, and that axis grows.
    if (familyOn("probe256")) {
      val k256 = 256
      // baskets: linear axis, full corpus
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      val b = (0 until k256).map { i =>
        li.select((col("l_orderkey") + lit(i * 1000000000L)).as("l_orderkey"),
          col("l_partkey"))
      }.reduce(_.unionByName(_))
      println(s"--- probe256 baskets 256x (${b.count()} rows) ---")
      time("probe256:cooccurrenceLift(order,part)",
        graft.ops.GraphOps.cooccurrenceLift(b, "l_orderkey", "l_partkey",
          minCount = 2L))
      def replicateSubset(mod: Int, times: Int): DataFrame = {
        val base = docs.filter(pmod(col("doc_id"), lit(mod)) === 0)
        val n = 1000000L
        (0 until times).map { i =>
          base.select((col("doc_id") + lit(i * n)).as("doc_id"),
            (if (i == 0) col("text")
             else concat(col("text"), lit(s" replica$i"))).as("text"))
        }.reduce(_.unionByName(_))
      }
      val d8 = replicateSubset(8, k256)
      println(s"--- probe256 winnow docs 256x of 1/8 base (${d8.count()} docs) ---")
      time("probe256:winnowOverlapPairs",
        Dedup.winnowOverlapPairs(d8, "text", "doc_id", 4, 4, 3))
      val d32 = replicateSubset(32, k256)
      println(s"--- probe256 triangle docs 256x of 1/32 base (${d32.count()} docs) ---")
      time("probe256:triangleStats(jaccard 0.5)",
        Dedup.triangleStats(
          Dedup.ngramJaccardPairs(d32, "text", "doc_id", 3, 0.5), "id_a", "id_b"))
    }

    // round-10 operator family: the real-codec tiers and the BPE kernels
    // all ride the doc-id axis (payloads/text per id), so replication
    // scales corpus size while per-item cost stays fixed — wall should
    // track rows with no superlinear term anywhere.
    if (familyOn("probe10")) Seq(1, k).foreach { times =>
      val n = 1000000L
      val ids = (0 until times).map { i =>
        docs.select((col("doc_id") + lit(i * n)).as("doc_id"))
      }.reduce(_.unionByName(_)).filter(col("doc_id").isNotNull)
      val d = replicate(times)
      println(s"--- probe10 ${times}x (${ids.count()} ids) ---")
      time("probe10:decodeAudio",
        graft.ops.Multimodal.decodeAudio(
          graft.ops.Multimodal.syntheticWavTable(ids, "doc_id")).toDF())
      time("probe10:audioEnergyHash",
        graft.ops.Multimodal.audioEnergyHash(
          graft.ops.Multimodal.syntheticWavTable(ids, "doc_id")).toDF())
      time("probe10:sampleVideoFrames",
        graft.ops.Multimodal.sampleVideoFrames(
          graft.ops.Multimodal.syntheticFrameStreamTable(ids, "doc_id"),
          stride = 2).toDF())
      time("probe10:bpeCounts(kernel)",
        graft.ops.TextStats.bpeCounts(d, "text")
          .select(col("doc_id"), col("n_bpe_tokens")))
      // training cost = rounds × one pass over the slice; rounds fixed,
      // slice grows k× — wall should track the slice linearly
      time("probe10:bpeTrainMerges(8 rounds)", {
        val m = graft.ops.TextStats.bpeTrainMerges(
          d.filter(pmod(col("doc_id"), lit(4)) === 0), "text",
          numMerges = 8, minPairCount = 10L)
        spark.range(m.length.toLong).toDF("id")
      })
    }

    // round-10 session-3 family: SemDeDup proper (embeddings axis — both
    // the FIXED-k shape, where per-cell population grows with the corpus
    // and the pair term with its square, and the paper's lever, k grown
    // ∝ corpus, which holds per-cell cost fixed), CCNet rank staging
    // (docs axis) and the shuffle-skew pre-flight (events key axis).
    if (familyOn("probe10b")) Seq(1, k).foreach { times =>
      val e = replicateEmb(times)
      println(s"--- probe10b ${times}x (${e.count()} vecs) ---")
      time("probe10b:semDedup(fixed k=16)",
        Similarity.semDedup(e, "vec_id", "embedding", 0.35, k = 16))
      time(s"probe10b:semDedup(k=16*$times)",
        Similarity.semDedup(e, "vec_id", "embedding", 0.35, k = 16 * times))
      val d = replicate(times)
      time("probe10b:rankBuckets(7 groups)", {
        val scored = graft.ops.TextStats
          .unigramFamiliarity(d, "doc_id", "text", oovBelow = 3L)
          .withColumn("grp", pmod(col("doc_id"), lit(7L)))
        Curation.rankBuckets(scored, "grp", col("familiarity"), "doc_id", 3)
      })
      val evR = replicateEv(times)
      time("probe10b:shuffleSkewProfile(P=32)",
        graft.ops.Profiling.shuffleSkewProfile(evR, "user_id", 32))
    }

    // round-10 session-4 family: the survival-analysis battery (events
    // key axis — subjects grow 64×, distinct durations sublinearly) and
    // the privacy battery (docs axis — QI class counts grow with rows).
    if (familyOn("probe10c")) Seq(1, k).foreach { times =>
      val evR = replicateEv(times)
      val perUser = evR.groupBy("user_id")
        .agg(max(col("ts")).as("__mx"), min(col("ts")).as("__mn"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("observed"))
        .select(pmod(col("user_id"), lit(4L)).cast("string").as("cohort"),
          expr("(__mx - __mn) DIV 3600000000").as("duration"), col("observed"))
      println(s"--- probe10c ${times}x ---")
      time("probe10c:kaplanMeier(4 strata)",
        graft.ops.TimeSeries.kaplanMeier(perUser, "cohort", "duration", "observed"))
      time("probe10c:logRank",
        graft.ops.TimeSeries.logRank(
          perUser.withColumn("cohort",
            pmod(col("cohort").cast("long"), lit(2L)).cast("string")),
          "cohort", "duration", "observed", groupOne = "0"))
      val d = replicate(times)
      val qi = d.select(pmod(col("doc_id"), lit(97L)).as("q1"),
        expr("length(text) DIV 100").as("q2"),
        pmod(col("doc_id"), lit(7L)).as("q3"))
      time("probe10c:kAnonymity(3 QI)",
        graft.ops.Profiling.kAnonymity(qi, Seq("q1", "q2", "q3"), 5L))
      time("probe10c:lDiversity",
        graft.ops.Profiling.lDiversity(qi, Seq("q1", "q2"), "q3", 3L))
    }

    // round-10 session-5 family: interval algebra (events key axis —
    // keys grow k×, per-key interval count fixed, so each key's window
    // sort stays constant-size and wall time should track rows
    // ~linearly; census doubles the sorted rows via the ±1 delta union).
    if (familyOn("probe10d")) Seq(1, k).foreach { times =>
      val n = 100000000L
      // fresh read: the shared `ev` projection drops `value`
      val evWithValue = SparkEntry.events(spark, sfDir)
        .select("user_id", "ts", "value")
      val evV = (0 until times).map { i =>
        evWithValue.select((col("user_id") + lit(i * n)).as("user_id"),
          col("ts"), col("value"))
      }.reduce(_.unionByName(_))
      val durDays = lit(1L) + (abs(floor(col("value"))).cast("long") % lit(30L))
      val sDay = expr("ts DIV 86400000000")
      val ivd = evV.filter(col("value").isNotNull)
        .select(col("user_id"), sDay.as("ivs"), (sDay + durDays).as("ive"))
      println(s"--- probe10d ${times}x ---")
      time("probe10d:mergeIntervals",
        graft.ops.Intervals.mergeIntervals(ivd, "user_id", "ivs", "ive"))
      time("probe10d:intervalCensus",
        graft.ops.Intervals.intervalCensus(ivd, "user_id", "ivs", "ive"))
      time("probe10d:coverageRatio",
        graft.ops.Intervals.coverageRatio(ivd, "user_id", "ivs", "ive", 365L))
    }

    // round-10 session-5 clinical battery: episodes/readmissions ride
    // the same key axis as probe10d (per-key window size fixed, keys
    // grow k×); incidenceRate doubles the sweep rows via the outcome
    // union; rankSumTest's window runs over DISTINCT grid values —
    // bounded by the value domain, so its cost should be FLAT in k
    // after the map-side collapse, the whole point of the design.
    if (familyOn("probe10e")) Seq(1, k).foreach { times =>
      val n = 100000000L
      // fresh read: the shared `ev` projection drops `value`
      val evWithValue = SparkEntry.events(spark, sfDir)
        .select("user_id", "ts", "value")
      val evV = (0 until times).map { i =>
        evWithValue.select((col("user_id") + lit(i * n)).as("user_id"),
          col("ts"), col("value"))
      }.reduce(_.unionByName(_))
      val sDay = expr("ts DIV 86400000000")
      val durDays = lit(1L) + (abs(floor(col("value"))).cast("long") % lit(14L))
      val ivd = evV.filter(col("value").isNotNull)
        .select(col("user_id"), sDay.as("ivs"), (sDay + durDays).as("ive"))
      val exposure = evV.filter(col("value") >= 0d)
        .select(col("user_id"), sDay.as("ivs"),
          (sDay + lit(1L) + floor(col("value")).cast("long") % lit(30L)).as("ive"))
      val outcomes = evV.filter(col("value") < 0d)
        .select(col("user_id").as("ouid"), sDay.as("ot"))
      println(s"--- probe10e ${times}x ---")
      time("probe10e:readmissions",
        graft.ops.Intervals.readmissions(ivd, "user_id", "ivs", "ive", 30L, 7L))
      time("probe10e:incidenceRate",
        graft.ops.Intervals.incidenceRate(exposure, outcomes,
          "user_id", "ivs", "ive", "ouid", "ot"))
      time("probe10e:rankSumTest",
        graft.ops.Profiling.rankSumTest(
          evV.select((col("user_id") % 2L).cast("string").as("g"), col("value")),
          "g", "value", "1"))
    }

    // round-10 session-5 statistical battery: chiSquare/cmh collapse to
    // category-sized cells (cost = the scan), weightedIndex is distinct
    // + broadcast join + groupBy (linear in rows, state in keys).
    if (familyOn("probe10f")) Seq(1, k).foreach { times =>
      val n = 100000000L
      val evWithValue = SparkEntry.events(spark, sfDir)
        .select("user_id", "ts", "value", "event_type")
      val evV = (0 until times).map { i =>
        evWithValue.select((col("user_id") + lit(i * n)).as("user_id"),
          col("ts"), col("value"), col("event_type"))
      }.reduce(_.unionByName(_))
      println(s"--- probe10f ${times}x ---")
      time("probe10f:chiSquareTest",
        graft.ops.Profiling.chiSquareTest(
          evV.filter(col("user_id").isNotNull && col("event_type").isNotNull)
            .select(col("event_type"),
              pmod(col("user_id"), lit(3L)).cast("string").as("b")),
          "event_type", "b"))
      time("probe10f:cmhOddsRatio",
        graft.ops.Profiling.cmhOddsRatio(
          evV.filter(col("value").isNotNull && col("event_type").isNotNull)
            .select(
              (abs(floor(col("value"))).cast("long") % lit(5L)).cast("string")
                .as("s"),
              pmod(col("user_id"), lit(2L)).as("e"),
              when(col("event_type") === "purchase", 1L).otherwise(0L).as("o")),
          "s", "e", "o"))
      time("probe10f:weightedIndex",
        graft.ops.Profiling.weightedIndex(
          evV.select(col("user_id"), col("event_type")),
          "user_id", "event_type",
          Map("purchase" -> 2L, "error" -> 1L)))
    }

    // round-10 session-7 model-eval battery: auc is one domain-sized
    // rank window; spearman adds two value-keyed joins back to rows;
    // concentration's distinct-total relation grows with KEYS (the
    // documented coarse-grid lever); directStdRate collapses map-side
    // to (group, stratum) cells.
    if (familyOn("probe10g")) Seq(1, k).foreach { times =>
      val n = 100000000L
      val evWithValue = SparkEntry.events(spark, sfDir)
        .select("event_id", "user_id", "value", "event_type")
      val evV = (0 until times).map { i =>
        evWithValue.select(
          (col("event_id") + lit(i * n)).as("event_id"),
          (col("user_id") + lit(i * n)).as("user_id"),
          col("value"), col("event_type"))
      }.reduce(_.unionByName(_))
      println(s"--- probe10g ${times}x ---")
      time("probe10g:aucScore",
        graft.ops.ModelEval.aucScore(
          evV.filter(col("value").isNotNull && col("event_type").isNotNull)
            .select(
              when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
              col("value")),
          "y", "value"))
      time("probe10g:spearmanCorr",
        graft.ops.ModelEval.spearmanCorr(
          evV.filter(col("value").isNotNull && col("event_id").isNotNull)
            .select(col("value").as("x"),
              (pmod(col("event_id"), lit(1000L)).cast("double") / lit(10d) +
                col("value") / lit(2d)).as("yv")),
          "x", "yv"))
      time("probe10g:concentration",
        graft.ops.Profiling.concentration(
          evV.filter(col("user_id").isNotNull && col("value").isNotNull)
            .select(col("user_id"), col("value")),
          "user_id", "value"))
      time("probe10g:directStdRate",
        graft.ops.Profiling.directStdRate(
          evV.filter(col("user_id").isNotNull && col("value").isNotNull &&
            col("event_type").isNotNull)
            .select(pmod(col("user_id"), lit(4L)).cast("string").as("g"),
              (abs(floor(col("value"))).cast("long") % lit(5L)).cast("string")
                .as("s"),
              when(col("event_type") === "purchase", 1L).otherwise(0L)
                .as("e")),
          "g", "s", "e"))
    }

    // round-10 session-8 family: co-exposure pairs and the series scans
    // replicate on the KEY axis (users/series ×k, per-key span fixed);
    // linkage replicates customers with per-replica BLOCK offsets —
    // more blocks of the same size, the honest "more entities at fixed
    // blocking granularity" axis (denser blocks would be k²-quadratic
    // BY DESIGN; that axis is what maxPairsPerBlock guards).
    if (familyOn("probe10h")) Seq(1, k).foreach { times =>
      val n = 100000000L
      val evBase = SparkEntry.events(spark, sfDir)
        .select("event_id", "user_id", "ts", "value", "event_type")
      val evV = (0 until times).map { i =>
        evBase.select(
          (col("event_id") + lit(i * n)).as("event_id"),
          (col("user_id") + lit(i * n)).as("user_id"),
          col("ts"), col("value"), col("event_type"))
      }.reduce(_.unionByName(_))
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      val cV = (0 until times).map { i =>
        cust.select(
          (col("c_custkey") + lit(i * n)).as("c_custkey"),
          (col("c_nationkey") + lit(i * 100L)).as("c_nationkey"),
          col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      }.reduce(_.unionByName(_))
      println(s"--- probe10h ${times}x ---")
      val durH = lit(1L) + (abs(floor(col("value"))).cast("long") % lit(6L))
      val sH = expr("ts DIV 3600000000")
      time("probe10h:concurrentPairs",
        graft.ops.Intervals.concurrentPairs(
          evV.filter(col("user_id").isNotNull && col("value").isNotNull &&
            col("event_type").isNotNull)
            .select(col("user_id"), col("event_type"),
              sH.as("ivs"), (sH + durH).as("ive")),
          "user_id", "event_type", "ivs", "ive"))
      time("probe10h:autocorrelation",
        graft.ops.TimeSeries.autocorrelation(
          evV.filter(col("user_id").isNotNull && col("ts").isNotNull)
            .select(pmod(col("user_id"), lit(512L)).as("series"), col("ts")),
          "series", "ts", bucketWidth = 3600000000L, maxLag = 3))
      time("probe10h:cusumChangepoint",
        graft.ops.TimeSeries.cusumChangepoint(
          evV.filter(col("user_id").isNotNull && col("ts").isNotNull)
            .select(pmod(col("user_id"), lit(512L)).as("series"), col("ts")),
          "series", "ts", bucketWidth = 3600000000L))
      time("probe10h:dateShiftDeid",
        graft.clean.Cleaners.dateShiftDeid(
          evV.filter(col("user_id").isNotNull && col("ts").isNotNull)
            .select(col("event_id"), col("user_id"), col("ts")),
          "user_id", Seq("ts")))
      val blk = (pmod(col("c_custkey"), lit(10L)) * lit(10000L) +
        col("c_nationkey")).as("blk")
      val linkL = cV.filter(col("c_custkey").isNotNull &&
        col("c_nationkey").isNotNull)
        .select(col("c_custkey").as("ida"), blk, col("c_name").as("name"),
          floor(col("c_acctbal") / lit(100d)).cast("long").as("band"),
          col("c_mktsegment").as("seg"))
      val linkR = cV.filter(col("c_custkey").isNotNull &&
        col("c_nationkey").isNotNull)
        .select((col("c_custkey") + lit(1000000000L)).as("idb"), blk,
          when(pmod(col("c_custkey"), lit(7L)) === 0L, upper(col("c_name")))
            .otherwise(col("c_name")).as("name"),
          (floor(col("c_acctbal") / lit(100d)).cast("long") +
            when(pmod(col("c_custkey"), lit(5L)) === 0L, 1L).otherwise(0L))
            .as("band"),
          col("c_mktsegment").as("seg"))
      time("probe10h:probabilisticLinkage",
        graft.ops.Linkage.probabilisticLinkage(
          linkL, linkR, "ida", "idb", "blk", "blk",
          Seq(
            graft.ops.Linkage.LinkField("name", "name", 0.95, 0.001),
            graft.ops.Linkage.LinkField("band", "band", 0.9, 0.02),
            graft.ops.Linkage.LinkField("seg", "seg", 0.95, 0.2)),
          upper = 5.0, lower = 0.0)
          .groupBy(col("link_class")).agg(count(lit(1)).as("n")))
    }

    // round-12 containment probe: replicas share their full base text
    // (each replica CONTAINS the base), so every base doc's k copies
    // pairwise-contain — the pair axis grows C(k,2)× per base doc BY
    // CONSTRUCTION, same adversarial shape as the jaccard/winnow
    // probes. The honest reading is pairs-normalized wall: the
    // prefix×full-index candidate join should track Σ prefix-shingle
    // document frequency (≈ pair volume here), never corpus².
    if (familyOn("probe12c")) Seq(1, 8).foreach { times =>
      val d = replicate(times)
      println(s"--- probe12c docs ${times}x (${d.count()} docs) ---")
      time("probe12c:ngramContainment",
        Dedup.ngramContainmentPairs(d, "text", "doc_id", 3, 0.8))
      time("probe12c:sourceCopyMatrix", {
        val src = d.select(col("doc_id"),
          pmod(col("doc_id"), lit(20L)).cast("string").as("source"))
        Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.5)
          .join(src.select(col("doc_id").as("id_a"), col("source").as("__sa")),
            "id_a")
          .join(src.select(col("doc_id").as("id_b"), col("source").as("__sb")),
            "id_b")
          .groupBy(least(col("__sa"), col("__sb")).as("s1"),
            greatest(col("__sa"), col("__sb")).as("s2"))
          .agg(count(lit(1)).as("n"))
      })
    }

    // round-14 probe: the containment soft mode (dropOverDfShingles)
    // df-filters the shingle SETS up front — one extra explode-window +
    // regroup shuffle pair vs the guard mode's in-index window. Same
    // replica corpus as probe12c; the delta between the two modes at
    // each scale IS the opt-in cost of continuing past boilerplate
    // (plus whatever the boilerplate drop saves downstream).
    if (familyOn("probe14s")) Seq(1, 8).foreach { times =>
      val d = replicate(times)
      println(s"--- probe14s docs ${times}x (${d.count()} docs) ---")
      time("probe14s:containGuard",
        Dedup.ngramContainmentPairs(d, "text", "doc_id", 3, 0.8))
      time("probe14s:containSoft",
        Dedup.ngramContainmentPairs(d, "text", "doc_id", 3, 0.8,
          dropOverDfShingles = true))
    }

    // round-12 family: model-eval metrics replicate on the ROW axis
    // (events ×k — every metric folds map-side to a metric-domain-sized
    // relation: grid scores, calibration bins, rater categories — so the
    // curve tests the fold, not output growth); survival estimators
    // replicate on the SUBJECT axis (users ×k, per-user span fixed, so
    // distinct durations stay bounded and the at-risk windows / per-
    // stratum folds ride a fixed-size distinct-duration relation).
    if (familyOn("probe12m")) Seq(1, k).foreach { times =>
      val n = 100000000L
      val evBase = SparkEntry.events(spark, sfDir)
        .select("event_id", "user_id", "ts", "value", "event_type")
      val evV = (0 until times).map { i =>
        evBase.select(
          (col("event_id") + lit(i * n)).as("event_id"),
          (col("user_id") + lit(i * n)).as("user_id"),
          col("ts"), col("value"), col("event_type"))
      }.reduce(_.unionByName(_))
      println(s"--- probe12m ${times}x ---")
      import graft.ops.{ModelEval, TimeSeries}
      val ys = evV.filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
          col("value").as("s"))
      time("probe12m:aucScore", ModelEval.aucScore(ys, "y", "s"))
      time("probe12m:prCurve", ModelEval.prCurve(ys, "y", "s"))
      time("probe12m:averagePrecision", ModelEval.averagePrecision(ys, "y", "s"))
      val cal = evV.filter(col("event_id").isNotNull).select(
        when(pmod(col("event_id") * 11L, lit(100L)) <
          pmod(col("event_id") * 37L, lit(100L)), 1L).otherwise(0L).as("y"),
        ((pmod(col("event_id") * 37L, lit(100L)) + lit(0.5d)) / lit(100d))
          .as("s"))
      time("probe12m:calibrationBins", ModelEval.calibrationBins(cal, "y", "s"))
      time("probe12m:brierScore", ModelEval.brierScore(cal, "y", "s"))
      time("probe12m:hosmerLemeshow", ModelEval.hosmerLemeshow(cal, "y", "s"))
      time("probe12m:liftTable", ModelEval.liftTable(cal, "y", "s"))
      val raters = evV.filter(col("event_id").isNotNull).select(
        pmod(col("event_id"), lit(5L)).as("r1"),
        pmod(col("event_id") * 7L + lit(3L), lit(5L)).as("r2"))
      time("probe12m:kappaAgreement", ModelEval.kappaAgreement(raters, "r1", "r2"))
      time("probe12m:weightedKappa", ModelEval.weightedKappa(raters, "r1", "r2"))
      time("probe12m:mcnemarTest", ModelEval.mcnemarTest(
        evV.filter(col("event_id").isNotNull).select(
          pmod(col("event_id"), lit(2L)).as("c1"),
          pmod(col("event_id") * 3L + lit(1L), lit(2L)).as("c2")),
        "c1", "c2"))
      time("probe12m:spearmanCorr", ModelEval.spearmanCorr(
        evV.filter(col("value").isNotNull && col("ts").isNotNull).select(
          col("value").as("x"),
          pmod(expr("ts DIV 3600000000"), lit(1000L)).cast("double").as("yv")),
        "x", "yv"))
      val perUser = evV.filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(col("ts")).as("__mx"), min(col("ts")).as("__mn"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("observed"))
        .select(pmod(col("user_id"), lit(4L)).cast("string").as("cohort"),
          expr("(__mx - __mn) DIV 3600000000").as("duration"),
          col("observed"))
      time("probe12m:kaplanMeier",
        TimeSeries.kaplanMeier(perUser, "cohort", "duration", "observed"))
      time("probe12m:nelsonAalen",
        TimeSeries.nelsonAalen(perUser, "cohort", "duration", "observed"))
      time("probe12m:logRank",
        TimeSeries.logRank(perUser, "cohort", "duration", "observed",
          groupOne = "0"))
      time("probe12m:restrictedMean",
        TimeSeries.restrictedMeanSurvival(perUser, "cohort", "duration",
          "observed", tau = 200L))
      time("probe12m:survivalQuantiles",
        TimeSeries.survivalQuantiles(perUser, "cohort", "duration", "observed"))
      time("probe12m:cumulativeIncidence",
        TimeSeries.cumulativeIncidence(
          perUser.select(col("cohort"), col("duration"),
            when(col("observed") === 1L,
              when(pmod(col("duration"), lit(2L)) === 0L, "a").otherwise("b"))
              .as("cause")),
          "cohort", "duration", "cause", "a", "b"))
    }

    // round-12 session-2: feature-prep trio. quantileNormalize rides
    // the ROW axis (ranks: per-group windows + the two-phase pooled
    // prefix sum); targetEncode collapses to categories; centroid
    // similarity replicates VECTORS with groups fixed (the sums frame
    // is groups×dims at any scale).
    if (familyOn("probe12f")) Seq(1, k).foreach { times =>
      val n = 100000000L
      val evBase = SparkEntry.events(spark, sfDir)
        .select("event_id", "user_id", "value", "event_type")
      val evV = (0 until times).map { i =>
        evBase.select(
          (col("event_id") + lit(i * n)).as("event_id"),
          (col("user_id") + lit(i * n)).as("user_id"),
          col("value"), col("event_type"))
      }.reduce(_.unionByName(_))
      val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding")
      val embV = (0 until times).map { i =>
        embBase.select((col("vec_id") + lit(i * n)).as("vec_id"),
          col("embedding"))
      }.reduce(_.unionByName(_))
      println(s"--- probe12f ${times}x ---")
      time("probe12f:quantileNormalize",
        graft.ops.Profiling.quantileNormalize(
          evV.filter(col("event_id").isNotNull && col("user_id").isNotNull &&
            col("value").isNotNull)
            .select(col("event_id"), pmod(col("user_id"), lit(8L)).as("g"),
              col("value")),
          "g", "value", "event_id"))
      time("probe12f:targetEncode",
        graft.ops.Curation.targetEncode(
          evV.filter(col("event_type").isNotNull && col("event_id").isNotNull)
            .select(col("event_type"),
              pmod(col("event_id"), lit(2L)).as("y")),
          "event_type", "y"))
      time("probe12f:groupCentroidSim",
        graft.ops.Similarity.groupCentroidSim(
          embV.select(pmod(col("vec_id"), lit(8L)).cast("string").as("grp"),
            col("embedding")),
          "grp", "embedding"))
    }

    // round-13: curves for the six r12 gates that had only an argued
    // (not measured) shape. All are linear by construction; the probe
    // pins it: readability/feature_hash are pure per-doc kernels
    // (output ∝ rows), tokenizer_fertility folds map-side to the
    // language relation, drift_jsd to a fixed 20-bin histogram,
    // ipw_estimate to 4 strata×2 arms, and leave_last_out rides
    // per-key windows whose KEY COUNT scales with replication
    // (per-key group size fixed — no single window partition grows).
    if (familyOn("probe13x")) Seq(1, k).foreach { times =>
      val n = 100000000L
      val docsBase = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "lang")
      val dV = (0 until times).map { i =>
        docsBase.select((col("doc_id") + lit(i * n)).as("doc_id"),
          (if (i == 0) col("text")
           else concat(col("text"), lit(s" r$i"))).as("text"),
          col("lang"))
      }.reduce(_.unionByName(_))
      val evBase = SparkEntry.events(spark, sfDir)
        .select("event_id", "user_id", "ts", "value")
      val evV = (0 until times).map { i =>
        evBase.select(
          (col("event_id") + lit(i * n)).as("event_id"),
          (col("user_id") + lit(i * n)).as("user_id"),
          col("ts"), col("value"))
      }.reduce(_.unionByName(_))
      println(s"--- probe13x ${times}x ---")
      time("probe13x:readability",
        dV.select(col("doc_id") +:
          graft.ops.TextStats.readabilityProfile(col("text")): _*))
      time("probe13x:featureHash",
        graft.ops.TextStats.featureHash(dV, "doc_id", "text", dim = 64))
      time("probe13x:tokenizerFertility",
        dV.filter(col("lang").isNotNull)
          .select(col("lang"),
            graft.ops.TextStats.tokenCount(col("text")).cast("long").as("__w"),
            graft.ops.TextStats.bpeishTokenCount(col("text")).cast("long").as("__b"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_ws"),
            sum(col("__b")).as("n_bpe")))
      time("probe13x:leaveLastOut",
        Curation.leaveLastOut(
          evV.select("event_id", "user_id", "ts"),
          "user_id", "ts", "event_id", k = 2))
      time("probe13x:driftJsd",
        graft.ops.Profiling.jsdDrift(
          evV.filter(pmod(col("user_id"), lit(2)) === 0),
          evV.filter(pmod(col("user_id"), lit(2)) === 1)
            .withColumn("value", col("value") * 1.1 + 5),
          "value", lo = 10.0, hi = 110.0, bins = 20))
      time("probe13x:ipwEstimate",
        graft.ops.Profiling.ipwEstimate(
          evV.filter(col("user_id").isNotNull && col("event_id").isNotNull &&
            col("value").isNotNull)
            .select(pmod(col("user_id"), lit(4L)).cast("string").as("stratum"),
              (pmod(col("event_id"), lit(3L)) === 0L).cast("long").as("expd"),
              col("value")),
          "stratum", "expd", "value"))
    }

    // round-13 streaming-state probe: state-store WRITE throughput per
    // provider on the same op and data — the measurement behind
    // SCALING.md's provider guidance. Two batches per run: nKeys
    // inserts (state creation) then nKeys updates (state rewrite);
    // legacy latestState runs the default HDFS-backed store,
    // latestStateTws the required RocksDB store. Key axis capped at
    // 16× (160k keys) — enough to expose any superlinear store
    // behavior without a multi-minute probe.
    if (familyOn("probe13t")) Seq(1, math.min(k, 16)).foreach { times =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.Streams
      val nKeys = 10000 * times
      def drain(tws: Boolean): Double = {
        val in = MemoryStream[Streams.ObsEvent]
        val ds = in.toDS()
        val out = (if (tws) Streams.latestStateTws(ds) else Streams.latestState(ds)).toDF()
        def body(): Double = {
          val q = out.writeStream.format("noop")
            .outputMode("update").start()
          try {
            val t0 = System.nanoTime()
            in.addData((0 until nKeys).map(i =>
              Streams.ObsEvent(i.toLong, i.toLong, 100L, Some(1.0))))
            q.processAllAvailable()
            in.addData((0 until nKeys).map(i =>
              Streams.ObsEvent(i.toLong, (nKeys + i).toLong, 200L, Some(2.0))))
            q.processAllAvailable()
            (System.nanoTime() - t0) / 1e9
          } finally q.stop()
        }
        if (tws) Streams.withRocksDbProvider(spark)(body()) else body()
      }
      val h = drain(tws = false)
      val r = drain(tws = true)
      println(f"probe13t:latestState[hdfs]   ${h}%7.2f s  rows=$nKeys")
      println(f"probe13t:latestStateTws[rocks]${r}%7.2f s  rows=$nKeys")
    }

    // round-15 eviction-storm probe: the event-time lease tier's scale
    // axis is the TIMER SWEEP — on a backlog replay the watermark can
    // jump months in one batch, expiring every idle key's timer at
    // once (the "year of dead keys" scenario the tier exists for).
    // Three batches: nKeys keys at day 1; one nudge row at day 30
    // (advances the watermark past every lease but fires nothing —
    // FMGWS uses the PRIOR batch's watermark); one nudge at day 31,
    // whose batch sweeps all nKeys timers. The timed sweep batch must
    // scale linearly in fired timers on both state APIs — superlinear
    // behavior here would stall the first post-backlog batch at 100 TB.
    if (familyOn("probe15e")) Seq(1, math.min(k, 16)).foreach { times =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.Streams
      val nKeys = 10000 * times
      val day = 86_400_000_000L
      val ttl = java.time.Duration.ofHours(6)
      // both tiers run their TOMBSTONE op (latestStateChanges /
      // latestStateChangesTws) so firing is OBSERVED on both — the r15
      // probe timed latestStateTws, whose timer clears silently, and so
      // printed a pass-shaped line even if the TWS timer path fired
      // nothing (r15 ADVICE); the tombstone twin shares the exact timer
      // machinery and makes the fired count a hard require on both tiers
      def sweep(tws: Boolean): (Double, Long) = {
        val in = MemoryStream[Streams.ObsEvent]
        val ds = in.toDS()
        val out = (if (tws) Streams.latestStateChangesTws(ds, ttl)
                   else Streams.latestStateChanges(ds, ttl)).toDF()
        def body(): (Double, Long) = {
          val name = "probe15e_" + java.lang.Long.toHexString(System.nanoTime())
          val q = out.writeStream.format("memory").queryName(name)
            .outputMode("update").start()
          try {
            in.addData((0 until nKeys).map(i =>
              Streams.ObsEvent(i.toLong, i.toLong, day + i.toLong, Some(1.0))))
            q.processAllAvailable()
            in.addData(Seq(Streams.ObsEvent(-1L, -1L, 30L * day, Some(2.0))))
            q.processAllAvailable()
            val t0 = System.nanoTime()
            in.addData(Seq(Streams.ObsEvent(-1L, -2L, 31L * day, Some(3.0))))
            q.processAllAvailable()
            val sec = (System.nanoTime() - t0) / 1e9
            val fired = spark.table(name).filter(col("op") === "delete").count()
            (sec, fired)
          } finally q.stop()
        }
        if (tws) Streams.withRocksDbProvider(spark)(body()) else body()
      }
      val (hs, hd) = sweep(tws = false)
      require(hd == nKeys,
        s"probe15e: expected $nKeys tombstones from the sweep batch, got $hd")
      val (rs, rd) = sweep(tws = true)
      require(rd == nKeys,
        s"probe15e: expected $nKeys TWS tombstones from the sweep batch, got $rd")
      println(f"probe15e:timerSweep[fmgws]   ${hs}%7.2f s  fired=$hd")
      println(f"probe15e:timerSweep[tws]     ${rs}%7.2f s  fired=$rd")
    }

    // round-17 probe: latestStateChangesTws' OWN 64× curve (the r16
    // verdict ask — probe15e pins 1×/16× timer FIRING on both tiers,
    // but the new tombstone processor had no per-op scale row). Axis =
    // key cardinality, i.e. RocksDB state size (one KeyLatest struct +
    // one event-time timer per key) and fired-timer volume together.
    // Lifecycle timed in two windows: LOAD = arm nKeys leases then
    // renew every one (two keyed batches — the steady-state write
    // path), SWEEP = the post-backlog batch whose watermark jump fires
    // every timer at once and must emit exactly nKeys tombstones.
    // Contract: both walls linear-to-flat through 64× — superlinear
    // load means per-key state writes degrade with instance size;
    // superlinear sweep means the timer scan does.
    if (familyOn("probe17a")) Seq(1, 8, 64).filter(t => t == 1 || t <= k)
        .foreach { times =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.Streams
      val nKeys = 10000 * times
      val day = 86_400_000_000L
      val ttl = java.time.Duration.ofHours(6)
      val in = MemoryStream[Streams.ObsEvent]
      val out = Streams.latestStateChangesTws(in.toDS(), ttl).toDF()
      val (loadSec, sweepSec, fired) = Streams.withRocksDbProvider(spark) {
        val name = "probe17a_" + java.lang.Long.toHexString(System.nanoTime())
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          val t0 = System.nanoTime()
          in.addData((0 until nKeys).map(i =>
            Streams.ObsEvent(i.toLong, i.toLong, day + i.toLong, Some(1.0))))
          q.processAllAvailable()
          in.addData((0 until nKeys).map(i =>
            Streams.ObsEvent(i.toLong, (nKeys + i).toLong, 2L * day + i.toLong,
              Some(2.0))))
          q.processAllAvailable()
          val load = (System.nanoTime() - t0) / 1e9
          in.addData(Seq(Streams.ObsEvent(-1L, -1L, 30L * day, Some(3.0))))
          q.processAllAvailable()
          val t1 = System.nanoTime()
          in.addData(Seq(Streams.ObsEvent(-1L, -2L, 31L * day, Some(4.0))))
          q.processAllAvailable()
          val sweep = (System.nanoTime() - t1) / 1e9
          val d = spark.table(name).filter(col("op") === "delete").count()
          (load, sweep, d)
        } finally q.stop()
      }
      require(fired == nKeys,
        s"probe17a: expected $nKeys tombstones from the sweep batch, got $fired")
      println(f"probe17a:cdcTws load ${loadSec}%7.2f s  sweep ${sweepSec}%7.2f s" +
        f"  keys=$nKeys fired=$fired")
    }

    // round-17 probe: H264.nalStats at 1×/k× stream count — the claimed
    // shape is NAL-count-linear (header-prefix parse only, slice data
    // never entropy-decoded), so wall must scale ≤ linearly in streams.
    // parse_ok is summed as the action so a silent degrade (all-flagged
    // rows would still be "fast") fails the probe, not just the timing.
    if (familyOn("h264NalStats", "mp4Meta")) Seq(1, k).foreach { times =>
      val ids = docs.select(col("doc_id")).filter(col("doc_id").isNotNull)
      val rep = (0 until times).map(i =>
        ids.select((col("doc_id") + lit(i * 1000000L)).as("doc_id")))
        .reduce(_.unionByName(_))
      val n = rep.count()
      def run(name: String, parsed: => Long): Unit = {
        if (probeOnly.exists(f => !f.exists(name.startsWith))) return
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok = parsed
        val sec = (System.nanoTime() - t0) / 1e9
        require(ok == n, s"$name: $ok parsed of $n streams")
        println(f"$name%-13s ${sec}%7.2f s  streams=$n parsed=$ok")
      }
      run("h264NalStats", graft.ops.H264.nalStats(
        graft.ops.H264.syntheticH264Table(rep, "doc_id"))
        .filter(col("parse_ok")).count())
      run("mp4Meta", graft.ops.Mp4.mp4Meta(
        graft.ops.Mp4.syntheticMp4Table(rep, "doc_id"))
        .filter(col("parse_ok")).count())
    }

    // round-18 probes: the four new metadata parsers at 1×/k× media
    // count — each claims one narrow mapPartitions pass linear in its
    // structural element count (samples/IFD entries/frames), so wall
    // must scale ≤ linearly in media. parse_ok is the action, as above.
    if (familyOn("mp4NalStats", "exifMeta", "adtsStats", "mp3Stats",
        "id3Meta", "subStats", "ebmlMeta", "gpsScrub", "zipMeta", "pdfMeta",
        "avroMeta", "pngMeta", "jpegMeta"))
      Seq(1, k).foreach { times =>
        val ids = docs.select(col("doc_id")).filter(col("doc_id").isNotNull)
        val rep = (0 until times).map(i =>
          ids.select((col("doc_id") + lit(i * 1000000L)).as("doc_id")))
          .reduce(_.unionByName(_))
        val n = rep.count()
        def run(name: String, parsed: => Long): Unit = {
          if (probeOnly.exists(f => !f.exists(name.startsWith))) return
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val ok = parsed
          val sec = (System.nanoTime() - t0) / 1e9
          require(ok == n, s"$name: $ok parsed of $n media")
          println(f"$name%-13s ${sec}%7.2f s  media=$n parsed=$ok")
        }
        run("mp4NalStats", graft.ops.Mp4.mp4NalStats(
          graft.ops.Mp4.syntheticMp4SamplesTable(rep, "doc_id"))
          .filter(col("parse_ok")).count())
        run("exifMeta", graft.ops.Exif.exifMeta(
          graft.ops.Exif.syntheticExifTable(rep, "doc_id"))
          .filter(col("parse_ok")).count())
        run("adtsStats", graft.ops.Adts.adtsStats(
          graft.ops.Adts.syntheticAdtsTable(rep, "doc_id"))
          .filter(col("parse_ok")).count())
        run("mp3Stats", graft.ops.Mp3.mp3Stats(
          graft.ops.Mp3.syntheticMp3Table(rep, "doc_id"))
          .filter(col("parse_ok")).count())
        run("id3Meta", graft.ops.Mp3.id3Meta(
          graft.ops.Mp3.syntheticTaggedMp3Table(rep, "doc_id"))
          .filter(col("parse_ok")).count())
        run("subStats", graft.ops.Subtitles.subStats(
          graft.ops.Subtitles.syntheticSubsTable(rep, "doc_id"),
          "media_id", "text")
          .filter(col("parse_ok")).count())
        run("ebmlMeta", graft.ops.Ebml.ebmlMeta(
          graft.ops.Ebml.syntheticWebmTable(rep, "doc_id"))
          .filter(col("parse_ok")).count())
        // the scrub WRITE path chained into the geotag read-back: every
        // scrubbed file must parse geotag-free, so the action verifies
        // the whole pipe, not just wall time
        run("gpsScrub", graft.ops.Exif.gpsMeta(
          graft.ops.Exif.scrubGps(
            graft.ops.Exif.syntheticExifTable(rep, "doc_id")))
          .filter(col("parse_ok") && col("has_gps") === 0).count())
        run("zipMeta", graft.ops.Zip.zipMeta(
          graft.ops.Zip.syntheticZipTable(rep, "doc_id"))
          .filter(col("parse_ok")).count())
        run("pdfMeta", graft.ops.Pdf.pdfMeta(
          graft.ops.Pdf.syntheticPdfTable(rep, "doc_id"))
          .filter(col("parse_ok")).count())
        // r19: real-Avro-writer build + walk (incl. the raw-deflate
        // inflate of every even-id file's blocks)
        run("avroMeta", graft.ops.Avro.avroMeta(
          graft.ops.Avro.realAvroTable(rep, "doc_id"))
          .filter(col("parse_ok")).count())
        // r19: real-ImageIO build + CRC-verified chunk walk
        run("pngMeta", graft.ops.Png.pngMeta(
          graft.ops.Png.syntheticPngTable(rep, "doc_id"))
          .filter(col("parse_ok")).count())
        // r19: real-ImageIO JPEG build + marker/entropy walk
        run("jpegMeta", graft.ops.Jpeg.jpegMeta(
          graft.ops.Jpeg.syntheticJpegTable(rep, "doc_id"))
          .filter(col("parse_ok")).count())
      }

    // round-19 probe: the parquet footer walker at 1×/k× file count —
    // one narrow mapPartitions pass whose cost is FOOTER-size-linear
    // (page bytes are never touched), so wall must scale ≤ linearly in
    // file count. The payload is a real parquet-mr file written once by
    // Spark (staged OUTSIDE the timed region) and replicated per doc.
    if (familyOn("parquetFooter")) {
      val pqBytes = {
        val tmp = java.nio.file.Files.createTempDirectory("graft_pqprobe").toString
        docs.select(col("doc_id"), col("text")).filter(col("doc_id").isNotNull)
          .coalesce(1).write.mode("overwrite")
          .option("compression", "snappy")
          .option("parquet.block.size", "8192") // several row groups
          .parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.readAllBytes(part.toPath)
      }
      Seq(1, k).foreach { times =>
        val ids = docs.select(col("doc_id")).filter(col("doc_id").isNotNull)
        val rep = (0 until times).map(i =>
          ids.select((col("doc_id") + lit(i * 1000000L)).as("doc_id")))
          .reduce(_.unionByName(_))
        val n = rep.count()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok = graft.ops.ParquetFooter.footerCensus(
          rep.select(col("doc_id").cast("string").as("file"),
            lit(pqBytes).as("payload")))
          .filter(col("parse_ok")).count()
        val sec = (System.nanoTime() - t0) / 1e9
        require(ok == n, s"parquetFooter: $ok parsed of $n files")
        println(f"parquetFooter ${sec}%7.2f s  files=$n parsed=$ok")
      }
    }

    // guard probe: one epoch-0 sentinel next to current-epoch data must
    // fail fast with the offending key named, not build a giant grid row
    // (bound lowered so the bench corpus's ~490k-hour span trips it)
    val corrupt = ev.limit(1).select(col("user_id"), lit(0L).as("ts"), col("event_type"))
      .unionByName(ev)
    val guardOk =
      try {
        graft.ops.TimeSeries.denseCounts(
          corrupt, "user_id", "ts", 3600L * 1000000L,
          maxBucketsPerKey = 100000L).count()
        false
      } catch {
        case e: Throwable if String.valueOf(e).contains("maxBucketsPerKey") ||
            String.valueOf(e.getCause).contains("maxBucketsPerKey") => true
      }
    println("denseCounts sentinel guard: " +
      (if (guardOk) "raised as designed (key named in message)"
       else "NOT RAISED — guard regression"))
    spark.stop()
    // a probe that detected a guard regression must not exit 0
    if (!guardOk) sys.exit(1)
  }
}
