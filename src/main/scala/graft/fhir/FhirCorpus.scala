package graft.fhir

import java.nio.file.{Files, Path, Paths}

/** Deterministic synthetic FHIR bundle corpus — the scale analog of
  * [[FhirFixtures]] (which pins per-field behavior on 2 hand-built
  * bundles). The reference's whole workload is a DIRECTORY of per-patient
  * bundle files (`json_pipeline.py:100-118`); this generator materializes
  * N such files (sharded into subdirectories to exercise
  * `recursiveFileLookup`) with controlled per-patient "dirt" — invalid
  * dates/phones, out-of-range geolocation, inverted periods, duplicate
  * ids, missing FK keys — selected by fixed modular conditions on the
  * patient index.
  *
  * Ground truth: [[expectedRows]] computes the post-pipeline aggregate
  * stats (rows surviving dropna+dedup, nulls produced by each cleaner,
  * ordered period pairs, value sums) by folding the SAME trait flags the
  * JSON builder uses — plain Scala arithmetic, no Spark, no JSON parsing.
  * The `fhir_scale` gate then hash-compares the engine's full
  * read→route→extract→clean pipeline output against this prediction: a
  * bug anywhere in that path (schema'd multiLine scan, explode, struct
  * hops, any C1–C6 cleaner, the dropna keys, the keep-first dedup, the
  * parity `patient_id` quirk) breaks the match. Unlike the `fhir_*_oracle`
  * gates, NOTHING here round-trips through Spark — the oracle side is a
  * parquet dump of pre-computed longs.
  */
object FhirCorpus {

  /** Gate-corpus size: ~5k bundles ≈ 33k resources — big enough that the
    * multiLine small-files path and every cleaner branch get real
    * exercise, small enough to generate + ingest in seconds at sf0.01.
    */
  val DefaultPatients = 5000

  /** Per-patient dirt flags — the ONE place generation intent lives; the
    * JSON builder and the expected-stats fold both read only these.
    */
  final case class Traits(i: Int) {
    val pid: String = f"pat-$i%06d"
    val idNull: Boolean = i % 43 == 0 // patient resource.id absent → R1 drops the row
    val dupPatient: Boolean = i % 101 == 0 && !idNull // same id twice → D1 keeps first
    val badBirth: Boolean = i % 37 == 0 // "03/04/<y>" → C1 nullifies
    val badPhone: Boolean = i % 23 == 0 // "bogus-phone" → C2 nullifies
    val badLat: Boolean = i % 41 == 0 // 95.0 → C3 nullifies
    val hasMbInt: Boolean = i % 5 == 0 // multipleBirthInteger=2 → C5 backfills bool
    val hasRace: Boolean = i % 3 != 0 // race extension present (urls alternate)
    val raceModern: Boolean = i % 2 == 0 // modern US-Core url vs reference's literal
    val nEnc: Int = 1 + i % 3
    val encInvert: Boolean = i % 13 == 0 // encounter 0 period inverted → C4 swaps
    val encBadEnd: Boolean = i % 29 == 0 // encounter 0 period.end "not-a-date" → C1
    val dupEnc: Boolean = i % 53 == 0 // encounter 0 id duplicated → D1
    val hasCond: Boolean = i % 2 == 1
    val condBadAbate: Boolean = hasCond && i % 17 == 0 // abatement invalid → C1
    val condInvert: Boolean = hasCond && i % 31 == 0 && !condBadAbate // → C4
    /** Extra CLEAN comorbid conditions (display, code) beyond the primary
      * Diabetes — only on `hasCond` patients, so the condition "basket"
      * population stays exactly the hasCond set. The modular conditions
      * build real co-occurrence structure for the comorbidity gate:
      * CKD (i%8==5) is a strict subset of Hypertension (i%4==1), so
      * lift(CKD, HTN) is maximal; Asthma (i%10==3) overlaps partially.
      */
    val extraConds: Seq[(String, String)] =
      if (!hasCond) Nil
      else Seq(
        (i % 4 == 1) -> (("Hypertension", "38341003")),
        (i % 8 == 5) -> (("Chronic kidney disease", "709044004")),
        (i % 10 == 3) -> (("Asthma", "195967001"))
      ).collect { case (true, c) => c }
    val nObs: Int = 1 + i % 2
    val obsBadDate: Boolean = i % 47 == 0 // observation 0 effectiveDateTime invalid
    def obsValue(j: Int): Long = (i.toLong * 7 + j) % 100
    val immNoEnc: Boolean = i % 19 == 0 // no encounter.reference → R1 drops the row
    val immBadDate: Boolean = i % 7 == 0 // resource.date invalid → C1 (row survives)
    val hasCp: Boolean = i % 3 == 0
    val cpInvert: Boolean = hasCp && i % 11 == 0 // careplan period inverted → C4
  }

  // -- JSON builder ---------------------------------------------------------

  private def month(i: Int): Int = 1 + i % 12
  private def day(i: Int): Int = 1 + i % 28
  private def date(y: Int, i: Int): String = f"$y%04d-${month(i)}%02d-${day(i)}%02d"
  private def dt(y: Int, i: Int, hh: Int): String = f"${date(y, i)}T$hh%02d:00:00-05:00"

  private val Races =
    Seq(("White", "2106-3"), ("Asian", "2028-9"), ("Black", "2054-5"), ("Other", "2131-1"))

  /** One collection Bundle for patient `i` — same shapes as the fixture
    * bundles (FIXTURES.md §1), values driven entirely by [[Traits]].
    */
  def bundleJson(i: Int): String = {
    val t = Traits(i)
    val sb = new StringBuilder(4096)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]

    val gender = Seq("female", "male", "other")(i % 3)
    val idField = if (t.idNull) "" else s""""id":"${t.pid}","""
    val birth = if (t.badBirth) s"03/04/${1950 + i % 50}" else date(1950 + i % 50, i)
    val phone = if (t.badPhone) "bogus-phone" else f"555-${100 + i % 900}%03d-${1000 + i % 9000}%04d"
    val lat = if (t.badLat) "95.0" else f"${30.0 + (i % 200) / 10.0}%.1f"
    val mb = if (t.hasMbInt) """"multipleBirthInteger":2,""" else ""
    val (raceUrl, ethUrl) =
      if (t.raceModern)
        ("http://hl7.org/fhir/us/core/StructureDefinition/us-core-race",
          "http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity")
      else
        ("http://hl7.org/fhir/StructureDefinition/us-core-race",
          "http://hl7.org/fhir/StructureDefinition/us-core-ethnicity")
    val (raceDisp, raceCode) = Races((i / 3) % Races.size)
    val raceExt = if (!t.hasRace) "" else
      s"""{"url":"$raceUrl","valueCodeableConcept":{"coding":[{"display":"$raceDisp","code":"$raceCode"}]}},"""
    val patientResource =
      s"""{"resourceType":"Patient",$idField"gender":"$gender","birthDate":"$birth",$mb
         |"address":[{"line":["${i % 997} Oak St"],"city":"Springfield","state":"MA","postalCode":"01101",
         |"extension":[{"extension":[{"url":"latitude","valueDecimal":$lat},{"url":"longitude","valueDecimal":-72.5}]}]}],
         |"telecom":[{"system":"email","value":"p$i@x.y"},{"system":"phone","value":"$phone"}],
         |"name":[{"given":["G$i"],"family":"F${i % 611}"}],
         |"extension":[$raceExt{"url":"$ethUrl","valueCodeableConcept":{"coding":[{"display":"Nonhispanic","code":"2186-5"}]}}],
         |"maritalStatus":{"coding":[{"code":"${if (i % 2 == 0) "M" else "S"}"}]}}""".stripMargin.replace("\n", "")
    entries += s"""{"fullUrl":"urn:uuid:${t.pid}","resource":$patientResource}"""
    if (t.dupPatient)
      entries += s"""{"fullUrl":"urn:uuid:zz-dup-${t.pid}","resource":$patientResource}"""

    for (j <- 0 until t.nEnc) {
      val eid = s"enc-$i-$j"
      val (s0, e0) = (dt(2015, i + j, 8), dt(2015, i + j, 10))
      val (start, end) =
        if (j == 0 && t.encBadEnd) (s0, "not-a-date")
        else if (j == 0 && t.encInvert) (e0, s0)
        else (s0, e0)
      val enc =
        s"""{"fullUrl":"urn:uuid:$eid","resource":{"resourceType":"Encounter","id":"$eid",
           |"status":"finished","class":{"code":"ambulatory"},
           |"patient":{"reference":"urn:uuid:${t.pid}"},
           |"period":{"start":"$start","end":"$end"},
           |"type":[{"coding":[{"code":"185349003"}],"text":"Checkup"}],
           |"reason":{"coding":[{"code":"44054006","display":"Checkup"}]}}}""".stripMargin.replace("\n", "")
      entries += enc
      if (j == 0 && t.dupEnc)
        entries += enc.replace(s""""fullUrl":"urn:uuid:$eid"""", s""""fullUrl":"urn:uuid:zz-dup-$eid"""")
    }

    if (t.hasCond) {
      val (on0, ab0) = (dt(2014, i, 0), dt(2015, i, 0))
      val ab = if (t.condBadAbate) "never" else if (t.condInvert) on0 else ab0
      val on = if (t.condInvert) ab0 else on0
      entries +=
        s"""{"fullUrl":"urn:uuid:con-$i","resource":{"resourceType":"Condition","id":"con-$i",
           |"clinicalStatus":"active","verificationStatus":"confirmed",
           |"subject":{"reference":"urn:uuid:${t.pid}"},"context":{"reference":"urn:uuid:enc-$i-0"},
           |"onsetDateTime":"$on","abatementDateTime":"$ab",
           |"code":{"coding":[{"display":"Diabetes","code":"44054006"}]}}}""".stripMargin.replace("\n", "")
    }

    t.extraConds.zipWithIndex.foreach { case ((disp, code), k) =>
      // clean comorbid conditions: valid ordered dates, no dirt — the
      // comorbidity gate measures co-occurrence, the dirty branches are
      // the PRIMARY condition's job
      entries +=
        s"""{"fullUrl":"urn:uuid:con-$i-x$k","resource":{"resourceType":"Condition","id":"con-$i-x$k",
           |"clinicalStatus":"active","verificationStatus":"confirmed",
           |"subject":{"reference":"urn:uuid:${t.pid}"},"context":{"reference":"urn:uuid:enc-$i-0"},
           |"onsetDateTime":"${dt(2014, i + k, 0)}","abatementDateTime":"${dt(2015, i + k, 0)}",
           |"code":{"coding":[{"display":"$disp","code":"$code"}]}}}""".stripMargin.replace("\n", "")
    }

    for (j <- 0 until t.nObs) {
      val eff = if (j == 0 && t.obsBadDate) "13/01/2015" else dt(2015, i + j, 11)
      entries +=
        s"""{"fullUrl":"urn:uuid:obs-$i-$j","resource":{"resourceType":"Observation","id":"obs-$i-$j",
           |"status":"final","subject":{"reference":"urn:uuid:${t.pid}"},
           |"encounter":{"reference":"urn:uuid:enc-$i-0"},
           |"effectiveDateTime":"$eff","valueQuantity":{"value":${t.obsValue(j)},"unit":"%"},
           |"code":{"coding":[{"display":"HbA1c","code":"4548-4"}]}}}""".stripMargin.replace("\n", "")
    }

    val immDate = if (t.immBadDate) "01-01-2015" else dt(2015, i, 12)
    val immEnc = if (t.immNoEnc) "" else s""""encounter":{"reference":"urn:uuid:enc-$i-0"},"""
    entries +=
      s"""{"fullUrl":"urn:uuid:imm-$i","resource":{"resourceType":"Immunization","status":"completed",
         |"date":"$immDate","patient":{"reference":"urn:uuid:${t.pid}"},$immEnc
         |"wasNotGiven":false,"primarySource":true,
         |"vaccineCode":{"coding":[{"display":"Influenza","code":"140"}]}}}""".stripMargin.replace("\n", "")

    if (t.hasCp) {
      val (s0, e0) = (date(2015, i), date(2016, i))
      val (start, end) = if (t.cpInvert) (e0, s0) else (s0, e0)
      entries +=
        s"""{"fullUrl":"urn:uuid:cp-$i","resource":{"resourceType":"CarePlan","status":"active",
           |"subject":{"reference":"urn:uuid:${t.pid}"},"context":{"reference":"urn:uuid:enc-$i-0"},
           |"period":{"start":"$start","end":"$end"},
           |"category":[{"coding":[{"display":"Diabetes self management plan","code":"698360004"}]}],
           |"activity":[{"detail":{"code":{"coding":[{"display":"Diabetic diet","code":"160670007"}]}}},
           |{"detail":{"code":{"coding":[]}}},
           |{"detail":{"code":{"coding":[{"display":"Exercise therapy","code":"229065009"}]}}}]}}""".stripMargin.replace("\n", "")
    }

    sb ++= """{"resourceType":"Bundle","type":"collection","entry":["""
    sb ++= entries.mkString(",")
    sb ++= "]}"
    sb.toString
  }

  // -- ground truth ---------------------------------------------------------

  /** One expected-aggregate row per cleaned table. Counts not applicable to
    * a table are 0 (same convention on the engine side).
    */
  final case class ExpectedRow(
      table: String, n_rows: Long, n_patients: Long, n_date_null: Long,
      n_pairs_ordered: Long, n_phone_null: Long, n_geo_null: Long,
      n_mb_zero: Long, n_race: Long, sum_obs_value: Long)

  /** Fold the trait flags into post-pipeline aggregates — the reasoning per
    * table mirrors `fhir/Cleaning.scala` ORDER of steps:
    *  - patient: dropna(id) → C5/C6 → C1 dates/C2 phone → dedup(id) → C3 geo.
    *    `idNull` rows never survive, so every other flag counts only when
    *    `!idNull`; the id-duplicate's values are identical so keep-first
    *    leaves aggregates unchanged.
    *  - encounter: both dropna keys always present; the C1-nullified end
    *    (`encBadEnd`) removes that pair from the ordered-pair count (C4
    *    only swaps COMPLETE pairs); the id-duplicate is dropped by D1.
    *  - condition/observation: dropna keys (id, patient_id) always present
    *    since `subject.reference` is emitted for every child resource.
    *  - immunization: `immNoEnc` rows are dropped by R1 (missing
    *    encounter.reference); `patient_id` is NULL on every row (parity
    *    quirk: Immunization carries patient.reference, not subject).
    *  - careplan: no dropna/dedup; inverted periods swap to ordered.
    */
  def expectedRows(n: Int): Seq[ExpectedRow] = {
    var patRows, patDateNull, patPhoneNull, patGeoNull, patMbZero, patRace = 0L
    var encRows, encDateNull, encPairs = 0L
    var conRows, conPatients, conDateNull, conPairs = 0L
    var obsRows, obsDateNull, obsSum = 0L
    var immRows, immDateNull = 0L
    var cpRows, cpPairs = 0L
    var i = 0
    while (i < n) {
      val t = Traits(i)
      if (!t.idNull) {
        patRows += 1
        if (t.badBirth) patDateNull += 1
        if (t.badPhone) patPhoneNull += 1
        if (t.badLat) patGeoNull += 1
        if (!t.hasMbInt) patMbZero += 1
        if (t.hasRace) patRace += 1
      }
      encRows += t.nEnc
      if (t.encBadEnd) { encDateNull += 1; encPairs += t.nEnc - 1 }
      else encPairs += t.nEnc
      if (t.hasCond) {
        conRows += 1
        conPatients += 1
        if (t.condBadAbate) conDateNull += 1 else conPairs += 1
        // extra comorbid conditions are clean: each adds one row with an
        // ordered date pair, same patient
        conRows += t.extraConds.size
        conPairs += t.extraConds.size
      }
      obsRows += t.nObs
      if (t.obsBadDate) obsDateNull += 1
      var j = 0
      while (j < t.nObs) { obsSum += t.obsValue(j); j += 1 }
      if (!t.immNoEnc) {
        immRows += 1
        if (t.immBadDate) immDateNull += 1
      }
      if (t.hasCp) { cpRows += 1; cpPairs += 1 }
      i += 1
    }
    val nL = n.toLong
    Seq(
      ExpectedRow("patient", patRows, patRows, patDateNull, 0L, patPhoneNull,
        patGeoNull, patMbZero, patRace, 0L),
      // encounter/immunization: patient_id is null on every row (parity quirk)
      ExpectedRow("encounter", encRows, 0L, encDateNull, encPairs, 0L, 0L, 0L, 0L, 0L),
      ExpectedRow("condition", conRows, conPatients, conDateNull, conPairs, 0L, 0L, 0L, 0L, 0L),
      ExpectedRow("observation", obsRows, nL, obsDateNull, 0L, 0L, 0L, 0L, 0L, obsSum),
      ExpectedRow("immunization", immRows, 0L, immDateNull, 0L, 0L, 0L, 0L, 0L, 0L),
      ExpectedRow("careplan", cpRows, cpRows, 0L, cpPairs, 0L, 0L, 0L, 0L, 0L))
  }

  /** RAW per-resource-type entry counts (pre-routing, pre-cleaning —
    * id-duplicates included), predicted from the trait flags. The
    * `stream_fhir` gate embeds these as oracle literals: the streaming
    * bundle reader's multi-batch ingest must land the same totals.
    */
  def expectedEntryCounts(n: Int): Seq[(String, Long)] = {
    var pat, enc, con, obs, imm, cp = 0L
    var i = 0
    while (i < n) {
      val t = Traits(i)
      pat += (if (t.dupPatient) 2 else 1)
      enc += t.nEnc + (if (t.dupEnc) 1 else 0)
      if (t.hasCond) con += 1 + t.extraConds.size
      obs += t.nObs
      imm += 1
      if (t.hasCp) cp += 1
      i += 1
    }
    Seq("CarePlan" -> cp, "Condition" -> con, "Encounter" -> enc,
      "Immunization" -> imm, "Observation" -> obs, "Patient" -> pat)
  }

  // -- materialization ------------------------------------------------------

  private val Shards = 16

  /** Write `n` bundle files under `dir`, sharded into `shard-XX/`
    * subdirectories (exercising the recursive listing the reference's
    * staging script existed for). Idempotent via a count-stamped marker —
    * a corpus from a previous JVM with the same `n` is reused as-is
    * (generation is deterministic, so the bytes are identical).
    */
  def generate(dir: Path, n: Int): Unit = {
    // v2: comorbid-condition entries added — the version in the marker
    // name invalidates corpora generated by earlier builders
    val marker = dir.resolve(s"_complete_v2_$n")
    if (Files.exists(marker)) return
    if (Files.exists(dir)) { // stale or partial corpus of a different size
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(dir) // stream holds directory handles — close it
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
    for (s <- 0 until Shards) Files.createDirectories(dir.resolve(f"shard-$s%02d"))
    var i = 0
    while (i < n) {
      Files.writeString(
        dir.resolve(f"shard-${i % Shards}%02d").resolve(f"p$i%06d.json"), bundleJson(i))
      i += 1
    }
    Files.writeString(marker, n.toString)
  }

  /** The gate corpus on disk — generated on first touch per JVM/workspace.
    * Absolute path: a stable `target/` location (NOT a fresh temp dir) so
    * repeated Verify/test runs re-use one corpus.
    */
  lazy val corpusDir: String = {
    val p = Paths.get("target/verify-fhir-corpus").toAbsolutePath
    generate(p, DefaultPatients)
    p.toString
  }

  /** Where Verify materializes [[expectedRows]] for the DuckDB oracle. */
  lazy val expectedDumpDir: String =
    new java.io.File("target/verify-fhir-expected").getAbsolutePath

  /** Comorbidity ground truth: the co-occurrence lift table over
    * (patient, condition display) predicted by a NAIVE driver-side fold
    * of the trait flags — the same definition as
    * [[graft.ops.GraphOps.cooccurrenceLift]] (distinct membership,
    * A-priori floor on items AND pairs, lift = n_ab·N/(n_a·n_b) with one
    * HALF_UP 6 dp rounding), implemented as plain Scala loops so the
    * `fhir_comorbidity` gate compares the distributed operator against
    * independent arithmetic. Condition rows always survive cleaning
    * (both dropna keys are emitted for every condition, ids are unique),
    * so basket membership is exactly the generator's sets.
    */
  final case class ComorbidityRow(item_a: String, item_b: String, n_ab: Long, lift: Double)

  def expectedComorbidity(n: Int, minCount: Long = 2L): Seq[ComorbidityRow] = {
    val baskets: Seq[Seq[String]] = (0 until n).flatMap { i =>
      val t = Traits(i)
      if (!t.hasCond) None
      else Some(("Diabetes" +: t.extraConds.map(_._1)).distinct)
    }
    val nBaskets = baskets.size.toLong
    val itemCounts = scala.collection.mutable.Map.empty[String, Long]
    baskets.foreach(_.foreach(c => itemCounts(c) = itemCounts.getOrElse(c, 0L) + 1))
    val frequent = itemCounts.filter(_._2 >= minCount).keySet
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    baskets.foreach { b =>
      val f = b.filter(frequent).sorted
      for (x <- f.indices; y <- x + 1 until f.size)
        pairCounts((f(x), f(y))) = pairCounts.getOrElse((f(x), f(y)), 0L) + 1
    }
    pairCounts.toSeq
      .filter(_._2 >= minCount)
      .map { case ((a, b), nab) =>
        val lift = (nab * nBaskets).toDouble / (itemCounts(a) * itemCounts(b)).toDouble
        ComorbidityRow(a, b, nab,
          BigDecimal(lift).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy(r => (r.item_a, r.item_b))
  }

  /** Where Verify materializes [[expectedComorbidity]] for its oracle. */
  lazy val comorbidityDumpDir: String =
    new java.io.File("target/verify-fhir-comorbidity").getAbsolutePath

  /** Latest-observation ground truth (the "current vitals" row): per
    * patient, the HbA1c value of the newest VALID-dated observation —
    * the [[graft.ops.TimeSeries.pivotLatest]] prediction, folded from
    * the trait flags. Observation j carries effectiveDateTime
    * dt(2015, i+j, 11) (strictly increasing in j) and value
    * obsValue(j); C1 nullifies observation 0's date when `obsBadDate`,
    * and a null-dated observation can't win a latest-by-time pivot. A
    * single-observation patient whose only date is invalid has NO
    * pivot row. Values arrive as doubles through the JSON path, so the
    * prediction emits doubles.
    */
  final case class LatestObsRow(patient_id: String, hba1c_value: Double)

  def expectedLatestObs(n: Int): Seq[LatestObsRow] =
    (0 until n).flatMap { i =>
      val t = Traits(i)
      // argmax by the ACTUAL (date string, resource id) pair the pivot
      // compares — month/day wrap with the index, so j order is NOT
      // date order (i ≡ 11 mod 12 has obs 0 in December, obs 1 in
      // January of the same year)
      val valid = (0 until t.nObs)
        .filterNot(j => j == 0 && t.obsBadDate)
        .map(j => ((dt(2015, i + j, 11), s"obs-$i-$j"), j))
      if (valid.isEmpty) None
      else Some(LatestObsRow(t.pid, t.obsValue(valid.max._2).toDouble))
    }

  /** Where Verify materializes [[expectedLatestObs]] for its oracle. */
  lazy val latestObsDumpDir: String =
    new java.io.File("target/verify-fhir-latest-obs").getAbsolutePath

  /** Charlson weights for the corpus's condition vocabulary — the
    * public 1987 category weights for the categories the generator
    * emits: Diabetes 1, moderate/severe renal disease 2, chronic
    * pulmonary disease (Asthma) 1. Hypertension is NOT a Charlson
    * category — it stays out of the map and must score zero while
    * still counting as a condition (that asymmetry is what the gate
    * proves about the weighted-index join).
    */
  val CharlsonWeights: Map[String, Long] = Map(
    "Diabetes" -> 1L,
    "Chronic kidney disease" -> 2L,
    "Asthma" -> 1L)

  /** Per-patient Charlson prediction folded from the trait flags:
    * every `hasCond` patient carries Diabetes plus the modular extras,
    * condition rows always survive cleaning (see
    * [[expectedComorbidity]]), so the index is plain arithmetic on i.
    */
  final case class CharlsonRow(
    patient_id: String, n_items: Long, n_weighted: Long, score: Long)

  def expectedCharlson(n: Int): Seq[CharlsonRow] =
    (0 until n).flatMap { i =>
      val t = Traits(i)
      if (!t.hasCond) None
      else {
        val htn = i % 4 == 1
        val ckd = i % 8 == 5
        val asthma = i % 10 == 3
        val nItems = 1L + Seq(htn, ckd, asthma).count(identity)
        val nWeighted = 1L + Seq(ckd, asthma).count(identity)
        val score = 1L + (if (ckd) 2L else 0L) + (if (asthma) 1L else 0L)
        Some(CharlsonRow(t.pid, nItems, nWeighted, score))
      }
    }

  /** Where Verify materializes [[expectedCharlson]] for its oracle. */
  lazy val charlsonDumpDir: String =
    new java.io.File("target/verify-fhir-charlson").getAbsolutePath

  /** Dump the ground-truth aggregates as parquet — the ONLY thing the
    * `fhir_scale` / `fhir_comorbidity` oracles read. The rows come from
    * the trait folds above, never from Spark's JSON reader, so the gates
    * are independent predictions, not round-trips.
    */
  def dumpExpected(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    expectedRows(DefaultPatients).toDF()
      .coalesce(1).write.mode("overwrite").parquet(expectedDumpDir)
    expectedComorbidity(DefaultPatients).toDF()
      .coalesce(1).write.mode("overwrite").parquet(comorbidityDumpDir)
    expectedLatestObs(DefaultPatients).toDF()
      .coalesce(1).write.mode("overwrite").parquet(latestObsDumpDir)
    expectedCharlson(DefaultPatients).toDF()
      .coalesce(1).write.mode("overwrite").parquet(charlsonDumpDir)
  }
}
