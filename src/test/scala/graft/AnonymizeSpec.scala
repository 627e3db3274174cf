package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Anonymize

class AnonymizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, nation, segment)
  val recs = Seq(
    (1L, "DE", "auto"), (2L, "DE", "auto"), (3L, "DE", "auto"),
    (4L, "DE", "bank"), (5L, "FR", "auto"), (6L, "FR", "auto"),
    (7L, "FR", "bank"))

  test("kAnonymize keeps only rows in groups of >= k, attaches qi_n") {
    val got = Anonymize.kAnonymize(recs.toDF("id", "nation", "seg"),
        Seq("nation", "seg"), k = 2).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("qi_n")).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 5L -> 2L, 6L -> 2L))
    intercept[IllegalArgumentException] {
      Anonymize.kAnonymize(recs.toDF("id", "nation", "seg"),
        Seq("nation"), k = 1)
    }
    // null QI values form a GROUP (null-safe join): if enough rows
    // share the null, they release — exactly what the report says
    val withNull = recs ++ Seq((8L, null.asInstanceOf[String], "auto"),
      (9L, null.asInstanceOf[String], "auto"))
    val gotN = Anonymize.kAnonymize(withNull.toDF("id", "nation", "seg"),
        Seq("nation", "seg"), k = 2).collect()
      .map(r => r.getAs[Long]("id")).toSet
    assert(gotN.contains(8L) && gotN.contains(9L),
      s"null-QI group of 2 must release under k=2: $gotN")
  }

  test("kAnonymityReport flags exactly the failing groups") {
    val got = Anonymize.kAnonymityReport(recs.toDF("id", "nation", "seg"),
        Seq("nation", "seg"), k = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(("DE", "auto")) == ((3L, false)))
    assert(got(("DE", "bank")) == ((1L, true)))
    assert(got(("FR", "bank")) == ((1L, true)))
  }

  /** The operator's exact noise draw, replayed sequentially. */
  private def refNoise(key: Long, seed: Long): Long = {
    val M = 2147483647L
    def lehmer(x: Long): Long = {
      val m = ((x % M) + M) % M
      m * 48271L % M
    }
    val u = lehmer(lehmer(key + seed) + seed)
    val sign = 1L - 2L * (u % 2)
    var v = u / 2
    var mag = 0L
    while ((v & 1L) == 1L) { mag += 1; v >>= 1 }
    sign * mag
  }

  test("forgetUsers/forgetAudit: cascade removes every tombstoned " +
      "row; audit proves processing of no-match requests") {
    val evs = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
      .toDF("user_id", "x")
    val tomb = Seq(1L, 3L, 99L).toDF("uid")   // 99 matches nothing
    val scrubbed = Anonymize.forgetUsers(evs, "user_id", tomb, "uid")
    assert(scrubbed.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val audit = Anonymize.forgetAudit(evs, "user_id", tomb, "uid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(audit == Map(1L -> 2L, 3L -> 1L, 99L -> 0L))
    // conservation: removed + surviving = original
    assert(audit.values.sum + scrubbed.count() == evs.count())
    // apply and audit normalize the key IDENTICALLY (both cast long),
    // so a string-typed user column cannot make them disagree
    val sevs = Seq(("1", "a"), ("2", "b")).toDF("user_id", "x")
    val sscr = Anonymize.forgetUsers(sevs, "user_id", tomb, "uid")
    val saud = Anonymize.forgetAudit(sevs, "user_id", tomb, "uid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sscr.collect().map(_.getString(0)).toSeq == Seq("2"))
    assert(saud(1L) == 1L && saud(3L) == 0L)
  }

  test("noisyCounts: noise replays the seeded Lehmer draw exactly, " +
      "clamps at zero, and magnitudes look geometric(1/2)") {
    val rows = (0L until 2000L).map(i => (i % 400, "x"))
    val got = Anonymize.noisyCounts(rows.toDF("k", "pad"), "k", seed = 7L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 400)
    got.foreach { case (k, (n, noise, noisy)) =>
      assert(n == 5L)
      assert(noise == refNoise(k, 7L), s"key $k noise mismatch")
      assert(noisy == math.max(n + noise, 0L))
    }
    // distribution sanity over the 400 draws: about half zero,
    // magnitude >= 3 rare
    val mags = got.values.map(v => math.abs(v._2)).toSeq
    assert(mags.count(_ == 0) > 140 && mags.count(_ == 0) < 260)
    assert(mags.count(_ >= 3) < 60)
    // clamp: a key whose count is tiny can't go negative
    val tiny = Anonymize.noisyCounts(Seq((1L, "x")).toDF("k", "pad"), "k",
      seed = 7L).collect().head
    assert(tiny.getLong(3) >= 0L)
  }

  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null) t else rootCause(t.getCause)

  test("forgetUsers/forgetAudit: an uncastable id on either side " +
      "refuses loudly instead of silently retaining the row") {
    val evs = Seq(("1", "a"), ("oops", "b")).toDF("user_id", "x")
    val tomb = Seq(1L).toDF("uid")
    val e1 = intercept[Exception] {
      Anonymize.forgetUsers(evs, "user_id", tomb, "uid").collect()
    }
    assert(rootCause(e1).getMessage.contains("not castable"),
      rootCause(e1).getMessage)
    val e2 = intercept[Exception] {
      Anonymize.forgetAudit(evs, "user_id", tomb, "uid").collect()
    }
    assert(rootCause(e2).getMessage.contains("not castable"))
    val badTomb = Seq("u-7").toDF("uid")
    val goodEvs = Seq((1L, "a")).toDF("user_id", "x")
    val e3 = intercept[Exception] {
      Anonymize.forgetUsers(goodEvs, "user_id", badTomb, "uid").collect()
    }
    assert(rootCause(e3).getMessage.contains("tombstone"))
    // SQL-null ids are NOT a refusal: a null user id belongs to no
    // user, so the row is retained (null matches no tombstone)
    val nullEvs = Seq((Some(1L), "a"), (None, "b"))
      .toDF("user_id", "x")
    val kept = Anonymize.forgetUsers(nullEvs, "user_id", tomb, "uid")
      .collect().map(_.getString(1)).toSet
    assert(kept == Set("b"))
  }

  test("noisyCounts/noisySums: a null or uncastable key refuses " +
      "loudly — a silently zeroed or un-noised group is a privacy bug") {
    val e1 = intercept[Exception] {
      Anonymize.noisyCounts(Seq((Some(1L), "x"), (None, "y"))
        .toDF("k", "pad"), "k", seed = 7L).collect()
    }
    assert(rootCause(e1).getMessage.contains("noisyCounts key"),
      rootCause(e1).getMessage)
    val e2 = intercept[Exception] {
      Anonymize.noisySums(Seq(("zz", 1L)).toDF("k", "v"), "k", "v",
        clip = 10L).collect()
    }
    assert(rootCause(e2).getMessage.contains("noisySums key"))
  }

  test("noisySums: per-row clipping bounds each contribution at " +
      "±clip, noise replays the Lehmer draw scaled by clip, no zero " +
      "clamp, null values refuse") {
    val rows = Seq((1L, 10000L), (1L, -10000L), (2L, 300L), (2L, -100L),
      (3L, -9999L))
      .toDF("k", "v")
    val got = Anonymize.noisySums(rows, "k", "v", clip = 500L, seed = 7L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // key 1: +10000 clips to +500, -10000 to -500 -> sum 0
    assert(got(1L)._1 == 0L, s"got $got")
    // key 2: inside the cap, untouched
    assert(got(2L)._1 == 200L)
    // key 3: one row over the cap contributes exactly -clip
    assert(got(3L)._1 == -500L)
    got.foreach { case (k, (s, noise, noisy)) =>
      assert(noise == refNoise(k, 7L) * 500L, s"key $k noise")
      assert(noisy == s + noise, "sums are not zero-clamped")
    }
    val e = intercept[Exception] {
      Anonymize.noisySums(Seq((1L, Some(1L)), (2L, None)).toDF("k", "v"),
        "k", "v", clip = 10L).collect()
    }
    assert(rootCause(e).getMessage.contains("noisySums value"))
    intercept[IllegalArgumentException] {
      Anonymize.noisySums(rows, "k", "v", clip = 0L)
    }
  }

  test("kAnonymizeLDiverse/lDiversityReport: a homogeneous sensitive " +
      "group fails l even when it passes k") {
    // (nation, seg) groups: DE/auto size 3 all-"x" (homogeneous),
    // FR/auto size 3 with 2 values (diverse), FR/bank size 1
    val rows = Seq(
      (1L, "DE", "auto", "x"), (2L, "DE", "auto", "x"),
      (3L, "DE", "auto", "x"),
      (4L, "FR", "auto", "x"), (5L, "FR", "auto", "y"),
      (6L, "FR", "auto", "y"),
      (7L, "FR", "bank", "z"))
      .toDF("id", "nation", "seg", "sens")
    val rel = Anonymize.kAnonymizeLDiverse(rows, Seq("nation", "seg"),
        "sens", k = 2, l = 2).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("qi_n"), r.getAs[Long]("qi_l")))).toMap
    assert(rel.keySet == Set(4L, 5L, 6L), s"got $rel")
    assert(rel(4L) == ((3L, 2L)))
    val rep = Anonymize.lDiversityReport(rows, Seq("nation", "seg"),
        "sens", k = 2, l = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4),
          r.getBoolean(5)))).toMap
    assert(rep(("DE", "auto")) == ((3L, 1L, false, true)))
    assert(rep(("FR", "auto")) == ((3L, 2L, false, false)))
    assert(rep(("FR", "bank")) == ((1L, 1L, true, true)))
    // an all-null sensitive group has diversity 0 and never releases
    val withNull = rows.unionByName(Seq(
      (8L, "IT", "auto", null.asInstanceOf[String]),
      (9L, "IT", "auto", null.asInstanceOf[String]))
      .toDF("id", "nation", "seg", "sens"))
    val rel2 = Anonymize.kAnonymizeLDiverse(withNull,
        Seq("nation", "seg"), "sens", k = 2, l = 2).collect()
      .map(_.getAs[Long]("id")).toSet
    assert(!rel2.contains(8L) && !rel2.contains(9L))
    intercept[IllegalArgumentException] {
      Anonymize.kAnonymizeLDiverse(rows, Seq("nation", "sens"), "sens",
        k = 2, l = 2)
    }
    intercept[IllegalArgumentException] {
      Anonymize.lDiversityReport(rows, Seq("nation"), "sens", k = 2,
        l = 1)
    }
  }

  test("generalizeToK: picks the FIRST ladder width at which every " +
      "group reaches k; floors negatives; refuses an exhausted ladder") {
    // one segment, values 1..12: width 2 leaves singleton buckets,
    // width 5 gives group sizes {4, 5, 3}
    val rows = (1L to 12L).map(v => ("s", v)).toDF("seg", "v")
    val got = Anonymize.generalizeToK(rows, "v", Seq("seg"), k = 3,
        widths = Seq(2L, 5L, 10L)).collect()
      .map(r => r.getAs[Long]("v") -> ((r.getAs[Long]("v_gen"),
        r.getAs[Long]("qi_n"), r.getAs[Long]("gen_width")))).toMap
    assert(got(1L) == ((0L, 4L, 5L)), s"got $got")
    assert(got(7L) == ((5L, 5L, 5L)))
    assert(got(12L) == ((10L, 3L, 5L)))
    assert(got.size == 12)
    // negative values FLOOR to the width multiple below
    val neg = Seq(("s", -3L), ("s", -2L), ("s", -1L))
      .toDF("seg", "v")
    val gotNeg = Anonymize.generalizeToK(neg, "v", Seq("seg"), k = 3,
        widths = Seq(5L)).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("v_gen")).toMap
    assert(gotNeg == Map(-3L -> -5L, -2L -> -5L, -1L -> -5L))
    // k = 4: width 5 min is 3, width 10 min is 3 -> the ladder is
    // exhausted and the operator refuses rather than releasing
    val e = intercept[IllegalArgumentException] {
      Anonymize.generalizeToK(rows, "v", Seq("seg"), k = 4,
        widths = Seq(5L, 10L))
    }
    assert(e.getMessage.contains("no ladder width"))
    intercept[IllegalArgumentException] {
      Anonymize.generalizeToK(rows, "v", Seq("v"), k = 2,
        widths = Seq(5L))
    }
  }

  test("pseudonymize: the two-round lattice exactly, join " +
      "consistency across tables, bijective on a small domain, " +
      "nulls stay null, out-of-domain ids refuse") {
    val m = 1L << 31
    def expected(id: Long, salt: Long): Long = {
      val s1 = ((salt % m) + m) % m
      val s2 = (BigInt(7919) * salt).mod(BigInt(m)).toLong
      val a = ((id % m) + m) % m
      val r1 = BigInt((a + s1) % m) * BigInt(2654435761L) mod BigInt(m)
      ((r1 + s2).mod(BigInt(m)) * BigInt(2246822519L))
        .mod(BigInt(m)).toLong
    }
    val rows = Seq(Some(42L), Some(m - 1L), None).toDF("id")
    val got = Anonymize.pseudonymize(rows, Seq("id"), salt = 99L)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSet == Set(Some(expected(42L, 99L)),
      Some(expected(m - 1L, 99L)), None), s"got ${got.toSet}")
    // same id, same salt, different table -> same pseudonym
    val other = Anonymize.pseudonymize(Seq(42L).toDF("id"),
      Seq("id"), salt = 99L).collect()(0).getLong(0)
    assert(other == expected(42L, 99L))
    // odd multipliers are bijections mod 2^31: 100 ids, 100 pseudonyms
    val many = Anonymize.pseudonymize(
      (0L until 100L).map(Tuple1(_)).toDF("id"), Seq("id"), salt = 5L)
      .collect().map(_.getLong(0)).toSet
    assert(many.size == 100)
    intercept[IllegalArgumentException] {
      Anonymize.pseudonymize(rows, Seq.empty, 1L)
    }
    // ids outside [0, 2^31) would collide with id mod 2^31 — refused
    // loudly (the round-16 advice: a 64-bit snowflake id must not
    // silently merge with another identity)
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null) t else rootCause(t.getCause)
    for (bad <- Seq(m, -7L, Long.MaxValue)) {
      val e = intercept[Exception] {
        Anonymize.pseudonymize(Seq(bad).toDF("id"), Seq("id"), 99L)
          .collect()
      }
      assert(rootCause(e).getMessage.contains("outside [0, 2^31)"),
        s"id=$bad: ${rootCause(e).getMessage}")
    }
    // an uncastable string id refuses too (it would null-merge)
    val e2 = intercept[Exception] {
      Anonymize.pseudonymize(Seq("not-a-number").toDF("id"),
        Seq("id"), 99L).collect()
    }
    assert(rootCause(e2).getMessage.contains("not castable"))
  }

  test("entropyLDiversityReport / kAnonymizeLDiverseEntropy: skewed " +
      "sensitive distributions fail the gate distinct-l passes, the " +
      "micro lattice replays exactly, all-null groups never release") {
    // group A: 50 records, 49 flu + 1 hiv — distinct-l = 2 PASSES the
    // distinct gate, but the attacker is 98% sure: entropy ~0.098 nats
    // << ln 2. Group B: 4 records 2/2 — entropy = ln 2 exactly, the
    // gate boundary, releases. Group C: all-null sensitive.
    val rows = (1 to 49).map(i => (i.toLong, "A", Some("flu"))) ++
      Seq((50L, "A", Some("hiv"))) ++
      Seq((51L, "B", Some("flu")), (52L, "B", Some("flu")),
        (53L, "B", Some("hiv")), (54L, "B", Some("hiv"))) ++
      Seq((55L, "C", None), (56L, "C", None), (57L, "C", None),
        (58L, "C", None))
    val df = rows.toDF("id", "qi", "diag")
    val rep = Anonymize.entropyLDiversityReport(df, Seq("qi"), "diag",
        k = 4, l = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))).toMap
    // the operator's own lattice replayed in plain scala
    def hMicro(cs: Seq[Long]): Long = {
      val n = cs.sum
      val st = cs.map(c => math.floor(
        c.toDouble * math.log(c.toDouble) * 1000000).toLong).sum
      math.floor(math.log(n.toDouble) * 1000000).toLong - st / n
    }
    val hA = hMicro(Seq(49L, 1L))
    val hB = hMicro(Seq(2L, 2L))
    assert(rep("A") == ((50L, 2L, hA, false, true)), s"A: ${rep("A")}")
    assert(hA < 693147L && hA > 0L)
    assert(rep("B") == ((4L, 2L, hB, false, false)), s"B: ${rep("B")}")
    assert(hB == 693147L) // ln 2 on the lattice, exactly at the gate
    assert(rep("C") == ((4L, 0L, -1L, false, true)), s"C: ${rep("C")}")
    // apply: only group B's rows survive, stats attached
    val app = Anonymize.kAnonymizeLDiverseEntropy(df, Seq("qi"), "diag",
      k = 4, l = 2).collect()
    assert(app.length == 4 &&
      app.forall(r => r.getAs[String]("qi") == "B" &&
        r.getAs[Long]("qi_n") == 4L && r.getAs[Long]("qi_h_micro") == hB))
    intercept[IllegalArgumentException] {
      Anonymize.entropyLDiversityReport(df, Seq("qi"), "diag", 4, 1)
    }
    intercept[IllegalArgumentException] {
      Anonymize.entropyLDiversityReport(df, Seq("qi", "diag"), "diag",
        4, 2)
    }
  }

  test("tClosenessReport: hand-computed ordered EMD, verdicts at the " +
      "threshold, null sensitive refuses, single-value domain reads 0") {
    // global: s=0 x3, s=1 x1 (N=4, m=2); class A=(0,0), class B=(0,1)
    // EMD(A) = |1.0 - 0.75| = 0.25; EMD(B) = |0.5 - 0.75| = 0.25
    val df = Seq(("A", 0L), ("A", 0L), ("B", 0L), ("B", 1L))
      .toDF("qi", "s")
    val rep = Anonymize.tClosenessReport(df, Seq("qi"), "s",
      tPpm = 200000L).collect()
    assert(rep.length == 2)
    assert(rep.forall(_.getAs[Long]("emd_ppm") == 250000L))
    assert(rep.forall(_.getAs[Boolean]("suppressed_t")),
      "250000 > 200000 must suppress")
    val loose = Anonymize.tClosenessReport(df, Seq("qi"), "s",
      tPpm = 300000L).collect()
    assert(loose.forall(!_.getAs[Boolean]("suppressed_t")))
    // one sensitive value table-wide: every class trivially identical
    val mono = Seq(("A", 5L), ("B", 5L)).toDF("qi", "s")
    assert(Anonymize.tClosenessReport(mono, Seq("qi"), "s", 0L)
      .collect().forall(r => r.getAs[Long]("emd_ppm") == 0L))
    val nul = intercept[Exception] {
      Anonymize.tClosenessReport(
        Seq(("A", Option.empty[java.lang.Long])).toDF("qi", "s"),
        Seq("qi"), "s", 0L).collect()
    }
    assert(rootCause(nul).getMessage
      .contains("position on the value order"))
  }

  test("kAnonymizeTClose: both gates compose; a skewed-but-large " +
      "group is suppressed by t while a faithful one survives") {
    // 12 rows: class A mirrors the global mix, class B is all-1
    val a = Seq.fill(3)(("A", 0L)) ++ Seq.fill(3)(("A", 1L))
    val b = Seq.fill(6)(("B", 1L))
    val df = (a ++ b).toDF("qi", "s")
    // global: 0 x3, 1 x9. A: (3,3) vs (0.25, 0.75) -> EMD = 0.25
    // B: (0,6) vs (0.25, 0.75) -> EMD = 0.25... both equal here, so
    // use a tighter global: add class C to tilt the global mix
    val df2 = (a ++ b ++ Seq.fill(6)(("C", 0L))).toDF("qi", "s")
    // global: 0 x9, 1 x9; A is exactly faithful (EMD 0), B and C read
    // |0 - 0.5| = 0.5
    val kept = Anonymize.kAnonymizeTClose(df2, Seq("qi"), "s",
      k = 2L, tPpm = 100000L).select("qi").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("A"), s"only the faithful class survives: $kept")
  }
}
