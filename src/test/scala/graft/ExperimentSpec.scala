package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Experiment

class ExperimentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("abTest: 2x2 counts, ppm rates, exact chi-square milli, " +
      "mixed-assignment refusal") {
    // variant 0: u1..u4, u1+u2 convert; variant 1: u5..u8, u5 converts
    val evs = Seq(
      (1L, 0, "purchase"), (1L, 0, "view"), (2L, 0, "purchase"),
      (3L, 0, "view"), (4L, 0, "click"),
      (5L, 1, "purchase"), (6L, 1, "view"), (7L, 1, "view"),
      (8L, 1, "click"))
      .toDF("user_id", "variant", "event_type")
    val r = Experiment.abTest(evs, "user_id", "variant", "event_type",
      "purchase").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 1L, 3L)))
    assert(r.getAs[Long]("rate0_ppm") == 500000L)
    assert(r.getAs[Long]("rate1_ppm") == 250000L)
    assert(r.getAs[Long]("risk_diff_ppm") == -250000L)
    // chi2 = 8*(2*3-2*1)^2 / (4*4*3*5) = 128/240 = 0.5333 -> 533 milli
    assert(r.getAs[Long]("chi2_milli") == 533L)
    val mixed = evs.union(Seq((1L, 1, "view"))
      .toDF("user_id", "variant", "event_type"))
    val e = intercept[Exception] {
      Experiment.abTest(mixed, "user_id", "variant", "event_type",
        "purchase").collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null) t else root(t.getCause)
    assert(root(e).getMessage.contains("multiple variants"))
  }

  test("rollingActives: trailing-window distinct users per slide " +
      "start, window/slide alignment") {
    // window 10, slide 5: event at ts t covers starts (t-10, t]∩5Z
    val evs = Seq((1L, 7L), (1L, 8L), (2L, 12L), (3L, 23L))
      .toDF("user_id", "ts")
    val got = Experiment.rollingActives(evs, "user_id", "ts",
        windowNs = 10L, slideNs = 5L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // t=7,8 (u1) -> starts 0,5; t=12 (u2) -> starts 5,10;
    // t=23 (u3) -> starts 15,20
    assert(got == Map(0L -> 1L, 5L -> 2L, 10L -> 1L, 15L -> 1L,
      20L -> 1L), s"got $got")
    // pre-epoch timestamps FLOOR into their true windows (Spark div
    // truncates toward zero; the pmod-floor bounds don't)
    val neg = Seq((1L, -1L)).toDF("user_id", "ts")
    val gotNeg = Experiment.rollingActives(neg, "user_id", "ts",
        windowNs = 10L, slideNs = 5L).collect()
      .map(r => r.getLong(0)).toSet
    assert(gotNeg == Set(-10L, -5L), s"got $gotNeg")
    intercept[IllegalArgumentException] {
      Experiment.rollingActives(evs, "user_id", "ts", 5L, 10L)
    }
  }

  test("retentionCohorts: first-seen cohorts, offset activity, ppm") {
    val evs = Seq((1L, 5L), (1L, 15L), (1L, 35L), (2L, 5L), (2L, 17L),
      (3L, 25L)).toDF("user_id", "ts")
    val r = Experiment.retentionCohorts(evs, "user_id", "ts",
        periodNs = 10L).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r((0L, 0L)) == ((2L, 2L, 1000000L)))
    assert(r((0L, 1L)) == ((2L, 2L, 1000000L)))
    assert(r((0L, 3L)) == ((1L, 2L, 500000L)))
    assert(r((2L, 0L)) == ((1L, 1L, 1000000L)))
    assert(r.size == 4)
  }

  test("retentionCohorts: pre-epoch timestamps FLOOR into their true " +
      "cohort (the rollingActives discipline, not div truncation)") {
    // ts=-1 with period 10 belongs to period -1, not 0; the user's
    // later event at ts=5 is offset 1 from that cohort
    val evs = Seq((1L, -1L), (1L, 5L)).toDF("user_id", "ts")
    val r = Experiment.retentionCohorts(evs, "user_id", "ts",
        periodNs = 10L).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map((-1L, 0L) -> 1L, (-1L, 1L) -> 1L), s"got $r")
  }

  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null) t else rootCause(t.getCause)

  test("abTest: refuses out-of-domain variants and all-null " +
      "assignments with their own messages") {
    val base = Seq((1L, "view"), (2L, "purchase"))
      .toDF("user_id", "event_type")
    // a third arm must refuse, not silently vanish from the 2x2 fold
    val threeArm = base.withColumn("variant",
      when(col("user_id") === 1L, lit(2L)).otherwise(lit(0L)))
    val e1 = intercept[Exception] {
      Experiment.abTest(threeArm, "user_id", "variant", "event_type",
        "purchase").collect()
    }
    assert(rootCause(e1).getMessage.contains("outside {0,1}"),
      rootCause(e1).getMessage)
    // an all-null assignment gets its own message (round 15 reported
    // it as "multiple variants")
    val allNull = base.withColumn("variant",
      when(col("user_id") === 1L, lit(null).cast("long"))
        .otherwise(lit(0L)))
    val e2 = intercept[Exception] {
      Experiment.abTest(allNull, "user_id", "variant", "event_type",
        "purchase").collect()
    }
    assert(rootCause(e2).getMessage.contains("no variant assignment"),
      rootCause(e2).getMessage)
    // some-null + one non-null value passes (pre-assignment events)
    val someNull = Seq((1L, "view", Some(0L)), (1L, "click", None),
        (2L, "purchase", Some(1L)))
      .toDF("user_id", "event_type", "variant")
    val ok = Experiment.abTest(someNull, "user_id", "variant",
      "event_type", "purchase").collect().head
    assert(ok.getAs[Long]("a") == 0L && ok.getAs[Long]("c") == 1L)
  }

  test("abTestK: per-arm counts and the k-by-2 chi-square on the " +
      "micro lattice; degenerate marginals -> null") {
    // arm 0: u1..u4, 2 convert; arm 1: u5..u8, 1; arm 2: u9,u10, 2
    val evs = Seq(
      (1L, 0L, "purchase"), (2L, 0L, "purchase"), (3L, 0L, "view"),
      (4L, 0L, "view"),
      (5L, 1L, "purchase"), (6L, 1L, "view"), (7L, 1L, "view"),
      (8L, 1L, "view"),
      (9L, 2L, "purchase"), (10L, 2L, "purchase"))
      .toDF("user_id", "variant", "event_type")
    val got = Experiment.abTestK(evs, "user_id", "variant",
        "event_type", "purchase").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getAs[Long]("chi2_micro")))).toMap
    // N=10, C=5; d_i = 10*nc - nu*5: arm0 0, arm1 -10, arm2 +10
    // chi2 = 0 + (100/200 + 100/200) + (100/100 + 100/100) = 3.0
    assert(got(0L) == ((4L, 2L, 500000L, 3000000L)), s"got $got")
    assert(got(1L) == ((4L, 1L, 250000L, 3000000L)))
    assert(got(2L) == ((2L, 2L, 1000000L, 3000000L)))
    // nobody converts -> both expected columns degenerate -> null
    val none = evs.withColumn("event_type", lit("view"))
    val g2 = Experiment.abTestK(none, "user_id", "variant",
      "event_type", "purchase").collect()
    assert(g2.forall(r => r.isNullAt(r.fieldIndex("chi2_micro"))))
    // the same refusals as abTest
    val mixed = evs.unionByName(Seq((1L, 1L, "view"))
      .toDF("user_id", "variant", "event_type"))
    val e = intercept[Exception] {
      Experiment.abTestK(mixed, "user_id", "variant", "event_type",
        "purchase").collect()
    }
    assert(rootCause(e).getMessage.contains("multiple variants"))
  }

  test("mannWhitneyU: doubled-midrank lattice, tie handling, " +
      "per-experiment partitioning, domain refusals") {
    val rows = Seq(
      // exp e: g0 = {1, 2}, g1 = {2, 3} -> U1 = 3.5, U0 = 0.5
      ("e", 0L, 1L), ("e", 0L, 2L), ("e", 1L, 2L), ("e", 1L, 3L),
      // exp f: g0 = {5}, g1 = {1} -> U1 = 0, U0 = 1
      ("f", 0L, 5L), ("f", 1L, 1L))
      .toDF("exp", "g", "v")
    val got = Experiment.mannWhitneyU(rows, "exp", "g", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("e") == ((2L, 2L, 13L, 7L, 1L)), s"got $got")
    assert(got("f") == ((1L, 1L, 2L, 0L, 2L)))
    // u0 + u1 = 2*n0*n1 by construction
    got.values.foreach { case (n0, n1, _, u1, u0) =>
      assert(u0 + u1 == 2 * n0 * n1) }
    val e1 = intercept[Exception] {
      Experiment.mannWhitneyU(rows.unionByName(
        Seq(("e", 2L, 1L)).toDF("exp", "g", "v")),
        "exp", "g", "v").collect()
    }
    assert(rootCause(e1).getMessage.contains("not 0/1"))
    val e2 = intercept[Exception] {
      Experiment.mannWhitneyU(Seq(("e", 0L, "zz")).toDF("exp", "g", "v"),
        "exp", "g", "v").collect()
    }
    assert(rootCause(e2).getMessage.contains("mannWhitneyU value"))
  }

  test("srmCheck: goodness-of-fit chi-square vs the design, " +
      "zero-user designed variants report 0, off-design refusal") {
    val evs = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
      (6L, 2L)).toDF("user_id", "variant")
    // equal 1:1:1 design: E = 2 each, chi2 = 0.5 + 0 + 0.5 = 1.0
    val g1 = Experiment.srmCheck(evs, "user_id", "variant",
        Map(0L -> 1L, 1L -> 1L, 2L -> 1L)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(g1(0L) == ((3L, 333333L, 1000000L)), s"got $g1")
    assert(g1(1L) == ((2L, 333333L, 1000000L)))
    assert(g1(2L) == ((1L, 333333L, 1000000L)))
    // a designed variant nobody reached reports O = 0 (and inflates
    // the statistic): 1:1:1:1 -> chi2 = 5/1.5 with two micro floors
    val g2 = Experiment.srmCheck(evs, "user_id", "variant",
        Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(g2(3L) == ((0L, 3333332L)), s"got $g2")
    // an observed variant missing from the design refuses loudly
    val e = intercept[Exception] {
      Experiment.srmCheck(evs, "user_id", "variant",
        Map(0L -> 1L, 1L -> 1L)).collect()
    }
    assert(rootCause(e).getMessage.contains("not in the experiment " +
      "design"), rootCause(e).getMessage)
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(evs, "user_id", "variant", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(evs, "user_id", "variant", Map(0L -> 0L))
    }
  }

  test("cuped: hand-computed theta and adjusted metrics, zero-variance " +
      "pre emits unadjusted, null metric refuses") {
    // (pre, post): (1,2), (2,4), (3,7) -> n=3, Sx=6, Sy=13, Sxy=31,
    // Sxx=14; num = 3*31-6*13 = 15, den = 3*14-36 = 6, theta = 2.5,
    // mean_x = 2; adj = y - 2.5*(x-2) = 4.5, 4.0, 4.5
    val rows = Seq((1L, 1L, 2L), (2L, 2L, 4L), (3L, 3L, 7L))
      .toDF("id", "pre", "post")
    val got = Experiment.cuped(rows, "id", "pre", "post").collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(1L -> ((2500000L, 4500000L)),
      2L -> ((2500000L, 4000000L)), 3L -> ((2500000L, 4500000L))),
      s"got $got")
    val flat = Experiment.cuped(
      Seq((1L, 5L, 3L), (2L, 5L, 9L)).toDF("id", "pre", "post"),
      "id", "pre", "post").collect()
      .map(r => (r.isNullAt(3), r.getLong(4))).toSet
    assert(flat == Set((true, 3000000L), (true, 9000000L)), s"got $flat")
    val e = intercept[Exception] {
      Experiment.cuped(Seq((1L, Some(1L), Option.empty[Long]))
        .toDF("id", "pre", "post"), "id", "pre", "post").collect()
    }
    assert(rootCause(e).getMessage.contains("cuped: post"),
      rootCause(e).getMessage)
  }

  test("survivalKm: textbook curve on the ppm lattice, censored rows " +
      "shrink risk sets silently, refusals") {
    // durations/events: (1,1) (2,1) (2,0) (3,1) (4,0)
    // risk sets: t=1 n=5, t=2 n=4, t=3 n=2 (t=4 censored-only)
    // S_ppm: 1e6*4/5=800000; *3//4=600000; *1//2=300000
    val rows = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 2L, 0L),
      ("g", 3L, 1L), ("g", 4L, 0L)).toDF("grp", "dur", "ev")
    val got = Experiment.survivalKm(rows, "grp", "dur", "ev").collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == Map(1L -> ((5L, 1L, 800000L)),
      2L -> ((4L, 1L, 600000L)), 3L -> ((2L, 1L, 300000L))),
      s"got $got")
    // groups fold independently
    val two = Experiment.survivalKm(rows.union(
        Seq(("h", 7L, 1L)).toDF("grp", "dur", "ev")),
      "grp", "dur", "ev").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(two(("h", 7L)) == 0L && two(("g", 1L)) == 800000L)
    val neg = intercept[Exception] {
      Experiment.survivalKm(Seq(("g", -1L, 1L)).toDF("grp", "dur", "ev"),
        "grp", "dur", "ev").collect()
    }
    assert(rootCause(neg).getMessage.contains("negative duration"))
    val bad = intercept[Exception] {
      Experiment.survivalKm(Seq(("g", 1L, 2L)).toDF("grp", "dur", "ev"),
        "grp", "dur", "ev").collect()
    }
    assert(rootCause(bad).getMessage.contains("outside {0,1}"))
    val over = intercept[Exception] {
      Experiment.survivalKm(rows, "grp", "dur", "ev", maxTimes = 2)
        .collect()
    }
    assert(rootCause(over).getMessage.contains("exceed maxTimes"))
  }

  test("diffInDiff: hand-computed 2x2 estimator, empty cell is null " +
      "not zero, refusals") {
    // means: 00->15, 01->30, 10->5, 11->50; DiD = (50-5)-(30-15) = 30
    val rows = Seq((0L, 0L, 10L), (0L, 0L, 20L), (0L, 1L, 30L),
      (1L, 0L, 5L), (1L, 1L, 40L), (1L, 1L, 60L)).toDF("g", "p", "y")
    val r = Experiment.diffInDiff(rows, "g", "p", "y").collect()(0)
    assert(r.getAs[Long]("mean00_milli") == 15000L
      && r.getAs[Long]("mean01_milli") == 30000L
      && r.getAs[Long]("mean10_milli") == 5000L
      && r.getAs[Long]("mean11_milli") == 50000L
      && r.getAs[Long]("did_micro") == 30000000L, s"got $r")
    val miss = Experiment.diffInDiff(
      rows.filter(!(col("g") === 0 && col("p") === 1)), "g", "p", "y")
      .collect()(0)
    assert(miss.isNullAt(miss.fieldIndex("did_micro"))
      && miss.isNullAt(miss.fieldIndex("mean01_milli")), s"got $miss")
    val bad = intercept[Exception] {
      Experiment.diffInDiff(Seq((2L, 0L, 1L)).toDF("g", "p", "y"),
        "g", "p", "y").collect()
    }
    assert(rootCause(bad).getMessage.contains("group 2 outside {0,1}"))
    val nul = intercept[Exception] {
      Experiment.diffInDiff(Seq((1L, 0L, Option.empty[Long]))
        .toDF("g", "p", "y"), "g", "p", "y").collect()
    }
    assert(rootCause(nul).getMessage.contains("diffInDiff: value"))
  }

  test("stickiness: short/long distinct-active ratio per aligned " +
      "window start, long-only starts drop, bounds refusal") {
    // slide 10, short 10, long 20: events u1@5, u2@15, u1@25
    val evs = Seq((1L, 5L), (2L, 15L), (1L, 25L)).toDF("u", "ts")
    val got = Experiment.stickiness(evs, "u", "ts",
        shortNs = 10L, longNs = 20L, slideNs = 10L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == Map(
      0L -> ((1L, 2L, 500000L)),
      10L -> ((1L, 2L, 500000L)),
      20L -> ((1L, 1L, 1000000L))), s"got $got")
    intercept[IllegalArgumentException] {
      Experiment.stickiness(evs, "u", "ts", 20L, 10L, 10L)
    }
  }

  test("benjaminiHochberg: textbook rejection set, non-monotone " +
      "condition still rejects ranks below k_star, family isolation, " +
      "refusals") {
    // family f (alpha 5%): p = .01, .02, .035, .90 over m=4:
    // k=1: 10000*4 <= 50000; k=2: 20000*4 <= 100000;
    // k=3: 35000*4 = 140000 <= 150000; k=4: 900000*4 > 200000 -> k*=3
    val rows = Seq(("f", 1L, 10000L), ("f", 2L, 20000L),
      ("f", 3L, 35000L), ("f", 4L, 900000L),
      // family g: nothing passes -> k* = 0, nothing rejected
      ("g", 1L, 800000L), ("g", 2L, 900000L),
      // family h: the BH step-up — k=1 fails (.03*2 > .05) but k=2
      // passes (.05*2 <= .10), so BOTH reject
      ("h", 1L, 30000L), ("h", 2L, 50000L))
      .toDF("fam", "id", "p")
    val got = Experiment.benjaminiHochberg(rows, "fam", "id", "p",
        alphaPpm = 50000L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got(("f", 1L)) == ((1L, 3L, true)))
    assert(got(("f", 3L)) == ((3L, 3L, true)))
    assert(got(("f", 4L)) == ((4L, 3L, false)))
    assert(got(("g", 1L)) == ((1L, 0L, false)))
    assert(got(("h", 1L)) == ((1L, 2L, true)), s"got ${got(("h", 1L))}")
    assert(got(("h", 2L)) == ((2L, 2L, true)))
    val bad = intercept[Exception] {
      Experiment.benjaminiHochberg(Seq(("f", 1L, 1000001L))
        .toDF("fam", "id", "p"), "fam", "id", "p", 50000L).collect()
    }
    assert(rootCause(bad).getMessage.contains("outside [0, 1000000]"))
    intercept[IllegalArgumentException] {
      Experiment.benjaminiHochberg(rows, "fam", "id", "p", 0L)
    }
  }

  test("benjaminiHochberg: a NULL family is a real family — ranked, " +
      "folded and returned, not dropped by the fold join") {
    val rows = Seq((Some("f"), 1L, 10000L),
      (Option.empty[String], 1L, 10000L),
      (Option.empty[String], 2L, 900000L))
      .toDF("fam", "id", "p")
    val got = Experiment.benjaminiHochberg(rows, "fam", "id", "p",
        alphaPpm = 50000L).collect()
      .map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0),
        r.getLong(1)) -> r.getBoolean(6)).toMap
    assert(got.size == 3, s"null family dropped: $got")
    assert(got(("<null>", 1L)) === true)
    assert(got(("<null>", 2L)) === false)
  }

  test("logRank: textbook two-arm risk-set walk — integer E1 terms, " +
      "fixed-op-order variance, symmetric arms give chi2 = 0, " +
      "degenerate experiments null, refusals") {
    // exp e, mirror-symmetric arms: grp0 = [1 event, 2 censored],
    // grp1 = [1 censored, 2 event].
    //   t=1: n0=2 n1=2 n=4 d=1 (d1=0) -> e1k = 1e6*2/4 = 500000,
    //        vk = (1*2)*2*3/(16*3)*1e6 = 250000
    //   t=2: n0=1 n1=1 n=2 d=1 (d1=1) -> e1k = 500000, vk = 250000
    // O1 = 1, E1 = 1e6 exactly -> chi2 = 0.
    val subj = Seq(
      ("e", 0L, 1L, 1L), ("e", 0L, 2L, 0L),
      ("e", 1L, 1L, 0L), ("e", 1L, 2L, 1L),
      // exp f: one-armed -> every V term 0 -> chi2 undefined (null)
      ("f", 0L, 1L, 1L), ("f", 0L, 2L, 1L),
      // exp n: NO events anywhere -> arms still reported, O = E = 0,
      // chi2 null (an inner fold join would erase the experiment)
      ("n", 0L, 3L, 0L), ("n", 1L, 4L, 0L))
      .toDF("exp", "g", "dur", "ev")
    val got = Experiment.logRank(subj, "exp", "g", "dur", "ev")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    assert(got(("e", 0L)) == ((2L, 1L, 1000000L, 500000L, 0L)),
      s"got ${got(("e", 0L))}")
    assert(got(("e", 1L)) == ((2L, 1L, 1000000L, 500000L, 0L)))
    assert(got(("f", 0L)) == ((2L, 2L, 0L, 0L, -1L)),
      s"got ${got(("f", 0L))}")
    assert(!got.contains(("f", 1L)))
    assert(got(("n", 0L)) == ((1L, 0L, 0L, 0L, -1L)),
      s"eventless experiment erased: $got")
    assert(got(("n", 1L)) == ((1L, 0L, 0L, 0L, -1L)))
    // an ASYMMETRIC fixture: grp1 events pile up early while grp0
    // survives — chi2 computed by the documented recurrence in plain
    // scala must match bit-for-bit
    val asym = Seq(
      ("x", 0L, 5L, 1L), ("x", 0L, 6L, 1L), ("x", 0L, 7L, 0L),
      ("x", 1L, 1L, 1L), ("x", 1L, 2L, 1L), ("x", 1L, 3L, 1L))
      .toDF("exp", "g", "dur", "ev")
    // pooled event times 1,2,3,5,6 with (n0,n1,d0,d1):
    val walk = Seq((3L, 3L, 0L, 1L), (3L, 2L, 0L, 1L), (3L, 1L, 0L, 1L),
      (3L, 0L, 1L, 0L), (2L, 0L, 1L, 0L))
    val e1 = walk.map { case (n0, n1, d0, d1) =>
      1000000L * ((d0 + d1) * n1) / (n0 + n1) }.sum
    val v = walk.map { case (n0, n1, d0, d1) =>
      val n = n0 + n1; val d = d0 + d1
      if (n <= 1) 0L
      else math.floor((d * n1).toDouble * n0.toDouble * (n - d).toDouble
        / (n.toDouble * n.toDouble * (n - 1).toDouble) * 1000000).toLong
    }.sum
    val o1 = 3L
    val chi = math.floor((1000000L * o1 - e1).toDouble
      * (1000000L * o1 - e1).toDouble / v.toDouble).toLong
    val gx = Experiment.logRank(asym, "exp", "g", "dur", "ev")
      .filter(col("grp") === 1).collect()(0)
    assert(gx.getLong(4) == e1 && gx.getLong(5) == v &&
      gx.getLong(6) == chi,
      s"got (${gx.getLong(4)}, ${gx.getLong(5)}, ${gx.getLong(6)}), " +
        s"want ($e1, $v, $chi)")
    // refusals: a third arm, a negative duration, a bad event flag
    val badArm = intercept[Exception] {
      Experiment.logRank(Seq(("e", 2L, 1L, 1L))
        .toDF("exp", "g", "dur", "ev"), "exp", "g", "dur", "ev")
        .collect()
    }
    assert(rootCause(badArm).getMessage.contains("not 0/1"))
    val badDur = intercept[Exception] {
      Experiment.logRank(Seq(("e", 0L, -1L, 1L))
        .toDF("exp", "g", "dur", "ev"), "exp", "g", "dur", "ev")
        .collect()
    }
    assert(rootCause(badDur).getMessage.contains("negative duration"))
    val badEv = intercept[Exception] {
      Experiment.logRank(Seq(("e", 0L, 1L, 2L))
        .toDF("exp", "g", "dur", "ev"), "exp", "g", "dur", "ev")
        .collect()
    }
    assert(rootCause(badEv).getMessage.contains("outside {0,1}"))
  }

  test("bootstrapCi: every seeded Poisson weight, replicate mean and " +
      "rank quantile replays in plain scala; refusals") {
    val m = 2147483647L
    val seed = 7L
    val b = 16
    def lehmer(x: Long): Long = ((x % m) * 48271L) % m
    val ts = Experiment.poissonThresholds
    def w(id: Long, rep: Long): Long = {
      val u = lehmer(lehmer(lehmer(id + seed) + rep))
      ts.count(t => u >= t).toLong
    }
    val units = (1L to 20L).map(i => ("k", i, i * 10L))
    val means = (0L until b.toLong).flatMap { rep =>
      val swv = units.map { case (_, id, v) => w(id, rep) * v }.sum
      val sw = units.map { case (_, id, _) => w(id, rep) }.sum
      if (sw == 0) None
      else Some((rep, math.floor(swv.toDouble * 1000000
        / sw.toDouble).toLong))
    }.sortBy(x => (x._2, x._1)).map(_._2)
    val beff = means.length
    def target(pm: Int) = math.max(1, (pm * beff + 999) / 1000)
    val wantLo = means(target(250) - 1)
    val wantHi = means(target(750) - 1)
    val wantMean = math.floor(
      units.map(_._3).sum.toDouble * 1000000 / 20.0).toLong
    val r = Experiment.bootstrapCi(units.toDF("k", "id", "v"),
      "k", "id", "v", b = b, seed = seed, loPm = 250, hiPm = 750)
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((20L, beff.toLong, wantMean, wantLo, wantHi)),
      s"got $r, want ($beff, $wantMean, $wantLo, $wantHi)")
    assert(wantLo <= wantHi)
    val badId = intercept[Exception] {
      Experiment.bootstrapCi(Seq(("k", Option.empty[Long], 1L))
        .toDF("k", "id", "v"), "k", "id", "v").collect()
    }
    assert(rootCause(badId).getMessage.contains("unit id"))
    intercept[IllegalArgumentException] {
      Experiment.bootstrapCi(units.toDF("k", "id", "v"), "k", "id",
        "v", b = 4)
    }
    intercept[IllegalArgumentException] {
      Experiment.bootstrapCi(units.toDF("k", "id", "v"), "k", "id",
        "v", loPm = 500, hiPm = 500)
    }
  }

  test("cliffsDelta: full dominance +/-1e6, tie half-credit, empty " +
      "arm null") {
    val dom = Seq(("e", 0L, 1L), ("e", 0L, 2L), ("e", 1L, 3L),
      ("e", 1L, 4L)).toDF("e", "g", "v")
    assert(Experiment.cliffsDelta(dom, "e", "g", "v").collect()(0)
      .getAs[Long]("delta_ppm") == 1000000L)
    // g0=(1,2), g1=(2,3): 3 wins, 1 tie -> (2*U1 - n0n1)/n0n1 = 3/4
    val mix = Seq(("e", 0L, 1L), ("e", 0L, 2L), ("e", 1L, 2L),
      ("e", 1L, 3L)).toDF("e", "g", "v")
    assert(Experiment.cliffsDelta(mix, "e", "g", "v").collect()(0)
      .getAs[Long]("delta_ppm") == 750000L)
    val lone = Seq(("e", 1L, 5L)).toDF("e", "g", "v")
    assert(Experiment.cliffsDelta(lone, "e", "g", "v").collect()(0)
      .isNullAt(3))
  }

  test("cohensD: hand-computed pooled-SD fixture, degenerate " +
      "variance and small arms null") {
    // g0=(2,4): mean 3, SS/n = 2; g1=(5,7): mean 6, SS/n = 2
    // pooled = 4/2 = 2 -> d = 3/sqrt(2) = 2.12132 -> 2121 milli
    val df = Seq(("e", 0L, 2L), ("e", 0L, 4L), ("e", 1L, 5L),
      ("e", 1L, 7L)).toDF("e", "g", "v")
    assert(Experiment.cohensD(df, "e", "g", "v").collect()(0)
      .getAs[Long]("d_milli") == 2121L)
    val flat = Seq(("e", 0L, 3L), ("e", 0L, 3L), ("e", 1L, 5L),
      ("e", 1L, 5L)).toDF("e", "g", "v")
    assert(Experiment.cohensD(flat, "e", "g", "v").collect()(0)
      .isNullAt(3), "zero pooled variance -> null, not a div-by-zero")
    val tiny = Seq(("e", 0L, 3L), ("e", 1L, 5L)).toDF("e", "g", "v")
    assert(Experiment.cohensD(tiny, "e", "g", "v").collect()(0)
      .isNullAt(3), "arms of 1 -> null")
  }

  test("stratifiedAte: hand fixture — stratified 17.5 vs simple " +
      "11.666666, one-arm stratum excluded visibly") {
    // stratum A: control (10,20), treat (40) -> diff +25
    // stratum B: control (5), treat (11,19) -> diff +10
    // stratum C: control only -> excluded (2 rows)
    val df = Seq(
      ("e", "A", 0L, 10L), ("e", "A", 0L, 20L), ("e", "A", 1L, 40L),
      ("e", "B", 0L, 5L), ("e", "B", 1L, 11L), ("e", "B", 1L, 19L),
      ("e", "C", 0L, 1000L), ("e", "C", 0L, 1000L))
      .toDF("e", "s", "g", "v")
    val r = Experiment.stratifiedAte(df, "e", "s", "g", "v")
      .collect()(0)
    assert(r.getAs[Long]("n_strata") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("n_excluded_strata") == 1L &&
      r.getAs[Long]("n_excluded_rows") == 2L)
    // ate = (3*25e6 + 3*10e6) div 6 = 17_500_000 micro
    assert(r.getAs[Long]("ate_micro") == 17500000L)
    // unadjusted over the included rows: 1e6*(70*3 - 35*3) div 9
    assert(r.getAs[Long]("simple_diff_micro") == 11666666L)
    // negative effect, exactly divisible: control (10,10), treat (4)
    val neg = Seq(("n", "A", 0L, 10L), ("n", "A", 0L, 10L),
      ("n", "A", 1L, 4L)).toDF("e", "s", "g", "v")
    assert(Experiment.stratifiedAte(neg, "e", "s", "g", "v")
      .collect()(0).getAs[Long]("ate_micro") == -6000000L)
    // no stratum survives -> null ATE
    val none = Seq(("z", "A", 0L, 1L)).toDF("e", "s", "g", "v")
    val z = Experiment.stratifiedAte(none, "e", "s", "g", "v")
      .collect()(0)
    assert(z.isNullAt(5) && z.isNullAt(6))
    val bad = intercept[Exception] {
      Experiment.stratifiedAte(Seq(("e", "A", 2L, 1L))
        .toDF("e", "s", "g", "v"), "e", "s", "g", "v").collect()
    }
    assert(rootCause(bad).getMessage.contains("not 0/1"))
  }

  test("holmBonferroni: textbook step-down — running max keeps " +
      "rejections monotone, adj clipped at 1e6") {
    val df = Seq(("f", 1L, 10000L), ("f", 2L, 20000L),
      ("f", 3L, 30000L), ("f", 4L, 500000L))
      .toDF("fam", "id", "p")
    val r = Experiment.holmBonferroni(df, "fam", "id", "p", 50000L)
      .orderBy("k").collect()
    assert(r.map(_.getAs[Long]("adj_ppm")).toSeq ==
      Seq(40000L, 60000L, 60000L, 500000L))
    assert(r.map(_.getAs[Boolean]("reject")).toSeq ==
      Seq(true, false, false, false),
      "step-down stops at the first non-rejection")
    val clip = Seq(("g", 1L, 900000L), ("g", 2L, 950000L))
      .toDF("fam", "id", "p")
    assert(Experiment.holmBonferroni(clip, "fam", "id", "p", 10000L)
      .orderBy("k").collect().map(_.getAs[Long]("adj_ppm")).toSeq ==
      Seq(1000000L, 1000000L))
    val bad = intercept[Exception] {
      Experiment.holmBonferroni(Seq(("f", 1L, 1000001L))
        .toDF("fam", "id", "p"), "fam", "id", "p", 50000L).collect()
    }
    assert(rootCause(bad).getMessage.contains("outside [0, 1000000]"))
  }

  test("sprtBinary: ln4-lattice walk crosses the ln19 boundary at " +
      "n=3 both ways; a cancelled walk continues; refusals") {
    // p0=200, p1=800: l1 = ln4, l0 = -ln4; bounds = +/-floor(1e6*ln19)
    def run(convs: Seq[Long]) = Experiment.sprtBinary(
      convs.zipWithIndex.map { case (c, t) => ("e", t.toLong, t.toLong, c) }
        .toDF("e", "t", "i", "c"), "e", "t", "i", "c",
      200L, 800L, 50L, 50L).collect()(0)
    val up = run(Seq(1L, 1L, 1L))
    assert(up.getAs[Long]("upper_micro") == 2944438L &&
      up.getAs[Long]("lower_micro") == -2944439L)
    assert(up.getAs[String]("decision") == "reject_h0" &&
      up.getAs[Long]("n_at_decision") == 3L &&
      up.getAs[Long]("llr_at_decision") == 4158883L)
    val dn = run(Seq(0L, 0L, 0L))
    assert(dn.getAs[String]("decision") == "accept_h0" &&
      dn.getAs[Long]("n_at_decision") == 3L &&
      dn.getAs[Long]("llr_at_decision") == -4158884L,
      s"got $dn")
    val ct = run(Seq(1L, 0L))
    assert(ct.getAs[String]("decision") == "continue" &&
      ct.isNullAt(7) && ct.getAs[Long]("llr_final_micro") == 0L)
    val bad = intercept[Exception] { run(Seq(2L)) }
    assert(rootCause(bad).getMessage.contains("outside {0,1}"))
    val dup = intercept[Exception] {
      Experiment.sprtBinary(Seq(("e", 1L, 1L, 1L), ("e", 1L, 1L, 0L))
        .toDF("e", "t", "i", "c"), "e", "t", "i", "c",
        200L, 800L, 50L, 50L).collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate position"))
    intercept[IllegalArgumentException] {
      Experiment.sprtBinary(Seq(("e", 1L, 1L, 1L))
        .toDF("e", "t", "i", "c"), "e", "t", "i", "c",
        500L, 500L, 50L, 50L)
    }
  }

  test("mantelHaenszel: two-stratum hand fixture (OR_MH 2428571), " +
      "single-subject stratum excluded, degenerate OR null") {
    def rows(st: Long, g: Long, c: Long, k: Int) =
      Seq.fill(k)(("e", st, g, c))
    val df = (rows(1L, 1L, 1L, 4) ++ rows(1L, 1L, 0L, 1)
      ++ rows(1L, 0L, 1L, 2) ++ rows(1L, 0L, 0L, 3)
      ++ rows(2L, 1L, 1L, 2) ++ rows(2L, 1L, 0L, 2)
      ++ rows(2L, 0L, 1L, 2) ++ rows(2L, 0L, 0L, 2)
      ++ rows(3L, 1L, 1L, 1)) // singleton stratum
      .toDF("e", "s", "g", "c")
    val r = Experiment.mantelHaenszel(df, "e", "s", "g", "c")
      .collect()(0)
    assert(r.getAs[Long]("n_strata") == 2L && r.getAs[Long]("n") == 18L)
    assert(r.getAs[Long]("n_excluded_strata") == 1L &&
      r.getAs[Long]("n_excluded_rows") == 1L)
    assert(r.getAs[Long]("sum_a") == 6L &&
      r.getAs[Long]("e_micro") == 5000000L &&
      r.getAs[Long]("v_micro") == 666666L + 571428L)
    // OR = 1e6*(1200000+500000) div (200000+500000) = 2428571
    assert(r.getAs[Long]("or_mh_ppm") == 2428571L)
    // all-concordant stratum: b*c = 0 -> null OR
    val deg = (rows(1L, 1L, 1L, 2) ++ rows(1L, 0L, 0L, 2))
      .toDF("e", "s", "g", "c")
    assert(Experiment.mantelHaenszel(deg, "e", "s", "g", "c")
      .collect()(0).isNullAt(8))
    val bad = intercept[Exception] {
      Experiment.mantelHaenszel(Seq(("e", 1L, 2L, 1L))
        .toDF("e", "s", "g", "c"), "e", "s", "g", "c").collect()
    }
    assert(rootCause(bad).getMessage.contains("outside {0,1}"))
  }

  test("nelsonAalen: hand risk-set walk 200000/450000/950000; " +
      "refusals match the KM contract") {
    val df = Seq((1L, 1L), (2L, 1L), (2L, 0L), (4L, 1L), (5L, 0L))
      .map { case (t, e) => ("g", t, e) }.toDF("g", "t", "e")
    val got = Experiment.nelsonAalen(df, "g", "t", "e")
      .orderBy("t").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d"), r.getAs[Long]("h_micro")))
    assert(got.toSeq == Seq((1L, 5L, 1L, 200000L),
      (2L, 4L, 1L, 450000L), (4L, 2L, 1L, 950000L)), s"got ${got.toSeq}")
    val neg = intercept[Exception] {
      Experiment.nelsonAalen(Seq(("g", -1L, 1L)).toDF("g", "t", "e"),
        "g", "t", "e").collect()
    }
    assert(rootCause(neg).getMessage.contains("negative duration"))
    val bad = intercept[Exception] {
      Experiment.nelsonAalen(Seq(("g", 1L, 2L)).toDF("g", "t", "e"),
        "g", "t", "e").collect()
    }
    assert(rootCause(bad).getMessage.contains("outside {0,1}"))
  }

  test("gehanBreslow: interleaved-arm hand walk (o 6, e 4, v 7e6, " +
      "chi2 571428); weighted O/E are exact integers; refusal") {
    val df = Seq(("e", 1L, 1L, 1L), ("e", 1L, 3L, 1L),
      ("e", 0L, 2L, 1L), ("e", 0L, 4L, 1L))
      .toDF("e", "g", "t", "ev")
    val r = Experiment.gehanBreslow(df, "e", "g", "t", "ev")
      .collect()(0)
    assert(r.getAs[Long]("n_event_times") == 4L &&
      r.getAs[Long]("o1w") == 6L && r.getAs[Long]("e1w") == 4L &&
      r.getAs[Long]("vw_micro") == 7000000L, s"got $r")
    // chi2 = floor(2*2*1e12 / 7e6) = 571428 micro
    assert(r.getAs[Long]("chi2_micro") == 571428L)
    val bad = intercept[Exception] {
      Experiment.gehanBreslow(Seq(("e", 2L, 1L, 1L))
        .toDF("e", "g", "t", "ev"), "e", "g", "t", "ev").collect()
    }
    assert(rootCause(bad).getMessage.contains("is not 0/1"))
  }

  test("cohortLtv: two cohorts, dilution by the ORIGINAL size, " +
      "absent quiet ages; value refusal") {
    val evs = Seq((1L, 5L, 10L), (1L, 15L, 20L), (1L, 35L, 30L),
      (2L, 15L, 5L), (3L, 5L, 1L)).toDF("u", "ts", "v")
    val got = Experiment.cohortLtv(evs, "u", "ts", "v",
      periodNs = 10L).collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("age")) ->
        ((r.getAs[Long]("n_cohort"), r.getAs[Long]("n_active"),
          r.getAs[Long]("cum_revenue"), r.getAs[Long]("ltv_micro"))))
      .toMap
    assert(got((0L, 0L)) == ((2L, 2L, 11L, 5500000L)), s"got $got")
    assert(got((0L, 1L)) == ((2L, 1L, 31L, 15500000L)))
    assert(got((0L, 3L)) == ((2L, 1L, 61L, 30500000L)),
      "cum at age 3 carries over the quiet age 2")
    assert(got((1L, 0L)) == ((1L, 1L, 5L, 5000000L)))
    assert(!got.contains((0L, 2L)), "quiet ages have no row")
    val nul = intercept[Exception] {
      Experiment.cohortLtv(Seq((1L, 5L, Option.empty[Long]))
        .toDF("u", "ts", "v"), "u", "ts", "v", 10L).collect()
    }
    assert(rootCause(nul).getMessage.contains("cohortLtv value"))
  }

  test("kruskalWallis: textbook 3-arm 4571428 micro; k=2 tie case " +
      "corrects to exactly 3.0; all-tied null; refusal") {
    val df3 = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).map { case (g, v) => ("e", g, v) }
      .toDF("e", "g", "v")
    val r = Experiment.kruskalWallis(df3, "e", "g", "v").collect()(0)
    assert(r.getAs[Long]("n") == 6L &&
      r.getAs[Long]("k_groups") == 3L &&
      r.getAs[Long]("h_micro") == 4571428L &&
      r.getAs[Long]("h_corr_micro") == 4571428L, s"got $r")
    // (1,1) vs (2,2): uncorrected 2.4, tie-corrected exactly 3.0
    val tied = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L))
      .map { case (g, v) => ("e", g, v) }.toDF("e", "g", "v")
    val t = Experiment.kruskalWallis(tied, "e", "g", "v").collect()(0)
    assert(t.getAs[Long]("h_micro") == 2400000L &&
      t.getAs[Long]("h_corr_micro") == 3000000L, s"got $t")
    val const = Seq(("e", "a", 5L), ("e", "b", 5L))
      .toDF("e", "g", "v")
    assert(Experiment.kruskalWallis(const, "e", "g", "v")
      .collect()(0).isNullAt(4), "every value tied: undefined")
    val nul = intercept[Exception] {
      Experiment.kruskalWallis(Seq(("e", "a", Option.empty[Long]))
        .toDF("e", "g", "v"), "e", "g", "v").collect()
    }
    assert(rootCause(nul).getMessage.contains("kruskalWallis value"))
  }

  test("friedman: perfect agreement hits the n=3/k=3 maximum 6.0; " +
      "within-block tie corrects exactly; incomplete/duplicate " +
      "refusals; all-tied null") {
    // 3 blocks all ranking t1 < t2 < t3
    val df = (for (b <- 1 to 3; (t, v) <- Seq(("t1", 1L), ("t2", 5L),
      ("t3", 9L))) yield ("k", s"b$b", t, v + b))
      .toDF("k", "b", "t", "v")
    val r = Experiment.friedman(df, "k", "b", "t", "v").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 3L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("chi2_micro") == 6000000L &&
      r.getAs[Long]("chi2_corr_micro") == 6000000L, s"got $r")
    // one block ties two treatments: R2 = (3+2+2, 3+6+6, 6+4+4)
    val tied = Seq(
      ("b1", "t1", 1L), ("b1", "t2", 5L), ("b1", "t3", 9L),
      ("b2", "t1", 2L), ("b2", "t2", 7L), ("b2", "t3", 4L),
      ("b3", "t1", 3L), ("b3", "t2", 3L), ("b3", "t3", 8L))
      .map { case (b, t, v) => ("k", b, t, v) }.toDF("k", "b", "t", "v")
    val t2 = Experiment.friedman(tied, "k", "b", "t", "v").collect()(0)
    // R2: t1 = 2+2+3 = 7, t2 = 4+6+3 = 13, t3 = 6+4+6 = 16
    // terms: (3e6*49+3e6*169+3e6*256) div 36 each; tc = 6
    val terms = Seq(49L, 169L, 256L).map(x => 3000000L * x / 36L).sum
    val chi = terms - 3L * 3L * 4L * 1000000L
    assert(t2.getAs[Long]("chi2_micro") == chi, s"got $t2 want $chi")
    assert(t2.getAs[Long]("chi2_corr_micro") ==
      chi * 72L / (72L - 6L), s"got $t2")
    val inc = intercept[Exception] {
      Experiment.friedman(tied.filter(
        !(col("b") === "b3" && col("t") === "t3")),
        "k", "b", "t", "v").collect()
    }
    assert(rootCause(inc).getMessage.contains("must be complete"))
    val dup = intercept[Exception] {
      Experiment.friedman(tied.union(Seq(("k", "b1", "t1", 2L))
        .toDF("k", "b", "t", "v")), "k", "b", "t", "v").collect()
    }
    assert(rootCause(dup).getMessage.contains("more than once"))
    val flat = Seq(("k", "b1", "t1", 5L), ("k", "b1", "t2", 5L),
      ("k", "b2", "t1", 7L), ("k", "b2", "t2", 7L))
      .toDF("k", "b", "t", "v")
    assert(Experiment.friedman(flat, "k", "b", "t", "v")
      .collect()(0).isNullAt(4), "internally constant blocks: null")
  }

  test("wilcoxonSignedRank: textbook all-positive z 2022; tie+zero " +
      "hand walk 1299 with the zero visible; all-zero null; " +
      "duplicate refusal") {
    def mk(ds: Seq[Long]) = ds.zipWithIndex.map { case (d, i) =>
      ("e", i.toLong, 10L, 10L + d) }.toDF("e", "i", "x", "y")
    // d = 1..5: W2+ = 30, diff2 = 15, var48 = 660
    val up = Experiment.wilcoxonSignedRank(mk(Seq(1L, 2L, 3L, 4L, 5L)),
      "e", "i", "x", "y").collect()(0)
    assert(up.getAs[Long]("w2_plus") == 30L &&
      up.getAs[Long]("var_num48") == 660L &&
      up.getAs[Long]("z_milli") == 2022L, s"got $up")
    // d = (0, 1, -1, 2, 2): n=4, W2+ = 3+14 = 17, diff2 = 7,
    // tcorr = 12, var48 = 360-12 = 348, z = 3500/sqrt(7.25) -> 1299
    val tied = Experiment.wilcoxonSignedRank(
      mk(Seq(0L, 1L, -1L, 2L, 2L)), "e", "i", "x", "y").collect()(0)
    assert(tied.getAs[Long]("n_zero") == 1L &&
      tied.getAs[Long]("n") == 4L &&
      tied.getAs[Long]("w2_plus") == 17L &&
      tied.getAs[Long]("var_num48") == 348L &&
      tied.getAs[Long]("z_milli") == 1299L, s"got $tied")
    val zeros = Experiment.wilcoxonSignedRank(mk(Seq(0L, 0L)),
      "e", "i", "x", "y").collect()(0)
    assert(zeros.getAs[Long]("n_zero") == 2L && zeros.isNullAt(6),
      "no nonzero differences: null z")
    val dup = intercept[Exception] {
      Experiment.wilcoxonSignedRank(
        Seq(("e", 1L, 1L, 2L), ("e", 1L, 3L, 4L))
          .toDF("e", "i", "x", "y"), "e", "i", "x", "y").collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate pair id"))
  }

  test("logRankK: hand-walked 3-arm risk sets; two-arm O/E pins to " +
      "logRank; stratification moves E; refusals") {
    import org.apache.spark.sql.functions.lit
    // arms A/B/C, constant stratum; pooled event times 1, 2, 3
    //   t=1: nA=nB=nC=2 n=6 d=1 -> E_g = 333333 each
    //   t=2: nA=1 nB=2 nC=2 n=5 d=1 -> 200000 / 400000 / 400000
    //   t=3: nA=1 nB=1 nC=2 n=4 d=1 -> 250000 / 250000 / 500000
    val subj = Seq(
      ("e", "A", 1L, 1L), ("e", "A", 3L, 0L),
      ("e", "B", 2L, 1L), ("e", "B", 3L, 1L),
      ("e", "C", 3L, 0L), ("e", "C", 3L, 0L))
      .toDF("exp", "g", "dur", "ev").withColumn("st", lit(0L))
    val got = Experiment.logRankK(subj, "exp", "st", "g", "dur", "ev")
      .collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5),
        r.getLong(6)))).toMap
    def term(o: Long, e: Long): Long =
      math.floor((1000000L * o - e).toDouble
        * (1000000L * o - e).toDouble / e.toDouble).toLong
    val chi = term(1L, 783333L) + term(2L, 983333L) +
      term(0L, 1233333L)
    assert(got("A") == ((2L, 1L, 783333L, chi, 2L)), s"got $got")
    assert(got("B") == ((2L, 2L, 983333L, chi, 2L)))
    assert(got("C") == ((2L, 0L, 1233333L, chi, 2L)))
    // two arms named 0/1: per-arm O and E match logRank bit-for-bit
    val two = Seq(
      ("e", 0L, 1L, 1L), ("e", 0L, 4L, 0L), ("e", 0L, 5L, 1L),
      ("e", 1L, 2L, 1L), ("e", 1L, 3L, 1L), ("e", 1L, 5L, 0L))
      .toDF("exp", "g", "dur", "ev")
    val ref = Experiment.logRank(two, "exp", "g", "dur", "ev")
      .collect().map(r => r.getLong(1).toString ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val kk = Experiment.logRankK(two.withColumn("st", lit(0L)),
      "exp", "st", "g", "dur", "ev").collect()
      .map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(kk("1")._1 == ref("1")._1 && kk("1")._2 == ref("1")._2 &&
      kk("1")._3 == ref("1")._3,
      s"arm-1 O/E must pin to logRank: $kk vs $ref")
    assert(kk("0")._1 == ref("0")._1 && kk("0")._2 == ref("0")._2)
    // stratification: stratum-local risk sets change E (the
    // confounder can no longer masquerade as a survival difference)
    val strat = Seq(
      ("e", "s1", "A", 1L, 1L), ("e", "s1", "B", 2L, 1L),
      ("e", "s2", "A", 10L, 1L), ("e", "s2", "B", 20L, 1L))
      .toDF("exp", "st", "g", "dur", "ev")
    val sGot = Experiment.logRankK(strat, "exp", "st", "g", "dur",
      "ev").collect().map(r => r.getString(1) ->
        ((r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    // s1: t=1 E_A=E_B=500000; t=2 E_B=1e6. s2 mirrors at 10/20.
    assert(sGot("A") == ((2L, 1000000L, 1333333L)), s"got $sGot")
    assert(sGot("B") == ((2L, 3000000L, 1333333L)))
    val pooled = Experiment.logRankK(
      strat.withColumn("st2", lit(0L)), "exp", "st2", "g", "dur",
      "ev").collect().map(r => r.getString(1) -> r.getLong(4)).toMap
    assert(pooled("A") == 1333333L && pooled("B") == 2666666L,
      s"pooled E must differ from stratified: $pooled")
    // single-arm experiment: chi2 null, df 0
    val one = Experiment.logRankK(
      Seq(("f", 0L, "A", 1L, 1L)).toDF("exp", "st", "g", "dur", "ev"),
      "exp", "st", "g", "dur", "ev").collect()(0)
    assert(one.isNullAt(5) && one.getLong(6) == 0L)
    val nul = intercept[Exception] {
      Experiment.logRankK(
        Seq(("e", 0L, Option.empty[String], 1L, 1L))
          .toDF("exp", "st", "g", "dur", "ev"),
        "exp", "st", "g", "dur", "ev").collect()
    }
    assert(rootCause(nul).getMessage.contains("null arm"))
    val many = intercept[Exception] {
      Experiment.logRankK(
        (1L to 70L).map(i => ("e", 0L, s"arm$i", i, 1L))
          .toDF("exp", "st", "g", "dur", "ev"),
        "exp", "st", "g", "dur", "ev", maxArms = 64).collect()
    }
    assert(rootCause(many).getMessage.contains("maxArms=64"))
  }

  test("eProcessBinary: KT factors replayed in plain scala, first " +
      "crossing decides, no-alternative continue, refusals") {
    // p0 = 0.2, alpha = 0.05: three straight conversions cross ln20
    val df = Seq(("e", 1L, 1L, 1L), ("e", 2L, 2L, 1L),
      ("e", 3L, 3L, 1L), ("e", 4L, 4L, 1L),
      // experiment c: conversions at the null rate -> no crossing
      ("c", 1L, 1L, 0L), ("c", 2L, 2L, 0L), ("c", 3L, 3L, 1L),
      ("c", 4L, 4L, 0L), ("c", 5L, 5L, 0L))
      .toDF("e", "t", "i", "c")
    val got = Experiment.eProcessBinary(df, "e", "t", "i", "c",
      p0Milli = 200L, alphaMilli = 50L).collect()
      .map(r => r.getString(0) -> r).toMap
    // replay the documented chain sequentially (StrictMath.log ==
    // Catalyst's Log)
    def walk(cs: Seq[Long]): Seq[Long] = {
      var s = 0L; var n = 0L
      cs.map { c =>
        val a = if (c == 1L) 1000L * (2L * s + 1L)
          else 1000L * (2L * (n - s) + 1L)
        val b = if (c == 1L) 2L * (n + 1L) * 200L
          else 2L * (n + 1L) * 800L
        s += c; n += 1L
        math.floor(1.0e9 * StrictMath.log(a.toDouble / b.toDouble))
          .toLong
      }.scanLeft(0L)(_ + _).drop(1)
    }
    val threshold = math.floor(1.0e9 * math.log(20.0)).toLong
    val eWalk = walk(Seq(1L, 1L, 1L, 1L))
    val e = got("e")
    assert(e.getAs[Long]("threshold_nano") == threshold)
    assert(e.getAs[String]("decision") == "reject_h0")
    assert(e.getAs[Long]("n_at_decision") ==
      (eWalk.indexWhere(_ >= threshold) + 1L),
      s"crossing row: ${eWalk.toList} vs $threshold")
    assert(e.getAs[Long]("e_at_decision") ==
      eWalk(eWalk.indexWhere(_ >= threshold)))
    assert(e.getAs[Long]("e_final_nano") == eWalk.last)
    val c = got("c")
    assert(c.getAs[String]("decision") == "continue" &&
      c.isNullAt(7) && c.getAs[Long]("e_final_nano") == walk(
        Seq(0L, 0L, 1L, 0L, 0L)).last, s"got $c")
    val dup = intercept[Exception] {
      Experiment.eProcessBinary(
        Seq(("e", 1L, 1L, 1L), ("e", 1L, 1L, 0L))
          .toDF("e", "t", "i", "c"), "e", "t", "i", "c", 200L, 50L)
        .collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate position"))
    val bad = intercept[Exception] {
      Experiment.eProcessBinary(Seq(("e", 1L, 1L, 2L))
        .toDF("e", "t", "i", "c"), "e", "t", "i", "c", 200L, 50L)
        .collect()
    }
    assert(rootCause(bad).getMessage.contains("outside {0,1}"))
    intercept[IllegalArgumentException] {
      Experiment.eProcessBinary(df, "e", "t", "i", "c", 0L, 50L)
    }
  }

  /** The documented eProcessMean bet chain, replayed sequentially in
    * plain Scala — the independent derivation the operator's window
    * factoring must reproduce bit-for-bit.
    */
  private def meanWalk(vs: Seq[Long], mMilli: Long): Seq[Long] = {
    val lamMax = 500000L / mMilli
    var s = 0L; var q = 0L; var n = 0L
    vs.map { v =>
      val muh = (mMilli + s) / (n + 1L)
      val m2 = (250000L + q) / (n + 1L)
      val vh = math.max(2500L, m2 - muh * muh)
      val lam = math.min(lamMax,
        math.max(0L, (1000000L * (muh - mMilli)) / vh))
      val fn = 1000000L + lam * (v - mMilli)
      s += v; q += v * v; n += 1L
      math.floor(1.0e9 * StrictMath.log(fn.toDouble / 1000000.0))
        .toLong
    }.scanLeft(0L)(_ + _).drop(1)
  }

  test("eProcessMean: betting-martingale walk replayed in plain " +
      "scala on randomized milli-lattice fixtures — final sum, " +
      "crossing row and decision all bit-equal") {
    val rnd = new scala.util.Random(1901L)
    (0 until 6).foreach { k =>
      val n = 20 + rnd.nextInt(60)
      // mixed regimes: null-ish, shifted-up, bimodal
      val vs = (0 until n).map { _ =>
        k % 3 match {
          case 0 => rnd.nextInt(1001).toLong
          case 1 => math.min(1000L, 400L + rnd.nextInt(620).toLong)
          case 2 => if (rnd.nextBoolean()) 0L else 1000L
        }
      }
      val m = Seq(300L, 500L, 650L)(k % 3)
      val df = vs.zipWithIndex.map { case (v, i) =>
        ("e", i.toLong, i.toLong, v) }.toDF("e", "t", "i", "v")
      val r = Experiment.eProcessMean(df, "e", "t", "i", "v",
        mMilli = m, alphaMilli = 50L).collect()(0)
      val walk = meanWalk(vs, m)
      val threshold = math.floor(1.0e9 * math.log(20.0)).toLong
      assert(r.getAs[Long]("e_final_nano") == walk.last,
        s"case $k m=$m vs=$vs:\n got ${r.getAs[Long]("e_final_nano")} " +
          s"want ${walk.last}")
      assert(r.getAs[Long]("sum_milli") == vs.sum)
      val cross = walk.indexWhere(_ >= threshold)
      if (cross >= 0) {
        assert(r.getAs[String]("decision") == "reject_h0", s"case $k")
        assert(r.getAs[Long]("n_at_decision") == cross + 1L,
          s"case $k: walk=$walk")
        assert(r.getAs[Long]("e_at_decision") == walk(cross))
      } else {
        assert(r.getAs[String]("decision") == "continue", s"case $k")
        assert(r.isNullAt(r.fieldIndex("decision_ts")), s"case $k")
      }
    }
  }

  test("eProcessMean: validity shape on null data, power on a " +
      "shifted mean, refusals (range, duplicate position, params)") {
    // constant stream AT the null mean: lam pins to 0 via the mu-hat
    // anchor, every factor is exactly 1, e never moves
    val flat = (1L to 40L).map(i => ("e", i, i, 500L))
      .toDF("e", "t", "i", "v")
    val r0 = Experiment.eProcessMean(flat, "e", "t", "i", "v",
      mMilli = 500L, alphaMilli = 50L).collect()(0)
    assert(r0.getAs[Long]("e_final_nano") == 0L &&
      r0.getAs[String]("decision") == "continue", s"got $r0")
    // stream far above the null: must cross
    val up = (1L to 60L).map(i => ("e", i, i, 900L))
      .toDF("e", "t", "i", "v")
    val r1 = Experiment.eProcessMean(up, "e", "t", "i", "v",
      mMilli = 300L, alphaMilli = 50L).collect()(0)
    assert(r1.getAs[String]("decision") == "reject_h0", s"got $r1")
    val bad = intercept[Exception] {
      Experiment.eProcessMean(Seq(("e", 1L, 1L, 1001L))
        .toDF("e", "t", "i", "v"), "e", "t", "i", "v", 500L, 50L)
        .collect()
    }
    assert(rootCause(bad).getMessage.contains("outside [0, 1000]"))
    val dup = intercept[Exception] {
      Experiment.eProcessMean(
        Seq(("e", 1L, 1L, 5L), ("e", 1L, 1L, 6L))
          .toDF("e", "t", "i", "v"), "e", "t", "i", "v", 500L, 50L)
        .collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate position"))
    intercept[IllegalArgumentException] {
      Experiment.eProcessMean(flat, "e", "t", "i", "v", 1000L, 50L)
    }
    intercept[IllegalArgumentException] {
      Experiment.eProcessMean(flat, "e", "t", "i", "v", 500L, 500L)
    }
  }

  /** Independent plain-Scala replay of logRankKExact's documented
    * chain — stratum-local risk walks, integer-micro E, per-time
    * covariance entries through the q310 IEEE chain, and the exact
    * quadratic form on the kept (drop-min) arms via the 2x2
    * adjugate (k = 3 fixtures). Returns (E per arm, chi2_micro).
    */
  private def lrkExactReplay(rows: Seq[(String, String, Long, Long)])
      : (Map[String, Long], Option[Long]) = {
    val arms = rows.map(_._1).distinct.sorted
    val e = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    val w = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    for (s <- rows.map(_._2).distinct) {
      val sr = rows.filter(_._2 == s)
      val sArms = sr.map(_._1).distinct.sorted
      for (t <- sr.filter(_._4 == 1L).map(_._3).distinct.sorted) {
        val atRisk = sr.filter(_._3 >= t)
        val n = atRisk.size.toLong
        val dt = sr.count(r => r._3 == t && r._4 == 1L).toLong
        val ng = sArms.map(g =>
          g -> atRisk.count(_._1 == g).toLong).toMap
        for (g <- sArms) e(g) += (1000000L * (dt * ng(g))) / n
        if (n > 1) {
          val den = n.toDouble * n.toDouble * (n - 1).toDouble
          for (g <- sArms)
            w((g, g)) += math.floor((dt * ng(g)).toDouble
              * (n - ng(g)).toDouble * (n - dt).toDouble / den
              * 1000000).toLong
          for (i <- sArms.indices; j <- i + 1 until sArms.size)
            w((sArms(i), sArms(j))) -=
              math.floor((dt * ng(sArms(i))).toDouble
                * ng(sArms(j)).toDouble * (n - dt).toDouble / den
                * 1000000).toLong
        }
      }
    }
    val oByArm = arms.map(g =>
      g -> rows.count(r => r._1 == g && r._4 == 1L).toLong).toMap
    val kept = arms.drop(1)
    val chi =
      if (kept.size == 2) {
        val z1 = BigInt(1000000L * oByArm(kept(0)) - e(kept(0)))
        val z2 = BigInt(1000000L * oByArm(kept(1)) - e(kept(1)))
        val w11 = BigInt(w((kept(0), kept(0))))
        val w22 = BigInt(w((kept(1), kept(1))))
        val w12 = BigInt(w((kept(0), kept(1))))
        val det = w11 * w22 - w12 * w12
        if (det.signum <= 0) None
        else Some(((z1 * z1 * w22 - 2 * z1 * z2 * w12
          + z2 * z2 * w11) / det).toLong)
      } else None
    (e.toMap, chi)
  }

  test("logRankKExact: k = 2 pins bit-for-bit to logRank's exact " +
      "hypergeometric chain (chi2, e_micro)") {
    val rnd = new scala.util.Random(1907L)
    (0 until 3).foreach { c =>
      val rows = (0 until 30 + rnd.nextInt(30)).map { _ =>
        ("e", rnd.nextInt(2).toLong, rnd.nextInt(8).toLong,
          if (rnd.nextInt(3) > 0) 1L else 0L)
      }
      val df = rows.toDF("exp", "g", "dur", "ev")
      val two = Experiment.logRank(df, "exp", "g", "dur", "ev")
        .collect().map(r => r.getAs[Long]("grp") -> r).toMap
      val kx = Experiment.logRankKExact(
          df.withColumn("st", lit(0L)),
          "exp", "st", "g", "dur", "ev")
        .collect().map(r => r.getAs[String]("grp") -> r).toMap
      assert(kx("1").getAs[Long]("e_micro") ==
        two(1L).getAs[Long]("e1_micro"), s"case $c")
      val wantChi =
        if (two(1L).isNullAt(two(1L).fieldIndex("chi2_micro"))) None
        else Some(two(1L).getAs[Long]("chi2_micro"))
      val gotChi =
        if (kx("1").isNullAt(kx("1").fieldIndex("chi2_micro"))) None
        else Some(kx("1").getAs[Long]("chi2_micro"))
      assert(gotChi == wantChi, s"case $c: got $gotChi want $wantChi")
      assert(kx("1").getAs[Long]("df") == 1L)
    }
  }

  test("logRankKExact: 3-arm stratified fixtures equal the " +
      "independent plain-scala replay (E per arm, exact 2x2 " +
      "quadratic form), and sit near the real-arithmetic chi2") {
    val rnd = new scala.util.Random(1909L)
    (0 until 4).foreach { c =>
      // tie-rich: 3 arms, 2 strata, small time lattice
      val rows = (0 until 40 + rnd.nextInt(40)).map { _ =>
        ("arm" + rnd.nextInt(3), "s" + rnd.nextInt(2),
          rnd.nextInt(6).toLong, if (rnd.nextInt(3) > 0) 1L else 0L)
      }
      val df = rows.map { case (g, s, t, e) => ("e", g, s, t, e) }
        .toDF("exp", "g", "st", "dur", "ev")
      val got = Experiment.logRankKExact(df, "exp", "st", "g",
        "dur", "ev").collect()
        .map(r => r.getAs[String]("grp") -> r).toMap
      val (eRep, chiRep) = lrkExactReplay(rows)
      got.foreach { case (g, r) =>
        assert(r.getAs[Long]("e_micro") == eRep.getOrElse(g, 0L),
          s"case $c arm $g: ${r.getAs[Long]("e_micro")} vs " +
            s"${eRep.getOrElse(g, 0L)}")
      }
      val r1 = got("arm1")
      val gotChi =
        if (r1.isNullAt(r1.fieldIndex("chi2_micro"))) None
        else Some(r1.getAs[Long]("chi2_micro"))
      assert(gotChi == chiRep, s"case $c: got $gotChi want $chiRep")
      assert(r1.getAs[Long]("df") == 2L)
      // sanity vs the real-arithmetic definition (no lattice): the
      // micro flooring shifts chi2 by well under 0.05
      gotChi.foreach { chi =>
        val arms = rows.map(_._1).distinct.sorted
        val e = scala.collection.mutable.Map[String, Double]()
          .withDefaultValue(0.0)
        val w = scala.collection.mutable
          .Map[(String, String), Double]().withDefaultValue(0.0)
        for (s <- rows.map(_._2).distinct) {
          val sr = rows.filter(_._2 == s)
          for (t <- sr.filter(_._4 == 1L).map(_._3).distinct) {
            val atRisk = sr.filter(_._3 >= t)
            val n = atRisk.size.toDouble
            val dt = sr.count(r => r._3 == t && r._4 == 1L).toDouble
            if (n > 1) for (a <- arms; b <- arms) {
              val na = atRisk.count(_._1 == a).toDouble
              val nb = atRisk.count(_._1 == b).toDouble
              val d = if (a == b) 1.0 else 0.0
              w((a, b)) += dt * (na / n) * (d - nb / n) *
                (n - dt) / (n - 1)
            }
            for (a <- arms)
              e(a) += dt * atRisk.count(_._1 == a).toDouble / n
          }
        }
        val kept = arms.drop(1)
        val z = kept.map(g =>
          rows.count(r => r._1 == g && r._4 == 1L) - e(g))
        val (a11, a22, a12) = (w((kept(0), kept(0))),
          w((kept(1), kept(1))), w((kept(0), kept(1))))
        val det = a11 * a22 - a12 * a12
        if (det > 1e-9) {
          val real = (z(0) * z(0) * a22 - 2 * z(0) * z(1) * a12
            + z(1) * z(1) * a11) / det
          assert(math.abs(chi / 1e6 - real) < 0.05,
            s"case $c: lattice ${chi / 1e6} vs real $real")
        }
      }
    }
  }

  test("logRankKExact: maxArms contract and param range refuse " +
      "loudly") {
    intercept[IllegalArgumentException] {
      Experiment.logRankKExact(
        Seq(("e", 0L, "a", 1L, 1L)).toDF("exp", "st", "g", "dur", "ev"),
        "exp", "st", "g", "dur", "ev", maxArms = 17)
    }
    val many = intercept[Exception] {
      Experiment.logRankKExact(
        (1L to 20L).map(i => ("e", 0L, s"arm$i", i, 1L))
          .toDF("exp", "st", "g", "dur", "ev"),
        "exp", "st", "g", "dur", "ev").collect()
    }
    assert(rootCause(many).getMessage.contains("maxArms=16"),
      s"got ${rootCause(many).getMessage}")
  }

  test("pageTrend == independent plain-scala replay (doubled " +
      "midranks, permutation variance) on random tie-rich complete " +
      "designs; textbook monotone fixture maxes L") {
    val rnd = new scala.util.Random(1913L)
    def replay(blocks: Seq[Seq[Long]]): (Long, Long, Long, Option[Long]) = {
      // blocks(b)(j) = value of treatment j (order = index) in block b
      val k = blocks.head.size.toLong
      val n = blocks.size.toLong
      var l2 = 0L; var var12 = 0L
      blocks.foreach { vs =>
        val r2 = vs.map(v => 2L * vs.count(_ < v) +
          vs.count(_ == v) + 1L)
        l2 += r2.zipWithIndex.map { case (r, j) => (j + 1L) * r }.sum
        val dev = k * r2.map(r => r * r).sum - (k * (k + 1L)) *
          (k * (k + 1L))
        var12 += dev * (k + 1L)
      }
      val e2 = n * k * (k + 1L) * (k + 1L) / 2L
      val z = if (var12 <= 0) None
        else Some(math.floor((l2 - e2).toDouble * 1000.0
          / math.sqrt(var12.toDouble / 12.0)).toLong)
      (l2, e2, var12, z)
    }
    (0 until 5).foreach { c =>
      val k = 3 + rnd.nextInt(3)
      val n = 4 + rnd.nextInt(8)
      val blocks = Seq.fill(n)(Seq.fill(k)(rnd.nextInt(4).toLong))
      val df = blocks.zipWithIndex.flatMap { case (vs, b) =>
        vs.zipWithIndex.map { case (v, j) =>
          ("key", s"b$b", j.toLong, v) }
      }.toDF("key", "blk", "treat", "v")
      val r = Experiment.pageTrend(df, "key", "blk", "treat", "v")
        .collect()(0)
      val (l2, e2, v12, z) = replay(blocks)
      assert(r.getAs[Long]("l2") == l2, s"case $c")
      assert(r.getAs[Long]("e_l2") == e2, s"case $c")
      assert(r.getAs[Long]("var_num12") == v12, s"case $c")
      val gotZ = if (r.isNullAt(r.fieldIndex("z_milli"))) None
        else Some(r.getAs[Long]("z_milli"))
      assert(gotZ == z, s"case $c: got $gotZ want $z " +
        s"(l2=$l2 e2=$e2 v12=$v12) blocks=$blocks")
      assert(r.getAs[Long]("n_blocks") == n &&
        r.getAs[Long]("k") == k)
    }
    // textbook monotone fixture: k=3, 4 blocks, strictly increasing
    // -> L2 = 28n, E = 24n, var12 = 96n, z = 4000n/sqrt(8n)
    val mono = (0 until 4).flatMap(b =>
      Seq(("key", s"b$b", 0L, 10L), ("key", s"b$b", 1L, 20L),
        ("key", s"b$b", 2L, 30L))).toDF("key", "blk", "treat", "v")
    val rm = Experiment.pageTrend(mono, "key", "blk", "treat", "v")
      .collect()(0)
    assert(rm.getAs[Long]("l2") == 112L &&
      rm.getAs[Long]("e_l2") == 96L &&
      rm.getAs[Long]("var_num12") == 384L, s"got $rm")
    assert(rm.getAs[Long]("z_milli") ==
      math.floor(16000.0 / math.sqrt(32.0)).toLong, s"got $rm")
    // all-constant blocks: zero variance -> null z, visible
    val flat = (0 until 3).flatMap(b => (0 until 3).map(j =>
      ("key", s"b$b", j.toLong, 7L))).toDF("key", "blk", "treat", "v")
    val rf = Experiment.pageTrend(flat, "key", "blk", "treat", "v")
      .collect()(0)
    assert(rf.isNullAt(rf.fieldIndex("z_milli")) &&
      rf.getAs[Long]("var_num12") == 0L)
  }

  test("pageTrend: refusals — incomplete design, duplicate cell, " +
      "non-castable treatment") {
    val inc = intercept[Exception] {
      Experiment.pageTrend(
        Seq(("k", "b0", 0L, 1L), ("k", "b0", 1L, 2L),
          ("k", "b1", 0L, 3L))
          .toDF("key", "blk", "treat", "v"),
        "key", "blk", "treat", "v").collect()
    }
    assert(rootCause(inc).getMessage.contains("complete"),
      s"got ${rootCause(inc).getMessage}")
    val dup = intercept[Exception] {
      Experiment.pageTrend(
        Seq(("k", "b0", 0L, 1L), ("k", "b0", 0L, 2L))
          .toDF("key", "blk", "treat", "v"),
        "key", "blk", "treat", "v").collect()
    }
    assert(rootCause(dup).getMessage.contains("more than once"),
      s"got ${rootCause(dup).getMessage}")
    val bad = intercept[Exception] {
      Experiment.pageTrend(
        Seq(("k", "b0", "small", 1L), ("k", "b0", "large", 2L))
          .toDF("key", "blk", "treat", "v"),
        "key", "blk", "treat", "v").collect()
    }
    assert(rootCause(bad).getMessage
      .contains("hypothesized order"),
      s"got ${rootCause(bad).getMessage}")
  }
}
