package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Drift

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null) t else rootCause(t.getCause)

  test("levelShift: trailing vs leading full-window sums, edges " +
      "emit nothing, per-key isolation, refusals") {
    // key a: level steps 10 -> 50 at ts 4; w = 2
    val rows = Seq(
      ("a", 1L, 1L, 10L), ("a", 2L, 2L, 10L), ("a", 3L, 3L, 10L),
      ("a", 4L, 4L, 50L), ("a", 5L, 5L, 50L), ("a", 6L, 6L, 50L),
      // key b: too short for any full window pair
      ("b", 1L, 7L, 5L), ("b", 2L, 8L, 5L))
      .toDF("k", "ts", "id", "v")
    val got = Drift.levelShift(rows, "k", "ts", "id", "v", w = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // positions with BOTH windows full: ts 2, 3, 4
    assert(got == Map(
      ("a", 2L) -> ((20L, 60L, 40L)),
      ("a", 3L) -> ((20L, 100L, 80L)),
      ("a", 4L) -> ((60L, 100L, 40L))), s"got $got")
    val e = intercept[Exception] {
      Drift.levelShift(Seq(("a", 1L, 1L, Some(1L)),
        ("a", 2L, 2L, None)).toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v", w = 2).collect()
    }
    assert(rootCause(e).getMessage.contains("levelShift value"))
    intercept[IllegalArgumentException] {
      Drift.levelShift(rows, "k", "ts", "id", "v", w = 1)
    }
  }

  test("benfordCheck: digit extraction, zero-fill to nine rows, " +
      "visible zero bucket, engine-exact chi2, refusal") {
    // key a: one value per digit bucket exercised: 5 -> digit 5;
    // -321 -> 3; 1000 -> 1; 0 -> the zero bucket
    val rows = Seq(("a", 5L), ("a", -321L), ("a", 1000L), ("a", 0L),
      ("z", 0L)).toDF("k", "v")
    val got = Drift.benfordCheck(rows, "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(got.size == 18, s"expected 9 digit rows per key: ${got.size}")
    // the same fixed-op-order fold the operator documents
    val bp = Drift.BenfordPpm.toMap
    def term(o: Long, n: Long, e: Long): Long = {
      val d = 1000000L * o - n * e
      math.floor((d.toDouble / 1000000.0) * (d.toDouble / 1000000.0)
        / (n.toDouble * e.toDouble / 1000000.0) * 1000000).toLong
    }
    val wantChi = (1L to 9L).map(d =>
      term(if (d == 5 || d == 3 || d == 1) 1L else 0L, 3L, bp(d))).sum
    (1L to 9L).foreach { d =>
      val (o, e, nz, chi) = got(("a", d))
      assert(e == bp(d) && nz == 1L && chi == wantChi)
      assert(o == (if (d == 5 || d == 3 || d == 1) 1L else 0L))
    }
    // all-zero key: N = 0 -> null chi2, zero observations, n_zero = 1
    assert(got(("z", 5L)) == ((0L, bp(5L), 1L, -1L)))
    val e = intercept[Exception] {
      Drift.benfordCheck(Seq(("a", Option.empty[Long])).toDF("k", "v"),
        "k", "v").collect()
    }
    assert(rootCause(e).getMessage.contains("benfordCheck value"))
  }

  test("chiSquareDrift: identical histograms give 0, disjoint give " +
      "exact chi2, one-period key is null, refusal") {
    def mk(key: String, b: Long, p: Long, n: Int) =
      Seq.fill(n)((key, b, p))
    val rows = (mk("k", 1L, 0L, 10) ++ mk("k", 1L, 1L, 10) ++
      mk("k", 2L, 0L, 10) ++ mk("k", 2L, 1L, 10) ++
      mk("m", 1L, 0L, 10) ++ mk("m", 2L, 1L, 10) ++
      mk("solo", 1L, 0L, 5)).toDF("key", "b", "p")
    val got = Drift.chiSquareDrift(rows, "key", "b", "p").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(got(("k", 1L)) == ((10L, 10L, 2L, 0L)))
    assert(got(("k", 2L)) == ((10L, 10L, 2L, 0L)))
    // m: fully disjoint 2x2 with 10/10 -> chi2 = 20 exactly
    assert(got(("m", 1L)) == ((10L, 0L, 2L, 20000000L)), s"$got")
    assert(got(("m", 2L)) == ((0L, 10L, 2L, 20000000L)))
    // solo: period-1 marginal is zero -> chi2 undefined, not zero
    assert(got(("solo", 1L)) == ((5L, 0L, 1L, -1L)))
    val e = intercept[Exception] {
      Drift.chiSquareDrift(Seq(("k", 1L, 2L)).toDF("key", "b", "p"),
        "key", "b", "p").collect()
    }
    assert(rootCause(e).getMessage.contains("outside {0,1}"))
  }

  test("nullRateDrift: one-pass multi-column null rates, empty " +
      "period is null not zero, period refusal") {
    val rows = Seq(
      (0L, Some(1L), Option.empty[String]),
      (0L, Option.empty[Long], Option.empty[String]),
      (1L, Some(2L), Option.empty[String]),
      (1L, Option.empty[Long], Option.empty[String]),
      (1L, Option.empty[Long], Option.empty[String]),
      (1L, Some(3L), Option.empty[String]))
      .toDF("p", "a", "b")
    val got = Drift.nullRateDrift(rows, Seq("a", "b"), "p").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6),
        if (r.isNullAt(7)) -1L else r.getLong(7)))).toMap
    // a: p0 1/2 null -> 500000; p1 2/4 null -> 500000; delta 0
    assert(got("a") == ((2L, 1L, 4L, 2L, 500000L, 500000L, 0L)),
      s"got ${got("a")}")
    // b: all null both periods
    assert(got("b") == ((2L, 2L, 4L, 4L, 1000000L, 1000000L, 0L)))
    // a period with no rows: rate null, delta null
    val g1 = Drift.nullRateDrift(rows.filter(rows("p") === 1),
      Seq("a"), "p").collect()(0)
    assert(g1.getLong(1) == 0L && g1.isNullAt(5) && g1.isNullAt(7))
    val e2 = intercept[Exception] {
      Drift.nullRateDrift(Seq((5L, 1L)).toDF("p", "a"), Seq("a"), "p")
        .collect()
    }
    assert(rootCause(e2).getMessage.contains("outside {0,1}"))
    intercept[IllegalArgumentException] {
      Drift.nullRateDrift(rows, Seq.empty, "p")
    }
  }

  test("ksDrift: planted shift has the known KS statistic, exact " +
      "integer cross-multiplication, empty-group null, per-key " +
      "isolation, refusals") {
    // key a: g0 = {1,2,3,4}, g1 = {3,4,5,6} -> D = |2/4 - 0/4| = 0.5
    val rows = Seq(
      ("a", 0L, 1L), ("a", 0L, 2L), ("a", 0L, 3L), ("a", 0L, 4L),
      ("a", 1L, 3L), ("a", 1L, 4L), ("a", 1L, 5L), ("a", 1L, 6L),
      // key b: identical samples -> D = 0
      ("b", 0L, 7L), ("b", 1L, 7L),
      // key c: one-sided -> undefined
      ("c", 0L, 1L))
      .toDF("k", "g", "v")
    val got = Drift.ksDrift(rows, "k", "g", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got("a") == ((4L, 4L, 8L, 500000L)), s"got ${got("a")}")
    assert(got("b") == ((1L, 1L, 0L, 0L)))
    assert(got("c") == ((1L, 0L, 0L, -1L)), s"got ${got("c")}")
    val badG = intercept[Exception] {
      Drift.ksDrift(Seq(("a", 2L, 1L)).toDF("k", "g", "v"),
        "k", "g", "v").collect()
    }
    assert(rootCause(badG).getMessage.contains("not 0/1"))
    val badV = intercept[Exception] {
      Drift.ksDrift(Seq(("a", 0L, Option.empty[Long]))
        .toDF("k", "g", "v"), "k", "g", "v").collect()
    }
    assert(rootCause(badV).getMessage.contains("ksDrift value"))
  }

  test("psi: add-one smoothed shares in the documented op order, " +
      "symmetric swap doubles one term, one-period keys null, " +
      "refusals") {
    // key a: bucket 0 swaps 9:1 -> 1:9 against bucket 1 (B = 2,
    // c0 = c1 = 10); both bucket terms equal by symmetry
    val rows =
      (1 to 9).map(_ => ("a", 0L, 0L)) ++ Seq(("a", 1L, 0L)) ++
      (1 to 9).map(_ => ("a", 1L, 1L)) ++ Seq(("a", 0L, 1L)) ++
      // key d: period 1 never observed -> psi null, counts visible
      Seq(("d", 5L, 0L))
    val got = Drift.psi(rows.toDF("k", "b", "p"), "k", "b", "p")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    // the operator's exact lattice in plain scala
    def term(n0: Long, n1: Long, c0: Long, c1: Long, b: Long): Long = {
      val p0 = (n0 + 1).toDouble / (c0 + b).toDouble
      val p1 = (n1 + 1).toDouble / (c1 + b).toDouble
      math.floor((p1 - p0) * math.log(p1 / p0) * 1000000).toLong
    }
    val t0 = term(9, 1, 10, 10, 2)
    val t1 = term(1, 9, 10, 10, 2)
    assert(t0 == t1 && t0 > 0)
    assert(got(("a", 0L)) == ((9L, 1L, 2L, t0 + t1)),
      s"got ${got(("a", 0L))}, want psi ${t0 + t1}")
    assert(got(("a", 1L)) == ((1L, 9L, 2L, t0 + t1)))
    assert(got(("d", 5L)) == ((1L, 0L, 1L, -1L)), s"got ${got(("d", 5L))}")
    val bad = intercept[Exception] {
      Drift.psi(Seq(("a", 0L, 7L)).toDF("k", "b", "p"), "k", "b", "p")
        .collect()
    }
    assert(rootCause(bad).getMessage.contains("outside {0,1}"))
  }

  test("cusum: the prefix-minimum identity replays the sequential " +
      "max(0, ...) recurrence exactly on both sides, per-key " +
      "isolation, refusals") {
    // mu = 10, kappa = 2; hand recurrence:
    //   v:     10 10 20 20  5 10
    //   s_pos:  0  0  8 16  9  7
    //   s_neg:  0  0  0  0  3  1
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 20L),
      ("a", 4L, 20L), ("a", 5L, 5L), ("a", 6L, 10L),
      ("b", 1L, 100L)) // second key: isolated accumulation
      .toDF("k", "ts", "v")
      .withColumn("tie", org.apache.spark.sql.functions.col("ts"))
    val got = Drift.cusum(rows, "k", "ts", "tie", "v",
        mu = 10L, kappa = 2L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", 1L)) == ((0L, 0L)), s"got $got")
    assert(got(("a", 2L)) == ((0L, 0L)))
    assert(got(("a", 3L)) == ((8L, 0L)))
    assert(got(("a", 4L)) == ((16L, 0L)))
    assert(got(("a", 5L)) == ((9L, 3L)))
    assert(got(("a", 6L)) == ((7L, 1L)))
    assert(got(("b", 1L)) == ((88L, 0L))) // 100-12, isolated from a
    val bad = intercept[Exception] {
      Drift.cusum(Seq(("a", 1L, Option.empty[Long]))
        .toDF("k", "ts", "v")
        .withColumn("tie", org.apache.spark.sql.functions.col("ts")),
        "k", "ts", "tie", "v", 0L, 0L).collect()
    }
    assert(rootCause(bad).getMessage.contains("cusum value"))
    intercept[IllegalArgumentException] {
      Drift.cusum(rows, "k", "ts", "tie", "v", 0L, -1L)
    }
  }

  test("embeddingDrift: orthogonal means 0, parallel means exactly " +
      "1e6, opposite -1e6, empty period null, ragged refusal") {
    val rows = Seq(
      // key a: period-0 mean along e1, period-1 along e2 -> cos 0
      ("a", 0L, Seq(1.0f, 0.0f)), ("a", 0L, Seq(1.0f, 0.0f)),
      ("a", 1L, Seq(0.0f, 2.0f)),
      // key b: parallel (scale-invariant) -> exactly 1e6
      ("b", 0L, Seq(1.0f, 1.0f)), ("b", 1L, Seq(2.0f, 2.0f)),
      // key d: opposite -> exactly -1e6
      ("d", 0L, Seq(-1.0f, 0.0f)), ("d", 1L, Seq(1.0f, 0.0f)),
      // key c: one-sided -> undefined
      ("c", 0L, Seq(1.0f, 0.0f)))
      .toDF("k", "p", "vec")
    val got = Drift.embeddingDrift(rows, "k", "p", "vec", dim = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3)))).toMap
    assert(got("a") == ((2L, 1L, 0L)), s"got ${got("a")}")
    assert(got("b") == ((1L, 1L, 1000000L)), s"got ${got("b")}")
    assert(got("d") == ((1L, 1L, -1000000L)), s"got ${got("d")}")
    assert(got("c") == ((1L, 0L, Long.MinValue)))
    val ragged = intercept[Exception] {
      Drift.embeddingDrift(Seq(("a", 0L, Seq(1.0f)))
        .toDF("k", "p", "vec"), "k", "p", "vec", dim = 2).collect()
    }
    assert(rootCause(ragged).getMessage.contains("ragged vector"),
      rootCause(ragged).getMessage)
    val badP = intercept[Exception] {
      Drift.embeddingDrift(Seq(("a", 7L, Seq(1.0f, 0.0f)))
        .toDF("k", "p", "vec"), "k", "p", "vec", dim = 2).collect()
    }
    assert(rootCause(badP).getMessage.contains("outside {0,1}"))
  }

  test("quantileDrift: integer-ceil ranks give the exact lower " +
      "quantiles both sides, deltas, one-sided keys null, refusals") {
    val rows = (1L to 10L).map(v => ("k", 0L, v)) ++
      Seq(("k", 1L, 11L), ("k", 1L, 12L), ("k", 1L, 13L),
        ("k", 1L, 14L)) ++
      (1L to 5L).map(v => ("solo", 0L, v * 10))
    val got = Drift.quantileDrift(rows.toDF("key", "p", "v"),
        "key", "p", "v", pcts = Seq(25, 50, 75, 95)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Long.MinValue else r.getLong(4),
          if (r.isNullAt(5)) Long.MinValue else r.getLong(5),
          if (r.isNullAt(6)) Long.MinValue else r.getLong(6)))).toMap
    // p0 n=10: ranks 3/5/8/10 -> 3,5,8,10; p1 n=4: ranks 1/2/3/4
    assert(got(("k", 25L)) == ((10L, 4L, 3L, 11L, 8L)), s"got $got")
    assert(got(("k", 50L)) == ((10L, 4L, 5L, 12L, 7L)))
    assert(got(("k", 75L)) == ((10L, 4L, 8L, 13L, 5L)))
    assert(got(("k", 95L)) == ((10L, 4L, 10L, 14L, 4L)))
    assert(got(("solo", 50L)) ==
      ((5L, 0L, 30L, Long.MinValue, Long.MinValue)))
    intercept[IllegalArgumentException] {
      Drift.quantileDrift(rows.toDF("key", "p", "v"), "key", "p", "v",
        Seq(0))
    }
    intercept[IllegalArgumentException] {
      Drift.quantileDrift(rows.toDF("key", "p", "v"), "key", "p", "v",
        Seq(50, 50))
    }
    val bad = intercept[Exception] {
      Drift.quantileDrift(Seq(("k", 0L, Option.empty[Long]))
        .toDF("key", "p", "v"), "key", "p", "v", Seq(50)).collect()
    }
    assert(rootCause(bad).getMessage.contains("quantileDrift value"))
  }

  test("null keys are REAL groups: benfordCheck zero-fills and " +
      "chi-squares them, chiSquareDrift folds them — neither drops " +
      "or zeroes a null-key group (round-16 advice)") {
    // null key with observed digits: must NOT read n_obs = 0
    val b = Drift.benfordCheck(
      Seq((Option.empty[String], 123L), (Option.empty[String], 456L),
        (Some("k"), 789L)).toDF("k", "v"), "k", "v").collect()
      .map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0),
        r.getLong(1)) -> ((r.getLong(2),
          if (r.isNullAt(5)) -1L else r.getLong(5))))
      .toMap
    assert(b.size == 18, s"expected 9 digit rows for BOTH keys: $b")
    assert(b(("<null>", 1L))._1 == 1L && b(("<null>", 4L))._1 == 1L,
      s"null-key digits lost: $b")
    assert(b(("<null>", 1L))._2 > 0L, "null-key chi2 missing")
    // chiSquareDrift: a null key's buckets must appear with a chi2
    val c = Drift.chiSquareDrift(
      Seq((Option.empty[String], 0L, 0L), (Option.empty[String], 0L, 1L),
        (Option.empty[String], 1L, 0L), (Option.empty[String], 1L, 1L))
        .toDF("k", "b", "p"), "k", "b", "p").collect()
    assert(c.length == 2 && c.forall(r => r.isNullAt(0) &&
      !r.isNullAt(5)), s"null-key drift group dropped: ${c.toSeq}")
  }

  test("jsDivergence: identical histograms read 0, fully disjoint " +
      "reads ~ln 2, empty period null, bad period refuses") {
    // identical: every bucket 2/2 -> all terms 0
    val same = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
      .map { case (b, p) => ("k", b, p) }.toDF("k", "b", "p")
    assert(Drift.jsDivergence(same, "k", "b", "p").collect()
      .forall(_.getAs[Long]("jsd_micro") == 0L))
    // disjoint: bucket 0 only period 0, bucket 1 only period 1 ->
    // 2 x floor(ln2 * 500000) = 693146 micro
    val disj = Seq(("k", 0L, 0L), ("k", 1L, 1L)).toDF("k", "b", "p")
    assert(Drift.jsDivergence(disj, "k", "b", "p").collect()
      .forall(_.getAs[Long]("jsd_micro") == 693146L))
    // a key with period 1 absent entirely -> null (degenerate)
    val one = Seq(("k", 0L, 0L), ("k", 1L, 0L)).toDF("k", "b", "p")
    assert(Drift.jsDivergence(one, "k", "b", "p").collect()
      .forall(_.isNullAt(5)))
    val bad = intercept[Exception] {
      Drift.jsDivergence(Seq(("k", 0L, 2L)).toDF("k", "b", "p"),
        "k", "b", "p").collect()
    }
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    assert(rc(bad).getMessage.contains("outside {0,1}"))
  }

  test("categoryEntropy: ln2 lattice values for the even split, " +
      "skewed 562334, single-category 0/0, null refusal") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
      ("b", "x"), ("b", "x"), ("b", "x"), ("b", "y"),
      ("c", "z")).toDF("k", "c")
    val got = Drift.categoryEntropy(df, "k", "c").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("entropy_micro"),
        r.getAs[Long]("max_entropy_micro"))).toMap
    // even: 2*floor(1e6*0.5*ln2) = 2*346573; max = floor(1e6*ln2)
    assert(got("a") == ((693146L, 693147L)), s"got $got")
    // 3:1: floor(750000*ln(4/3)) + floor(250000*ln4) =
    //   215761 + 346573
    assert(got("b") == ((562334L, 693147L)))
    assert(got("c") == ((0L, 0L)), "one category: 0 over max 0")
    val nul = intercept[Exception] {
      Drift.categoryEntropy(Seq(("a", Option.empty[String]))
        .toDF("k", "c"), "k", "c").collect()
    }
    assert(rootCause(nul).getMessage.contains("null category"))
  }

  test("changepointAmoc: step series splits at the step with the " +
      "hand gain; flat series ties to the earliest candidate; " +
      "short keys emit a visible null row") {
    def mk(k: String, vs: Seq[Long]) = vs.zipWithIndex
      .map { case (v, i) => (k, i.toLong + 1L, i.toLong, v) }
    val df = (mk("a", Seq(0L, 0L, 0L, 10L, 10L, 10L))
      ++ mk("b", Seq(5L, 5L, 5L, 5L)) ++ mk("c", Seq(1L, 9L, 1L)))
      .toDF("k", "t", "e", "v")
    val got = Drift.changepointAmoc(df, "k", "t", "e", "v",
      minSeg = 2).collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    // gains at pos 2/3/4 = 75e6 / 150e6 / 75e6 -> split after pos 3
    assert(a.getAs[Long]("n_left") == 3L &&
      a.getAs[Long]("split_ts") == 3L &&
      a.getAs[Long]("gain_micro") == 150000000L)
    assert(a.getAs[Long]("mean_left_micro") == 0L &&
      a.getAs[Long]("mean_right_micro") == 10000000L)
    // flat: all gains 0, earliest candidate wins
    val b = got("b")
    assert(b.getAs[Long]("gain_micro") == 0L &&
      b.getAs[Long]("n_left") == 2L &&
      b.getAs[Long]("mean_left_micro") == 5000000L)
    // n=3 with minSeg=2: no candidate -> visible null row
    val c = got("c")
    assert(c.getAs[Long]("n") == 3L && c.isNullAt(2) && c.isNullAt(5))
    val nul = intercept[Exception] {
      Drift.changepointAmoc(Seq(("a", 1L, 0L, Option.empty[Long]))
        .toDF("k", "t", "e", "v"), "k", "t", "e", "v").collect()
    }
    assert(rootCause(nul).getMessage.contains("changepointAmoc value"))
    val dup = intercept[Exception] {
      Drift.changepointAmoc(Seq(("a", 1L, 0L, 5L), ("a", 1L, 0L, 6L))
        .toDF("k", "t", "e", "v"), "k", "t", "e", "v").collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate position"),
      s"got ${rootCause(dup).getMessage}")
  }

  test("mutualInformation: independence reads 0, identity reads " +
      "ln2 micro, a negative cell term floors down; null refusal") {
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .map { case (a, b) => ("k", a, b) }.toDF("k", "a", "b")
    assert(Drift.mutualInformation(ind, "k", "a", "b").collect()(0)
      .getAs[Long]("mi_micro") == 0L)
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .map { case (a, b) => ("k", a, b) }.toDF("k", "a", "b")
    // 2 * floor(0.5e6 * ln 2) = 693146
    assert(Drift.mutualInformation(dep, "k", "a", "b").collect()(0)
      .getAs[Long]("mi_micro") == 693146L)
    val mix = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("y", "q"))
      .map { case (a, b) => ("k", a, b) }.toDF("k", "a", "b")
    // 143841 + floor(-101366.3) + 173286 = 215760
    assert(Drift.mutualInformation(mix, "k", "a", "b").collect()(0)
      .getAs[Long]("mi_micro") == 215760L)
    val nul = intercept[Exception] {
      Drift.mutualInformation(Seq(("k", Option.empty[String], "b"))
        .toDF("k", "a", "b"), "k", "a", "b").collect()
    }
    assert(rootCause(nul).getMessage.contains("null a"))
  }
}
