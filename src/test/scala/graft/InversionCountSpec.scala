package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.operators.Ops

/** Laws for the O(n log n) inversion-count correlation operators:
  * [[Ops.kendallTauLarge]] and [[Ops.mannKendallLarge]] must be
  * BIT-EQUAL to their O(n²) pair-join siblings ([[Ops.kendallTauB]],
  * [[Ops.mannKendallTrend]]) on every input both accept — same
  * schema, same values, same nulls — across tie-rich randomized
  * fixtures and degenerate bucket counts (buckets=2 forces the grid
  * + intra-bucket split onto nearly every pair; buckets=65536 makes
  * Bg=⌊√n⌋ per group). A plain-Scala brute-force pair count checks
  * both against the definition.
  */
class InversionCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null) t else rootCause(t.getCause)

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val p = org.scalacheck.Gen.Parameters.default.withSize(50)
    (0 until n).flatMap(i => g.apply(p, org.scalacheck.rng.Seed(1800L + i)))
  }

  private def bruteInv(qs: Seq[Long]): Long =
    (for (i <- qs.indices; j <- i + 1 until qs.length
          if qs(i) > qs(j)) yield 1L).sum

  test("mergeCountInversions == brute-force strict pair count, " +
      "duplicates uncounted") {
    val gen = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-6L, 6L)))
    samples(gen, 12).zipWithIndex.foreach { case (vs, i) =>
      assert(Ops.mergeCountInversions(vs) == bruteInv(vs),
        s"case $i: $vs")
    }
    assert(Ops.mergeCountInversions(Seq.empty) == 0L)
    assert(Ops.mergeCountInversions(Seq(5L)) == 0L)
    assert(Ops.mergeCountInversions(Seq(3L, 3L, 3L)) == 0L,
      "equal values are not inversions")
  }

  // tie-rich fixtures: narrow value ranges so x-ties, y-ties and
  // joint ties all occur; two groups plus a singleton and a pair
  private val fixture: Gen[List[(String, Long, Long, Long)]] = for {
    n1 <- Gen.choose(1, 45); n2 <- Gen.choose(1, 45)
    xs1 <- Gen.listOfN(n1, Gen.choose(-4L, 4L))
    ys1 <- Gen.listOfN(n1, Gen.choose(-4L, 4L))
    xs2 <- Gen.listOfN(n2, Gen.choose(-30L, 30L))
    ys2 <- Gen.listOfN(n2, Gen.choose(-30L, 30L))
  } yield (xs1.zip(ys1).zipWithIndex.map { case ((x, y), i) =>
      ("a", i.toLong, x, y) } ++
    xs2.zip(ys2).zipWithIndex.map { case ((x, y), i) =>
      ("b", i.toLong, x, y) } ++
    List(("one", 0L, 7L, 7L), ("two", 0L, 1L, 2L), ("two", 1L, 2L, 1L)))

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap

  test("kendallTauLarge == kendallTauB bit-for-bit on tie-rich " +
      "fixtures, across degenerate and large bucket counts") {
    samples(fixture, 6).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("g", "i", "x", "y")
      val want = rowsOf(
        Ops.kendallTauB(df, "g", "i", "x", "y", maxN = 4096))
      for (b <- Seq(2, 3, 7, 65536)) {
        val got = rowsOf(
          Ops.kendallTauLarge(df, "g", "i", "x", "y", buckets = b))
        assert(got == want, s"case $i buckets=$b:\n got $got\nwant $want")
      }
    }
  }

  test("kendallTauLarge == plain-Scala brute force (C, D, ties, tau)") {
    samples(fixture, 4).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("g", "i", "x", "y")
      val got = rowsOf(Ops.kendallTauLarge(df, "g", "i", "x", "y"))
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val xy = rs.map(r => (r._3, r._4))
        val pairs = for (a <- xy.indices; b2 <- a + 1 until xy.length)
          yield (xy(a), xy(b2))
        val c = pairs.count { case ((x1, y1), (x2, y2)) =>
          (x1 < x2 && y1 < y2) || (x1 > x2 && y1 > y2) }.toLong
        val d = pairs.count { case ((x1, y1), (x2, y2)) =>
          (x1 < x2 && y1 > y2) || (x1 > x2 && y1 < y2) }.toLong
        val t1 = pairs.count { case ((x1, _), (x2, _)) => x1 == x2 }.toLong
        val t2 = pairs.count { case ((_, y1), (_, y2)) => y1 == y2 }.toLong
        val n0 = pairs.length.toLong
        val tau = if (n0 - t1 <= 0 || n0 - t2 <= 0) null
          else java.lang.Long.valueOf(math.floor(1000000.0 * (c - d) /
            math.sqrt(((n0 - t1) * (n0 - t2)).toDouble)).toLong)
        assert(got(g) == Seq(xy.length.toLong, n0, c, d, tau),
          s"case $i group $g: got ${got(g)}")
      }
    }
  }

  test("mannKendallLarge == mannKendallTrend bit-for-bit on tie-rich " +
      "series, across bucket counts") {
    val gen = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-5L, 5L)))
    samples(gen, 6).zipWithIndex.foreach { case (vs, i) =>
      val df = (vs.zipWithIndex.map { case (v, t) =>
          ("s", t.toLong, 0L, v) } ++
        List(("one", 0L, 0L, 3L), ("flat", 0L, 0L, 2L),
          ("flat", 1L, 0L, 2L), ("flat", 2L, 0L, 2L)))
        .toDF("g", "t", "e", "v")
      val want = rowsOf(
        Ops.mannKendallTrend(df, "g", "t", "e", "v", maxN = 4096))
      for (b <- Seq(2, 5, 65536)) {
        val got = rowsOf(
          Ops.mannKendallLarge(df, "g", "t", "e", "v", buckets = b))
        assert(got == want, s"case $i buckets=$b:\n got $got\nwant $want")
      }
    }
  }

  test("theilSenLarge == theilSen bit-for-bit on tie-rich fixtures " +
      "(verticals, negatives, duplicate points), across bucket " +
      "counts") {
    val gen = for {
      n <- Gen.choose(1, 40)
      xs <- Gen.listOfN(n, Gen.choose(-6L, 6L))
      ys <- Gen.listOfN(n, Gen.choose(-9L, 9L))
    } yield xs.zip(ys)
    samples(gen, 3).zipWithIndex.foreach { case (pts, i) =>
      val df = (pts.map { case (x, y) => ("a", x, y) } ++
        List(("vert", 3L, 1L), ("vert", 3L, 5L), ("one", 0L, 0L),
          ("neg", 0L, 10L), ("neg", 1L, 3L), ("neg", 2L, -4L)))
        .toDF("g", "x", "y")
      val want = rowsOf(Ops.theilSen(df, "g", "x", "y", maxN = 4096))
      // a degenerate bucket count only on the first case — each
      // binary-search round is a full Spark job, so the law stays
      // strong but the suite stays fast
      for (b <- if (i == 0) Seq(1, 3, 65536) else Seq(1)) {
        val got = rowsOf(Ops.theilSenLarge(df, "g", "x", "y",
          buckets = b))
        assert(got == want, s"case $i buckets=$b:\n got $got\nwant $want")
      }
    }
  }

  test("theilSenLarge: span contract refuses loudly") {
    val wide = intercept[Exception] {
      Ops.theilSenLarge(
        Seq(("a", 0L, 0L), ("a", 4000000L, 4000000L))
          .toDF("g", "x", "y"), "g", "x", "y").collect()
    }
    assert(rootCause(wide).getMessage.contains("9.2e12"),
      s"got ${rootCause(wide).getMessage}")
  }

  test("theilSenLarge: n x fanout memory contract refuses loudly at " +
      "the documented 1e6 x 15 point (default maxRoundRows), and the " +
      "boundary is exact under an explicit bound") {
    // the documented OOM point: 2^20 rows x fanout 15 > 2^23 — must
    // be a NAMED refusal before the first search round, not an
    // executor OOM (spanY = 0 keeps the span contract trivially met
    // and the would-be search cheap if the check ever regressed)
    val big = spark.range(1L << 20)
      .select(lit("g").as("g"), col("id").as("x"), lit(0L).as("y"))
    val oom = intercept[Exception] {
      Ops.theilSenLarge(big, "g", "x", "y").collect()
    }
    assert(rootCause(oom).getMessage.contains("maxRoundRows"),
      s"got ${rootCause(oom).getMessage}")
    assert(rootCause(oom).getMessage.contains("fanout"),
      s"got ${rootCause(oom).getMessage}")
    // exact boundary: n=100 x fanout=15 = 1500 passes at the bound,
    // refuses one below it
    val small = spark.range(100L)
      .select(lit("g").as("g"), col("id").as("x"),
        (col("id") * 2L).as("y"))
    assert(Ops.theilSenLarge(small, "g", "x", "y",
        maxRoundRows = 1500L).collect()
      .head.getAs[Long]("slope_ppm") == 2000000L)
    val edge = intercept[Exception] {
      Ops.theilSenLarge(small, "g", "x", "y",
        maxRoundRows = 1499L).collect()
    }
    assert(rootCause(edge).getMessage.contains("maxRoundRows=1499"),
      s"got ${rootCause(edge).getMessage}")
  }

  test("theilSenLarge: non-string group keys whose JVM toString " +
      "differs from Catalyst's cast (timestamp) still match — the " +
      "group string is computed once, in Spark") {
    val df = Seq(
      ("2024-03-01 10:00:00", 0L, 0L), ("2024-03-01 10:00:00", 1L, 3L),
      ("2024-03-01 10:00:00", 2L, 5L),
      ("2024-07-09 23:59:59", 0L, 10L), ("2024-07-09 23:59:59", 1L, 7L))
      .toDF("g0", "x", "y")
      .select(col("g0").cast("timestamp").as("g"), col("x"), col("y"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => String.valueOf(r.get(0)) -> r.toSeq.drop(1))
        .toMap
    val want = rows(Ops.theilSen(df, "g", "x", "y"))
    val got = rows(Ops.theilSenLarge(df, "g", "x", "y"))
    assert(got == want, s"got $got\nwant $want")
    assert(got.size == 2 && got.keySet.forall(_.contains("2024")),
      s"timestamp groups dropped: $got")
  }

  test("theilSenLarge: candidate spacing survives interval widths " +
      "past int64x15 (spanY=1e12, where (hi-lo)*i wrapped before " +
      "the BigInt fix)") {
    // spanX=1, spanY=1e12: span contract holds (1e12 < 9.2e12) but
    // the initial interval is 2e18 wide — (hi-lo)*63 wraps int64, so
    // long spacing either hangs or converges on garbage; BigInt
    // spacing must land on the exact slope 1e12 (1e18 ppm)
    val df = Seq(("w", 0L, 0L), ("w", 1L, 1000000000000L))
      .toDF("g", "x", "y")
    val r = Ops.theilSenLarge(df, "g", "x", "y", fanout = 63,
      buckets = 1).collect().head
    assert(r.getAs[Long]("slope_ppm") == 1000000000000000000L,
      s"got ${r.getAs[Long]("slope_ppm")}")
  }

  test("jonckheereTerpstra == plain-Scala brute force (2J, C, " +
      "tie-corrected z) on tie-rich random fixtures") {
    val gen = for {
      n <- Gen.choose(3, 50)
      gs <- Gen.listOfN(n, Gen.choose(0L, 3L))
      vs <- Gen.listOfN(n, Gen.choose(-4L, 4L))
    } yield gs.zip(vs)
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.map { case (g, v) => ("e", g, v) }
        .toDF("e", "g", "v")
      val r = Ops.jonckheereTerpstra(df, "e", "g", "v").collect()(0)
      val n = rows.length
      val pairs = for (a <- rows.indices; b <- a + 1 until n
        if rows(a)._1 != rows(b)._1) yield
          if (rows(a)._1 < rows(b)._1) (rows(a)._2, rows(b)._2)
          else (rows(b)._2, rows(a)._2)
      val jt2 = pairs.map { case (lo, hi) =>
        if (lo < hi) 2L else if (lo == hi) 1L else 0L }.sum
      val cc = pairs.length.toLong
      assert(r.getAs[Long]("jt2") == jt2 &&
        r.getAs[Long]("e2") == cc, s"case $i: $r vs ($jt2, $cc)")
      def f3(sizes: Seq[Long]) = (
        sizes.map(c => c * (c - 1) / 2).sum,
        sizes.map(c => c * (c - 1) * (2 * c + 5)).sum,
        sizes.map(c => c * (c - 1) * (c - 2)).sum)
      val (a2, a25, a3) = f3(rows.groupBy(_._1).values
        .map(_.length.toLong).toSeq)
      val (b2, b25, b3) = f3(rows.groupBy(_._2).values
        .map(_.length.toLong).toSeq)
      val nl = n.toLong
      val varD = (nl * (nl - 1) * (2 * nl + 5) - a25 - b25).toDouble / 72.0 +
        a3.toDouble * b3.toDouble /
          (36.0 * (nl * (nl - 1) * (nl - 2)).toDouble) +
        (2.0 * a2.toDouble) * (2.0 * b2.toDouble) /
          (8.0 * (nl * (nl - 1)).toDouble)
      val num2 = jt2 - cc
      val wantZ: Option[Long] =
        if (n <= 2 || varD <= 0.0) None
        else if (num2 == 0L) Some(0L)
        else Some(math.floor(
          ((num2 - num2.signum) * 500L).toDouble / math.sqrt(varD))
          .toLong)
      val gotZ = if (r.isNullAt(5)) None else Some(r.getLong(5))
      assert(gotZ == wantZ, s"case $i: z $gotZ vs $wantZ (var $varD)")
    }
    // one-arm and all-tied degenerate: null z
    val one = Ops.jonckheereTerpstra(
      Seq(("e", 1L, 5L), ("e", 1L, 7L)).toDF("e", "g", "v"),
      "e", "g", "v").collect()(0)
    assert(one.isNullAt(5))
    val tied = Ops.jonckheereTerpstra(
      Seq(("e", 0L, 5L), ("e", 1L, 5L), ("e", 2L, 5L), ("e", 0L, 5L))
        .toDF("e", "g", "v"), "e", "g", "v").collect()(0)
    assert(tied.isNullAt(5), "every value tied: var 0, z null")
    val nul = intercept[Exception] {
      Ops.jonckheereTerpstra(
        Seq(("e", Option.empty[Long], 1L)).toDF("e", "g", "v"),
        "e", "g", "v").collect()
    }
    assert(rootCause(nul).getMessage.contains("arm"))
  }

  test("refusals: duplicate id, duplicate (ts,tie), maxN, null value") {
    val dup = intercept[Exception] {
      Ops.kendallTauLarge(Seq(("a", 1L, 1L, 1L), ("a", 1L, 2L, 2L))
        .toDF("g", "i", "x", "y"), "g", "i", "x", "y").collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate id"))
    val big = intercept[Exception] {
      Ops.kendallTauLarge((1L to 10L).map(i => ("a", i, i, i))
        .toDF("g", "i", "x", "y"), "g", "i", "x", "y", maxN = 8)
        .collect()
    }
    assert(rootCause(big).getMessage.contains("maxN=8"))
    val dpos = intercept[Exception] {
      Ops.mannKendallLarge(Seq(("a", 1L, 0L, 5L), ("a", 1L, 0L, 6L))
        .toDF("g", "t", "e", "v"), "g", "t", "e", "v").collect()
    }
    assert(rootCause(dpos).getMessage.contains("duplicate position"))
    val nul = intercept[Exception] {
      Ops.mannKendallLarge(Seq(("a", 1L, 0L, Option.empty[Long]))
        .toDF("g", "t", "e", "v"), "g", "t", "e", "v").collect()
    }
    assert(rootCause(nul).getMessage.contains("mannKendallLarge value"))
    intercept[IllegalArgumentException] {
      Ops.mannKendallLarge(Seq(("a", 1L, 0L, 1L))
        .toDF("g", "t", "e", "v"), "g", "t", "e", "v",
        maxN = 2000000L)
    }
  }
}
