package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.operators.{Drift, EvalMetrics, Experiment, Ops}

/** Randomized cross-checks for the round-17 operators: each law runs
  * the distributed operator on a small random dataset and compares it
  * against an independent plain-Scala reference implementation of the
  * SAME documented lattice (sequential recurrences, brute-force pair
  * enumerations, sorted-rank walks). This is the strongest evidence a
  * window/fold factoring is correct: the references make none of the
  * operator's distribution choices (no windows, no prefix identities,
  * no rank tricks).
  */
class NewOpsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val p = org.scalacheck.Gen.Parameters.default.withSize(50)
    (0 until n).flatMap(i => g.apply(p, org.scalacheck.rng.Seed(1700L + i)))
  }

  private val series: Gen[List[Long]] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50L, 50L)))

  test("cusum == the sequential max(0, .) recurrence") {
    samples(series, 8).zipWithIndex.foreach { case (vs, i) =>
      val mu = 3L; val kappa = 1L
      val df = vs.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }
        .toDF("k", "ts", "v")
        .withColumn("tie", org.apache.spark.sql.functions.col("ts"))
      val got = Drift.cusum(df, "k", "ts", "tie", "v", mu, kappa)
        .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4))))
        .toMap
      var sp = 0L; var sn = 0L
      vs.zipWithIndex.foreach { case (v, t) =>
        sp = math.max(0L, sp + (v - mu - kappa))
        sn = math.max(0L, sn + (mu - v - kappa))
        assert(got(t.toLong) == ((sp, sn)),
          s"case $i t=$t: got ${got(t.toLong)}, want ($sp, $sn)")
      }
    }
  }

  test("ksDrift == brute-force max |F0 - F1| over the pooled sample") {
    val gen = for {
      n0 <- Gen.choose(1, 30); n1 <- Gen.choose(1, 30)
      xs <- Gen.listOfN(n0, Gen.choose(0L, 15L))
      ys <- Gen.listOfN(n1, Gen.choose(0L, 15L))
    } yield (xs, ys)
    samples(gen, 8).zipWithIndex.foreach { case ((xs, ys), i) =>
      val df = (xs.map(("k", 0L, _)) ++ ys.map(("k", 1L, _)))
        .toDF("k", "g", "v")
      val r = Drift.ksDrift(df, "k", "g", "v").collect()(0)
      val pooled = (xs ++ ys).distinct.sorted
      val dNum = pooled.map { t =>
        val a0 = xs.count(_ <= t).toLong; val a1 = ys.count(_ <= t).toLong
        math.abs(a0 * ys.length - a1 * xs.length)
      }.max
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((xs.length.toLong, ys.length.toLong, dNum,
          1000000L * dNum / (xs.length.toLong * ys.length))),
        s"case $i")
    }
  }

  test("theilSen == brute-force lower median of pairwise slopes") {
    val gen = for {
      n <- Gen.choose(2, 24)
      pts <- Gen.listOfN(n, Gen.zip(Gen.choose(-20L, 20L),
        Gen.choose(-100L, 100L)))
    } yield pts.distinctBy(_._1) // unique x: the operator's pair domain
    samples(gen, 8).zipWithIndex.foreach { case (pts, i) =>
      val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
      val r = Ops.theilSen(df, "g", "x", "y", maxN = 64).collect()(0)
      val slopes = (for {
        (xi, yi) <- pts; (xj, yj) <- pts; if xi < xj
      } yield (1000000L * (yj - yi)) / (xj - xi)).sorted
      if (slopes.isEmpty) assert(r.isNullAt(3), s"case $i")
      else {
        val want = slopes((slopes.length + 1) / 2 - 1)
        assert(r.getLong(2) == slopes.length && r.getLong(3) == want,
          s"case $i: got (${r.getLong(2)}, ${r.getLong(3)}), " +
            s"want (${slopes.length}, $want)")
      }
    }
  }

  test("logRank == the sequential risk-set walk") {
    val gen = for {
      n <- Gen.choose(2, 40)
      subj <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 1L),
        Gen.choose(0L, 10L), Gen.choose(0L, 1L)))
    } yield subj
    samples(gen, 8).zipWithIndex.foreach { case (subj, i) =>
      val df = subj.map { case (g, d, e) => ("e", g, d, e) }
        .toDF("exp", "g", "dur", "ev")
      val rows = Experiment.logRank(df, "exp", "g", "dur", "ev")
        .collect()
      // reference: walk pooled event times descending-risk
      val times = subj.filter(_._3 == 1L).map(_._2).distinct.sorted
      var o1 = 0L; var e1 = 0L; var v = 0L
      times.foreach { t =>
        val n0 = subj.count(s => s._1 == 0L && s._2 >= t).toLong
        val n1 = subj.count(s => s._1 == 1L && s._2 >= t).toLong
        val d0 = subj.count(s => s._1 == 0L && s._2 == t && s._3 == 1L).toLong
        val d1 = subj.count(s => s._1 == 1L && s._2 == t && s._3 == 1L).toLong
        val n = n0 + n1; val d = d0 + d1
        o1 += d1
        e1 += (1000000L * (d * n1)) / n
        if (n > 1) v += math.floor((d * n1).toDouble * n0.toDouble
          * (n - d).toDouble
          / (n.toDouble * n.toDouble * (n - 1).toDouble) * 1000000).toLong
      }
      val chi = if (v == 0) None else Some(math.floor(
        (1000000L * o1 - e1).toDouble * (1000000L * o1 - e1).toDouble
          / v.toDouble).toLong)
      rows.foreach { r =>
        assert(r.getLong(4) == e1 && r.getLong(5) == v, s"case $i")
        assert((if (r.isNullAt(6)) None else Some(r.getLong(6))) == chi,
          s"case $i")
        val grp = r.getLong(1)
        assert(r.getLong(2) == subj.count(_._1 == grp).toLong)
        assert(r.getLong(3) ==
          subj.count(s => s._1 == grp && s._3 == 1L).toLong)
      }
    }
  }

  test("quantileDrift == sorted-rank lower quantiles") {
    val gen = for {
      n0 <- Gen.choose(0, 25); n1 <- Gen.choose(0, 25)
      if n0 + n1 > 0
      xs <- Gen.listOfN(n0, Gen.choose(-30L, 30L))
      ys <- Gen.listOfN(n1, Gen.choose(-30L, 30L))
    } yield (xs, ys)
    samples(gen, 8).zipWithIndex.foreach { case ((xs, ys), i) =>
      val df = (xs.map(("k", 0L, _)) ++ ys.map(("k", 1L, _)))
        .toDF("k", "p", "v")
      val pcts = Seq(10, 50, 90)
      val got = Drift.quantileDrift(df, "k", "p", "v", pcts).collect()
        .map(r => r.getLong(1) -> ((
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
      def q(vs: List[Long], pct: Int): Option[Long] =
        if (vs.isEmpty) None
        else Some(vs.sorted.apply(
          (math.max(1L, (pct.toLong * vs.length + 99) / 100) - 1).toInt))
      pcts.foreach { pct =>
        assert(got(pct.toLong) == ((q(xs, pct), q(ys, pct))),
          s"case $i pct=$pct: got ${got(pct.toLong)}, " +
            s"want (${q(xs, pct)}, ${q(ys, pct)})")
      }
    }
  }

  test("ndcgAtK == the direct DCG/IDCG fold") {
    val gen = for {
      n <- Gen.choose(1, 20)
      rels <- Gen.listOfN(n, Gen.choose(0L, 4L))
    } yield rels
    samples(gen, 8).zipWithIndex.foreach { case (rels, i) =>
      val k = 5
      val df = rels.zipWithIndex.map { case (rel, r) =>
        ("q", (r + 1).toLong, rel) }.toDF("q", "r", "rel")
      val row = EvalMetrics.ndcgAtK(df, "q", "r", "rel", k).collect()(0)
      def term(rel: Long, pos: Long): Long = math.floor(
        rel.toDouble * 1000000.0 * math.log(2.0)
          / math.log((pos + 1).toDouble)).toLong
      val dcg = rels.zipWithIndex.collect {
        case (rel, r) if r + 1 <= k => term(rel, r + 1L) }.sum
      val idcg = rels.sorted.reverse.zipWithIndex.collect {
        case (rel, p) if p + 1 <= k => term(rel, p + 1L) }.sum
      assert(row.getLong(2) == dcg && row.getLong(3) == idcg, s"case $i")
      if (idcg == 0) assert(row.isNullAt(4), s"case $i")
      else assert(row.getLong(4) == 1000000L * dcg / idcg, s"case $i")
    }
  }

  test("psi == the direct smoothed-share fold") {
    val gen = for {
      nb <- Gen.choose(1, 6)
      cells <- Gen.listOfN(nb, Gen.zip(Gen.choose(0, 20),
        Gen.choose(0, 20)))
      if cells.exists(_._1 > 0) && cells.exists(_._2 > 0)
    } yield cells
    samples(gen, 8).zipWithIndex.foreach { case (cells, i) =>
      val rows = cells.zipWithIndex.flatMap { case ((a, b), bkt) =>
        List.fill(a)(("k", bkt.toLong, 0L)) ++
          List.fill(b)(("k", bkt.toLong, 1L))
      }
      // buckets with zero rows on BOTH sides never appear — drop them
      // from the reference domain too
      val present = cells.zipWithIndex.filter { case ((a, b), _) =>
        a + b > 0 }
      val bCnt = present.length.toLong
      val c0 = present.map(_._1._1.toLong).sum
      val c1 = present.map(_._1._2.toLong).sum
      val want = present.map { case ((a, b), _) =>
        val p0 = (a + 1).toDouble / (c0 + bCnt).toDouble
        val p1 = (b + 1).toDouble / (c1 + bCnt).toDouble
        math.floor((p1 - p0) * math.log(p1 / p0) * 1000000).toLong
      }.sum
      val got = Drift.psi(rows.toDF("k", "b", "p"), "k", "b", "p")
        .collect()
      assert(got.nonEmpty, s"case $i: no rows")
      got.foreach { r =>
        assert(!r.isNullAt(5) && r.getLong(5) == want,
          s"case $i: got ${if (r.isNullAt(5)) "null" else r.getLong(5)}" +
            s", want $want")
      }
    }
  }

  test("embeddingDrift == BigInt dimension sums + one sqrt") {
    val gen = for {
      n0 <- Gen.choose(1, 10); n1 <- Gen.choose(1, 10)
      v0 <- Gen.listOfN(n0, Gen.listOfN(3,
        Gen.choose(-2.0, 2.0).map(_.toFloat)))
      v1 <- Gen.listOfN(n1, Gen.listOfN(3,
        Gen.choose(-2.0, 2.0).map(_.toFloat)))
    } yield (v0, v1)
    samples(gen, 8).zipWithIndex.foreach { case ((v0, v1), i) =>
      val df = (v0.map(("k", 0L, _)) ++ v1.map(("k", 1L, _)))
        .toDF("k", "p", "vec")
      val r = Drift.embeddingDrift(df, "k", "p", "vec", dim = 3)
        .collect()(0)
      def sums(vs: List[List[Float]]): Seq[BigInt] =
        (0 until 3).map(d => vs.map(v =>
          BigInt(math.floor(v(d).toDouble * 1000).toLong)).sum)
      val s0 = sums(v0); val s1 = sums(v1)
      val dot = (s0 zip s1).map { case (a, b) => a * b }.sum
      val n0sq = s0.map(a => a * a).sum
      val n1sq = s1.map(a => a * a).sum
      if (n0sq == 0 || n1sq == 0) assert(r.isNullAt(3), s"case $i")
      else {
        val want = math.floor(dot.toDouble
          / math.sqrt(n0sq.toDouble * n1sq.toDouble) * 1000000).toLong
        assert(!r.isNullAt(3) && r.getLong(3) == want,
          s"case $i: got ${if (r.isNullAt(3)) "null" else r.getLong(3)}" +
            s", want $want")
      }
    }
  }
}
