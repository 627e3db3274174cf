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

  test("spearmanRho == sequential midranks + BigInt Pearson") {
    val gen = Gen.choose(2, 35).flatMap(n => Gen.zip(
      Gen.listOfN(n, Gen.choose(-8L, 8L)),
      Gen.listOfN(n, Gen.choose(-8L, 8L))))
    samples(gen, 8).zipWithIndex.foreach { case ((xs, ys), i) =>
      val df = xs.zip(ys).map { case (x, y) => ("k", x, y) }
        .toDF("k", "x", "y")
      val r = Ops.spearmanRho(df, "k", "x", "y").collect()(0)
      def ranks2(vs: List[Long]): List[BigInt] = vs.map { v =>
        BigInt(2 * (vs.count(_ < v) + 1) + vs.count(_ == v) - 1) }
      val rx = ranks2(xs); val ry = ranks2(ys)
      val n = BigInt(xs.length)
      val sx = rx.sum; val sy = ry.sum
      val sxx = rx.map(a => a * a).sum; val syy = ry.map(a => a * a).sum
      val sxy = (rx zip ry).map { case (a, b) => a * b }.sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      if (xs.length < 2 || dx <= 0 || dy <= 0)
        assert(r.isNullAt(2), s"case $i: want null")
      else {
        val want = math.floor(1000000.0 * num.toDouble
          / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble))).toLong
        assert(!r.isNullAt(2) && r.getLong(2) == want,
          s"case $i: got ${if (r.isNullAt(2)) "null" else r.getLong(2)}" +
            s", want $want")
      }
    }
  }

  test("kendallTauB == brute-force pair enumeration") {
    val gen = Gen.choose(2, 25).flatMap(n => Gen.zip(
      Gen.listOfN(n, Gen.choose(-4L, 4L)),
      Gen.listOfN(n, Gen.choose(-4L, 4L))))
    samples(gen, 8).zipWithIndex.foreach { case ((xs, ys), i) =>
      val df = xs.zip(ys).zipWithIndex.map { case ((x, y), j) =>
        ("k", j.toLong, x, y) }.toDF("k", "i", "x", "y")
      val r = Ops.kendallTauB(df, "k", "i", "x", "y").collect()(0)
      var c = 0L; var d = 0L; var t1 = 0L; var t2 = 0L
      for (a <- xs.indices; b <- xs.indices if a < b) {
        val s = (xs(b) - xs(a)).sign * (ys(b) - ys(a)).sign
        if (s > 0) c += 1 else if (s < 0) d += 1
        if (xs(a) == xs(b)) t1 += 1
        if (ys(a) == ys(b)) t2 += 1
      }
      val np = xs.length.toLong * (xs.length - 1) / 2
      assert(r.getAs[Long]("concordant") == c &&
        r.getAs[Long]("discordant") == d &&
        r.getAs[Long]("n_pairs") == np, s"case $i counts")
      if (np - t1 <= 0 || np - t2 <= 0)
        assert(r.isNullAt(5), s"case $i: want null")
      else {
        val want = math.floor(1000000.0 * (c - d).toDouble
          / math.sqrt(((np - t1) * (np - t2)).toDouble)).toLong
        assert(r.getAs[Long]("tau_b_ppm") == want, s"case $i tau")
      }
    }
  }

  test("averagePrecision == the sequential precision@k walk") {
    val gen = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 1L)))
    samples(gen, 8).zipWithIndex.foreach { case (rels, i) =>
      val df = rels.zipWithIndex.map { case (rel, j) =>
        ("q", j.toLong + 1, rel) }.toDF("q", "rank", "rel")
      val r = EvalMetrics.averagePrecision(df, "q", "rank", "rel")
        .collect()(0)
      val p = rels.sum
      if (p == 0) assert(r.isNullAt(3), s"case $i: want null")
      else {
        var cnt = 0L; var terms = 0L
        rels.zipWithIndex.foreach { case (rel, j) =>
          cnt += rel
          if (rel == 1L) terms += 1000000L * cnt / (j + 1) }
        assert(r.getAs[Long]("ap_ppm") == terms / p, s"case $i")
      }
    }
  }

  test("autocorr == the sequential fraction-cleared estimator") {
    val gen = Gen.choose(2, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-20L, 20L)))
    samples(gen, 8).zipWithIndex.foreach { case (vs, i) =>
      val k = 1 + i % 3
      val df = vs.zipWithIndex.map { case (v, t) => ("a", t.toLong, v) }
        .toDF("g", "t", "v")
      val r = Ops.autocorr(df, "g", "t", "t", "v", k).collect()(0)
      val n = BigInt(vs.length); val s = BigInt(vs.sum)
      val den = vs.map(v => (n * v - s) * (n * v - s)).sum
      val num = (0 until vs.length - k)
        .map(t => (n * vs(t) - s) * (n * vs(t + k) - s)).sum
      if (vs.length <= k || den <= 0)
        assert(r.isNullAt(3), s"case $i: want null")
      else {
        // BigInt / already truncates toward zero, matching div and //
        val want = (BigInt(1000000) * num / den).toLong
        assert(r.getAs[Long]("acf_ppm") == want,
          s"case $i k=$k: got ${r.get(3)}, want $want")
      }
    }
  }

  test("krippendorffAlpha == the closed-form coincidence fold") {
    val gen = for {
      nu <- Gen.choose(1, 12)
      rs <- Gen.listOfN(nu, Gen.choose(1, 5).flatMap(m =>
        Gen.listOfN(m, Gen.choose(0L, 2L))))
    } yield rs
    samples(gen, 8).zipWithIndex.foreach { case (unitRatings, i) =>
      val rows = unitRatings.zipWithIndex.flatMap { case (vs, u) =>
        vs.map(v => ("g", u.toLong, v.toString)) }
      val r = EvalMetrics.krippendorffAlpha(
        rows.toDF("g", "unit", "v"), "g", "unit", "v").collect()(0)
      val paired = unitRatings.filter(_.length >= 2)
      val doMicro = paired.map { vs =>
        val m = vs.length.toLong
        val dis = vs.distinct.map(c =>
          vs.count(_ == c).toLong * (m - vs.count(_ == c))).sum
        BigInt(1000000L * dis / (m - 1)) }.sum
      val all = paired.flatten
      val bigN = BigInt(all.length)
      val de = all.distinct.map(c =>
        BigInt(all.count(_ == c)) * (bigN - all.count(_ == c))).sum
      if (bigN < 2 || de <= 0) assert(r.isNullAt(5), s"case $i")
      else {
        val want = (BigInt(1000000) - (bigN - 1) * doMicro / de).toLong
        assert(r.getAs[Long]("alpha_ppm") == want,
          s"case $i: got ${r.get(5)}, want $want")
      }
    }
  }

  test("tClosenessReport == the BigInt prefix EMD per class") {
    val gen = Gen.choose(4, 30).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.oneOf("A", "B", "C"), Gen.choose(0L, 5L))))
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("qi", "s")
      val got = graft.operators.Anonymize.tClosenessReport(
        df, Seq("qi"), "s", tPpm = 500000L).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("emd_ppm")).toMap
      val dom = rows.map(_._2).distinct.sorted
      val bigN = BigInt(rows.length); val m = dom.length
      rows.groupBy(_._1).foreach { case (cls, rs) =>
        val n = BigInt(rs.length)
        var pre = BigInt(0); var acc = BigInt(0)
        dom.foreach { v =>
          val c = BigInt(rs.count(_._2 == v))
          val g = BigInt(rows.count(_._2 == v))
          pre += c * bigN - g * n
          acc += pre.abs }
        val want = if (m == 1) 0L
          else (BigInt(1000000) * acc / (BigInt(m - 1) * n * bigN))
            .toLong
        assert(got(cls) == want,
          s"case $i class $cls: got ${got(cls)}, want $want")
      }
    }
  }

  test("jsDivergence == the direct two-sided term fold") {
    val gen = for {
      n0 <- Gen.choose(0, 20); n1 <- Gen.choose(0, 20)
      b0 <- Gen.listOfN(n0, Gen.choose(0L, 4L))
      b1 <- Gen.listOfN(n1, Gen.choose(0L, 4L))
    } yield (b0, b1)
    samples(gen, 8).zipWithIndex.foreach { case ((b0, b1), i) =>
      if (b0.nonEmpty || b1.nonEmpty) {
        val df = (b0.map(("k", _, 0L)) ++ b1.map(("k", _, 1L)))
          .toDF("k", "b", "p")
        val rows = Drift.jsDivergence(df, "k", "b", "p").collect()
        if (b0.isEmpty || b1.isEmpty)
          assert(rows.forall(_.isNullAt(5)), s"case $i: want null")
        else {
          val c0 = b0.length.toDouble; val c1 = b1.length.toDouble
          val want = (b0 ++ b1).distinct.map { b =>
            val p = b0.count(_ == b) / c0; val q = b1.count(_ == b) / c1
            val s0 = if (b0.count(_ == b) == 0) 0.0
              else p * math.log(2.0 * p / (p + q))
            val s1 = if (b1.count(_ == b) == 0) 0.0
              else q * math.log(2.0 * q / (p + q))
            math.floor((s0 + s1) * 500000.0).toLong }.sum
          assert(rows.forall(_.getAs[Long]("jsd_micro") == want),
            s"case $i: want $want")
        }
      }
    }
  }

  test("rollingMedian == the sliding sorted-buffer walk") {
    val gen = for {
      n <- Gen.choose(2, 40); w <- Gen.choose(2, 7)
      vs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield (vs, w)
    samples(gen, 8).zipWithIndex.foreach { case ((vs, w), i) =>
      val df = vs.zipWithIndex.map { case (v, t) =>
        ("k", t.toLong, t.toLong, v) }.toDF("k", "t", "e", "v")
      val got = Ops.rollingMedian(df, "k", "t", "e", "v", w)
        .collect().map(r => r.getLong(1) -> r.getAs[Long]("med"))
        .toMap
      val want = vs.indices.filter(_ >= w - 1).map { t =>
        t.toLong -> vs.slice(t - w + 1, t + 1).sorted
          .apply((w + 1) / 2 - 1) }.toMap
      assert(got == want, s"case $i w=$w")
    }
  }

  test("madPerGroup == the sorted lower-median reference") {
    samples(series, 8).zipWithIndex.foreach { case (vs, i) =>
      val r = Ops.madPerGroup(vs.map(("g", _)).toDF("g", "v"),
        "g", "v").collect()(0)
      def lm(xs: Seq[Long]) = xs.sorted.apply((xs.length + 1) / 2 - 1)
      val med = lm(vs)
      assert(r.getAs[Long]("median") == med &&
        r.getAs[Long]("mad") == lm(vs.map(v => math.abs(v - med))),
        s"case $i")
    }
  }

  test("stratifiedAte == the BigInt stratified fold") {
    val gen = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, for {
        st <- Gen.choose(0L, 3L); g <- Gen.choose(0L, 1L)
        v <- Gen.choose(-30L, 30L)
      } yield (st, g, v))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val r = Experiment.stratifiedAte(
        rows.map { case (st, g, v) => ("e", st, g, v) }
          .toDF("e", "s", "g", "v"), "e", "s", "g", "v").collect()(0)
      val cells = rows.groupBy(_._1).map { case (_, rs) =>
        val c0 = rs.filter(_._2 == 0L); val c1 = rs.filter(_._2 == 1L)
        (c0.size, c1.size, c0.map(_._3).sum, c1.map(_._3).sum)
      }.toSeq
      val ok = cells.filter(c => c._1 > 0 && c._2 > 0)
      if (ok.isEmpty) assert(r.isNullAt(5), s"case $i: want null ate")
      else {
        val diffs = ok.map { case (n0, n1, s0, s1) =>
          val d = (BigInt(1000000) * (BigInt(s1) * n0
            - BigInt(s0) * n1)) / (BigInt(n1) * n0)
          (BigInt(n0 + n1), d) }
        val nTot = diffs.map(_._1).sum
        val ate = (diffs.map { case (ns, d) => ns * d }.sum / nTot)
        assert(BigInt(r.getAs[Long]("ate_micro")) == ate &&
          r.getAs[Long]("n_excluded_strata") ==
            (cells.size - ok.size).toLong, s"case $i")
      }
    }
  }

  test("holmBonferroni == the sequential step-down walk") {
    val gen = for {
      n <- Gen.choose(1, 30)
      ps <- Gen.listOfN(n, Gen.choose(0L, 1000000L))
    } yield ps
    samples(gen, 8).zipWithIndex.foreach { case (ps, i) =>
      val alpha = 50000L
      val df = ps.zipWithIndex.map { case (p, id) =>
        ("f", id.toLong, p) }.toDF("fam", "id", "p")
      val got = Experiment.holmBonferroni(df, "fam", "id", "p", alpha)
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("adj_ppm"), r.getAs[Boolean]("reject"))))
        .toMap
      val m = ps.length.toLong
      var run = 0L
      ps.zipWithIndex.sortBy { case (p, id) => (p, id.toLong) }
        .zipWithIndex.foreach { case ((p, id), k0) =>
          val k = k0 + 1L
          run = math.min(1000000L, math.max(run, (m - k + 1) * p))
          assert(got(id.toLong) == ((run, run <= alpha)),
            s"case $i id=$id")
        }
    }
  }

  test("mannKendallTrend == brute-force pairs + the same float " +
      "chain") {
    samples(series, 8).zipWithIndex.foreach { case (vs, i) =>
      val df = vs.zipWithIndex.map { case (v, t) =>
        ("g", t.toLong, t.toLong, v) }.toDF("g", "t", "e", "v")
      val r = Ops.mannKendallTrend(df, "g", "t", "e", "v")
        .collect()(0)
      val s = (for (a <- vs.indices; b <- vs.indices if a < b)
        yield java.lang.Long.signum(vs(b) - vs(a)).toLong).sum
      val n = vs.length.toLong
      val tcorr = vs.groupBy(identity).values
        .map(g => g.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val vn = n * (n - 1) * (2 * n + 5) - tcorr
      assert(r.getAs[Long]("s") == s &&
        r.getAs[Long]("var_num18") == vn, s"case $i")
      if (vn <= 0) assert(r.isNullAt(4), s"case $i: want null z")
      else if (s == 0) assert(r.getAs[Long]("z_milli") == 0L)
      else {
        val z = math.floor(((s - java.lang.Long.signum(s)) * 1000L)
          .toDouble / math.sqrt(vn.toDouble / 18.0)).toLong
        assert(r.getAs[Long]("z_milli") == z, s"case $i")
      }
    }
  }

  test("seasonalNaiveBacktest == the sequential lag walk") {
    val gen = for {
      n <- Gen.choose(2, 40); m <- Gen.choose(1, 5)
      vs <- Gen.listOfN(n, Gen.choose(-40L, 40L))
    } yield (vs, m)
    samples(gen, 8).zipWithIndex.foreach { case ((vs, m), i) =>
      val df = vs.zipWithIndex.map { case (v, t) =>
        ("k", t.toLong, t.toLong, v) }.toDF("k", "t", "e", "v")
      val rows = EvalMetrics.seasonalNaiveBacktest(df, "k", "t", "e",
        "v", m).collect()
      val ev = (m until vs.length).map { t =>
        val em = math.abs(vs(t) - vs(t - m))
        val e1 = math.abs(vs(t) - vs(t - 1))
        val den = math.abs(vs(t)) + math.abs(vs(t - m))
        (em, e1, if (den == 0) 0L else (2000000L * em) / den)
      }
      if (ev.isEmpty) assert(rows.isEmpty, s"case $i: want absent")
      else {
        val r = rows(0)
        val ne = ev.length.toLong
        assert(r.getAs[Long]("mae_micro") ==
          (BigInt(1000000) * ev.map(_._1).sum / ne).toLong &&
          r.getAs[Long]("smape_ppm") == ev.map(_._3).sum / ne,
          s"case $i")
        val se1 = ev.map(_._2).sum
        if (se1 <= 0) assert(r.isNullAt(4))
        else assert(BigInt(r.getAs[Long]("mase_ppm")) ==
          BigInt(1000000) * ev.map(_._1).sum / se1, s"case $i")
      }
    }
  }

  test("changepointAmoc == the brute-force BigInt gain scan") {
    val gen = for {
      n <- Gen.choose(2, 40)
      vs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield vs
    samples(gen, 8).zipWithIndex.foreach { case (vs, i) =>
      val minSeg = 2
      val df = vs.zipWithIndex.map { case (v, t) =>
        ("k", t.toLong + 1L, t.toLong, v) }.toDF("k", "t", "e", "v")
      val r = Drift.changepointAmoc(df, "k", "t", "e", "v", minSeg)
        .collect()(0)
      val n = vs.length
      val s = vs.map(BigInt(_)).sum
      val cands = (minSeg to n - minSeg).map { pos =>
        val sl = vs.take(pos).map(BigInt(_)).sum
        val num = BigInt(1000000) * (sl * sl * (n - pos) * n
          + (s - sl) * (s - sl) * pos * n
          - s * s * pos * (n - pos))
        val den = BigInt(pos) * (n - pos) * n
        (pos, num / den)
      }
      if (cands.isEmpty) assert(r.isNullAt(2), s"case $i: want null")
      else {
        val best = cands.maxBy { case (pos, g) => (g, -pos) }
        assert(r.getAs[Long]("n_left") == best._1.toLong &&
          BigInt(r.getAs[Long]("gain_micro")) == best._2,
          s"case $i: got (${r.getAs[Long]("n_left")}, " +
            s"${r.getAs[Long]("gain_micro")}), want $best")
      }
    }
  }

  test("markovRemovalEffect == the dense Scala value iteration") {
    val gen = for {
      nu <- Gen.choose(1, 12)
      users <- Gen.listOfN(nu, for {
        len <- Gen.choose(1, 6)
        chans <- Gen.listOfN(len, Gen.oneOf("A", "B", "C"))
        conv <- Gen.choose(0, len) // conversion inserted at position
        hasConv <- Gen.oneOf(true, false)
      } yield (chans, if (hasConv) Some(conv) else None))
    } yield users
    samples(gen, 8).zipWithIndex.foreach { case (users, i) =>
      // build the event log: per user, channels at ts 0..len-1 with
      // the conversion (if any) spliced in at its position
      val evs = users.zipWithIndex.flatMap { case ((chans, conv), u) =>
        val withConv = conv match {
          case Some(p) => chans.take(p) ++ Seq("buy") ++ chans.drop(p)
          case None => chans
        }
        withConv.zipWithIndex.map { case (c, t) =>
          (u.toLong, c, t.toLong, (u * 100 + t).toLong) }
      }
      val got = graft.operators.Funnel.markovRemovalEffect(
        evs.toDF("u", "et", "ts", "id"), "u", "et", "ts", "id", "buy")
        .collect().map(r => r.getString(0) ->
          ((r.getAs[Long]("p_full_ppm"),
            if (r.isNullAt(3)) null else r.getAs[Long]("re_ppm"))))
        .toMap
      // reference: transitions from pre-first-conv touches
      val trans = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      users.foreach { case (chans, conv) =>
        val touches = conv match {
          case Some(p) => chans.take(p)
          case None => chans
        }
        val absorb = if (conv.isDefined) "__conv__" else "__null__"
        if (touches.isEmpty) {
          if (conv.isDefined)
            trans(("__start__", "__conv__")) += 1L
        } else {
          trans(("__start__", touches.head)) += 1L
          touches.sliding(2).foreach {
            case Seq(a, b) => trans((a, b)) += 1L
            case _ => ()
          }
          trans((touches.last, absorb)) += 1L
        }
      }
      if (trans.nonEmpty) {
        val chans = trans.keys.flatMap(k => Seq(k._1, k._2))
          .filterNot(Set("__start__", "__conv__", "__null__"))
          .toSet
        def run(removed: String): Long = {
          val t2 = trans.toSeq
            .filter(_._1._1 != removed)
            .map { case ((a, b), nn) =>
              ((a, if (b == removed) "__null__" else b), nn) }
            .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
          val states = t2.keys.map(_._1).toSet
          var v = states.map(_ -> 0L).toMap
          for (_ <- 1 to 8) {
            v = states.map { st =>
              val outs = t2.filter(_._1._1 == st).toSeq
              val num = outs.map { case ((_, d), nn) =>
                nn * (d match {
                  case "__conv__" => 1000000L
                  case "__null__" => 0L
                  case c => v.getOrElse(c, 0L)
                }) }.sum
              st -> num / outs.map(_._2).sum
            }.toMap
          }
          v.getOrElse("__start__", 0L)
        }
        val pFull = run("__none__")
        chans.foreach { c =>
          val (gf, gre) = got(c)
          assert(gf == pFull, s"case $i ch=$c p_full")
          if (pFull <= 0) assert(gre == null, s"case $i ch=$c")
          else assert(gre == math.max(0L,
            1000000L - (1000000L * run(c)) / pFull),
            s"case $i ch=$c re")
        }
      }
    }
  }

  test("sprtBinary == the sequential llr walk with first crossing") {
    val gen = for {
      n <- Gen.choose(1, 60)
      cs <- Gen.listOfN(n, Gen.choose(0L, 1L))
    } yield cs
    samples(gen, 8).zipWithIndex.foreach { case (cs, i) =>
      val (p0, p1, a, bt) = (300L, 700L, 50L, 100L)
      val r = Experiment.sprtBinary(
        cs.zipWithIndex.map { case (c, t) =>
          ("e", t.toLong, t.toLong, c) }.toDF("e", "t", "i", "c"),
        "e", "t", "i", "c", p0, p1, a, bt).collect()(0)
      val l1 = math.log(p1.toDouble / p0.toDouble)
      val l0 = math.log((1000 - p1).toDouble / (1000 - p0).toDouble)
      val up = math.floor(1000000.0
        * math.log((1000 - bt).toDouble / a.toDouble)).toLong
      val lo = math.floor(1000000.0
        * math.log(bt.toDouble / (1000 - a).toDouble)).toLong
      var s = 0L; var cross: Option[(Int, Long)] = None
      cs.zipWithIndex.foreach { case (c, t) =>
        s += c
        val llr = math.floor(1000000.0
          * (s.toDouble * l1 + (t + 1 - s).toDouble * l0)).toLong
        if (cross.isEmpty && (llr >= up || llr <= lo))
          cross = Some((t + 1, llr))
      }
      cross match {
        case None =>
          assert(r.getAs[String]("decision") == "continue", s"case $i")
        case Some((n1, llr)) =>
          assert(r.getAs[Long]("n_at_decision") == n1.toLong &&
            r.getAs[Long]("llr_at_decision") == llr &&
            r.getAs[String]("decision") ==
              (if (llr >= up) "reject_h0" else "accept_h0"),
            s"case $i")
      }
    }
  }

  test("mantelHaenszel == the per-stratum BigInt term fold") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        st <- Gen.choose(0L, 3L); g <- Gen.choose(0L, 1L)
        c <- Gen.choose(0L, 1L)
      } yield (st, g, c))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val r = Experiment.mantelHaenszel(
        rows.map { case (st, g, c) => ("e", st, g, c) }
          .toDF("e", "s", "g", "c"), "e", "s", "g", "c").collect()(0)
      val cells = rows.groupBy(_._1).values.map { rs =>
        val a = rs.count(x => x._2 == 1 && x._3 == 1).toLong
        val b = rs.count(x => x._2 == 1 && x._3 == 0).toLong
        val c = rs.count(x => x._2 == 0 && x._3 == 1).toLong
        val d = rs.count(x => x._2 == 0 && x._3 == 0).toLong
        (a, b, c, d, a + b + c + d)
      }.toSeq
      val ok = cells.filter(_._5 >= 2)
      def mic(num: BigInt, den: BigInt) = (BigInt(1000000) * num) / den
      val sr = ok.map { case (a, _, _, d, n) => mic(a * d, n) }.sum
      val ss = ok.map { case (_, b, c, _, n) => mic(b * c, n) }.sum
      val ee = ok.map { case (a, b, c, _, n) =>
        mic(BigInt(a + b) * (a + c), n) }.sum
      val vv = ok.map { case (a, b, c, d, n) =>
        (BigInt(1000000) * (a + b) * (c + d) * (a + c) * (b + d)) /
          (BigInt(n) * n * (n - 1)) }.sum
      assert(BigInt(r.getAs[Long]("e_micro")) == ee &&
        BigInt(r.getAs[Long]("v_micro")) == vv, s"case $i")
      if (ss <= 0) assert(r.isNullAt(8), s"case $i: want null OR")
      else assert(BigInt(r.getAs[Long]("or_mh_ppm")) ==
        (BigInt(1000000) * sr) / ss, s"case $i")
    }
  }

  test("nelsonAalen == the sequential risk-set hazard sum") {
    val gen = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        t <- Gen.choose(0L, 10L); e <- Gen.choose(0L, 1L)
      } yield (t, e))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val got = Experiment.nelsonAalen(
        rows.map { case (t, e) => ("g", t, e) }.toDF("g", "t", "e"),
        "g", "t", "e").collect()
        .map(r => r.getAs[Long]("t") -> r.getAs[Long]("h_micro"))
        .toMap
      var h = 0L
      rows.map(_._1).distinct.sorted.foreach { t =>
        val d = rows.count(x => x._1 == t && x._2 == 1).toLong
        val nRisk = rows.count(_._1 >= t).toLong
        if (d >= 1) {
          h += (1000000L * d) / nRisk
          assert(got(t) == h, s"case $i t=$t")
        } else assert(!got.contains(t), s"case $i t=$t censor-only")
      }
    }
  }

  test("wordErrorRate == the classic two-row DP on raw tokens") {
    val word = Gen.choose(1, 3)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
        .map(_.mkString))
    val gen = for {
      nh <- Gen.choose(0, 10); nr <- Gen.choose(0, 10)
      h <- Gen.listOfN(nh, word); r <- Gen.listOfN(nr, word)
    } yield (h, r)
    samples(gen, 8).zipWithIndex.foreach { case ((h, r), i) =>
      val row = EvalMetrics.wordErrorRate(
        Seq((1L, h.mkString(" "), r.mkString(" ")))
          .toDF("id", "h", "r"), "id", "h", "r").collect()(0)
      // reference: textbook DP over the raw token sequences
      var prev = (0 to r.length).toArray
      h.indices.foreach { x =>
        val cur = new Array[Int](r.length + 1)
        cur(0) = x + 1
        r.indices.foreach { y =>
          cur(y + 1) = math.min(math.min(cur(y) + 1, prev(y + 1) + 1),
            prev(y) + (if (h(x) == r(y)) 0 else 1))
        }
        prev = cur
      }
      val dist = prev(r.length).toLong
      assert(row.getAs[Long]("dist") == dist, s"case $i")
      if (r.isEmpty) assert(row.isNullAt(4))
      else assert(row.getAs[Long]("wer_ppm") ==
        (1000000L * dist) / r.length, s"case $i")
    }
  }

  test("associationRules == the brute-force basket scan") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        bk <- Gen.choose(0L, 9L); it <- Gen.oneOf("A", "B", "C", "D")
      } yield (bk, it))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val got = Ops.associationRules(rows.toDF("bk", "it"),
        "bk", "it", minSupportPpm = 0L).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getAs[Long]("n_ab"), r.getAs[Long]("support_ppm"),
            r.getAs[Long]("confidence_ppm"),
            r.getAs[Long]("lift_ppm")))).toMap
      val m = rows.distinct
      val baskets = m.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        .toMap
      val nb = baskets.size.toLong
      val items = m.map(_._2).distinct
      val want = for {
        a <- items; b <- items if a != b
        nab = baskets.values.count(s => s(a) && s(b)).toLong
        if nab > 0
      } yield (a, b) -> nab
      assert(got.keySet == want.toMap.keySet, s"case $i")
      want.foreach { case ((a, b), nab) =>
        val na = baskets.values.count(_(a)).toLong
        val bb = baskets.values.count(_(b)).toLong
        assert(got((a, b)) == ((nab, 1000000L * nab / nb,
          1000000L * nab / na,
          (BigInt(1000000) * nab * nb / (BigInt(na) * bb)).toLong)),
          s"case $i pair=($a,$b)")
      }
    }
  }

  test("isotonicFitMicro == the brute-force minimax over lattice " +
      "means") {
    val gen = Gen.choose(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50L, 50L)))
    samples(gen, 8).zipWithIndex.foreach { case (vs, i) =>
      val got = EvalMetrics.isotonicFitMicro(
        vs.zipWithIndex.map { case (v, t) =>
          ("k", t.toLong, t.toLong, v) }.toDF("k", "t", "e", "v"),
        "k", "t", "e", "v").orderBy("ts").collect()
        .map(_.getAs[Long]("iso_micro")).toSeq
      val n = vs.length
      def avg(j: Int, k: Int): Long = {
        val s = vs.slice(j, k + 1).sum
        1000000L * s / (k - j + 1)  // Long / truncates like div
      }
      val want = (0 until n).map { i2 =>
        (0 to i2).map(j => (i2 until n).map(k => avg(j, k)).min).max
      }
      assert(got == want, s"case $i: got $got want $want")
      assert(got == got.sorted, s"case $i: not monotone")
    }
  }

  test("hosmerLemeshowDeciles == the sequential rank-decile walk") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        c <- Gen.choose(0L, 1000000L); l <- Gen.choose(0L, 1L)
      } yield (c, l))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val got = EvalMetrics.hosmerLemeshowDeciles(
        rows.zipWithIndex.map { case ((c, l), t) =>
          ("k", t.toLong, c, l) }.toDF("k", "tie", "conf", "lab"),
        "k", "tie", "conf", "lab").collect()
        .map(r => r.getAs[Long]("decile") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("o"),
            r.getAs[Long]("e_ppm")))).toMap
      val n = rows.length.toLong
      val want = rows.zipWithIndex
        .sortBy { case ((c, _), t) => (c, t.toLong) }.zipWithIndex
        .groupBy { case (_, r0) => (r0.toLong * 10L) / n }
        .map { case (d, g) =>
          d -> ((g.size.toLong, g.map(_._1._1._2).sum,
            g.map(_._1._1._1).sum)) }
      assert(got == want, s"case $i")
    }
  }

  test("modularityPpm == the brute-force per-community scan") {
    val gen = for {
      ne <- Gen.choose(1, 30)
      es <- Gen.listOfN(ne, for {
        a <- Gen.choose(0L, 9L); b <- Gen.choose(0L, 9L)
      } yield (a, b))
    } yield es
    samples(gen, 8).zipWithIndex.foreach { case (es0, i) =>
      val und = es0.map { case (a, b) =>
        (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).distinct
      if (und.nonEmpty) {
        val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct
        val labels = nodes.map(nd => (nd, nd % 3))
        val got = graft.operators.Graph.modularityPpm(
          es0.toDF("s", "d"), "s", "d",
          labels.toDF("node", "lab"), "node", "lab").collect()
          .map(r => r.getAs[Long]("community") ->
            ((r.getAs[Long]("e_in"), r.getAs[Long]("deg_sum"),
              r.getAs[Long]("contrib_ppm")))).toMap
        val lab = labels.toMap
        val m = und.size.toLong
        val comms = und.flatMap(e => Seq(lab(e._1), lab(e._2)))
          .distinct
        assert(got.keySet == comms.toSet, s"case $i")
        comms.foreach { c =>
          val ein = und.count(e =>
            lab(e._1) == c && lab(e._2) == c).toLong
          val ds = und.map(e => Seq(e._1, e._2).count(lab(_) == c))
            .sum.toLong
          val contrib = (BigInt(1000000)
            * (BigInt(4) * m * ein - BigInt(ds) * ds)) /
            (BigInt(4) * m * m)
          assert(got(c) == ((ein, ds, contrib.toLong)),
            s"case $i c=$c")
        }
      }
    }
  }

  test("weightedMedianPerGroup == the sorted cumulative-weight walk") {
    val gen = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        v <- Gen.choose(-20L, 20L); w <- Gen.choose(1L, 9L)
      } yield (v, w))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val r = Ops.weightedMedianPerGroup(
        rows.map { case (v, w) => ("g", v, w) }.toDF("g", "v", "w"),
        "g", "v", "w").collect()(0)
      val wt = rows.map(_._2).sum
      var cw = 0L
      val want = rows.sortBy(_._1).find { case (_, w) =>
        cw += w; 2 * cw >= wt }.get._1
      assert(r.getAs[Long]("wmedian") == want &&
        r.getAs[Long]("w_total") == wt, s"case $i")
    }
  }

  test("hillTailIndex == the sorted log-ratio fold") {
    val gen = for {
      n <- Gen.choose(2, 40); k <- Gen.choose(1, 6)
      vs <- Gen.listOfN(n, Gen.choose(1L, 5000L))
    } yield (vs, k)
    samples(gen, 8).zipWithIndex.foreach { case ((vs, k), i) =>
      val r = Ops.hillTailIndex(vs.map(("g", _)).toDF("g", "v"),
        "g", "v", k).collect()(0)
      if (vs.length < k + 1) assert(r.isNullAt(4), s"case $i")
      else {
        val sorted = vs.sorted(Ordering[Long].reverse)
        val xk1 = sorted(k)
        val want = sorted.take(k).map(x =>
          math.floor(1000000.0 * math.log(x.toDouble / xk1.toDouble))
            .toLong).sum / k
        assert(r.getAs[Long]("x_k1") == xk1 &&
          r.getAs[Long]("hill_micro") == want, s"case $i")
      }
    }
  }

  test("gainsTable == the sequential rank-bucket cumulative walk") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0L, 100L); l <- Gen.choose(0L, 1L)
      } yield (s, l))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val nb = 4
      val got = EvalMetrics.gainsTable(
        rows.zipWithIndex.map { case ((s, l), t) =>
          ("k", t.toLong, s, l) }.toDF("k", "tie", "s", "l"),
        "k", "tie", "s", "l", nBuckets = nb).collect()
        .map(r => r.getAs[Long]("bucket") ->
          ((r.getAs[Long]("cum_n"), r.getAs[Long]("cum_o"),
            if (r.isNullAt(7)) null
            else r.getAs[Long]("lift_ppm")))).toMap
      val n = rows.length.toLong
      val toto = rows.map(_._2).sum
      val ranked = rows.zipWithIndex
        .sortBy { case ((s, _), t) => (-s, t.toLong) }
      val want = ranked.zipWithIndex
        .groupBy { case (_, r0) => (r0.toLong * nb) / n }
      var cn = 0L; var co = 0L
      want.toSeq.sortBy(_._1).foreach { case (b, g) =>
        cn += g.size; co += g.map(_._1._1._2).sum
        val lift = if (toto <= 0) null
          else (BigInt(1000000) * co * n / (BigInt(toto) * cn)).toLong
        assert(got(b) == ((cn, co, lift)), s"case $i bucket $b")
      }
    }
  }

  test("rfmSegments == the brute-force per-segment rank walk") {
    val gen = for {
      ne <- Gen.choose(1, 50)
      evs <- Gen.listOfN(ne, for {
        u <- Gen.choose(0L, 9L); t <- Gen.choose(0L, 99L)
        v <- Gen.choose(0L, 50L)
      } yield (u, t, v))
    } yield evs
    samples(gen, 8).zipWithIndex.foreach { case (evs, i) =>
      val b = 5
      val got = graft.operators.Funnel.rfmSegments(
        evs.map { case (u, t, v) => ("s", u, t, v) }
          .toDF("seg", "u", "ts", "v"),
        "seg", "u", "ts", "v", nowTs = 100L, buckets = b).collect()
        .map(r => r.getAs[Long]("user") ->
          ((r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
            r.getAs[Long]("m_score")))).toMap
      val per = evs.groupBy(_._1).map { case (u, es) =>
        (u, 100L - es.map(_._2).max, es.size.toLong,
          es.map(_._3).sum) }.toSeq
      val n = per.size.toLong
      def scores(metric: ((Long, Long, Long, Long)) => Long,
          desc: Boolean) = {
        val sorted =
          if (desc) per.sortBy(p => (-metric(p), p._1))
          else per.sortBy(p => (metric(p), p._1))
        sorted.zipWithIndex.map { case (p, r0) =>
          p._1 -> ((r0.toLong * b) / n + 1) }.toMap
      }
      val rs = scores(_._2, desc = true)
      val fs = scores(_._3, desc = false)
      val ms = scores(_._4, desc = false)
      per.foreach { p =>
        assert(got(p._1) == ((rs(p._1), fs(p._1), ms(p._1))),
          s"case $i user ${p._1}")
      }
    }
  }

  test("attributeTimeDecay == the BigInt per-user shift walk") {
    val gen = for {
      nu <- Gen.choose(1, 10)
      users <- Gen.listOfN(nu, for {
        nt <- Gen.choose(0, 6)
        touches <- Gen.listOfN(nt, for {
          ch <- Gen.oneOf("A", "B", "C")
          dt <- Gen.choose(1L, 3000L)
        } yield (ch, dt))
      } yield touches)
    } yield users
    samples(gen, 8).zipWithIndex.foreach { case (users, i) =>
      val hl = 20L
      val evs = users.zipWithIndex.flatMap { case (ts0, u) =>
        (u.toLong, "buy", 10000L, (u * 100).toLong) +:
          ts0.zipWithIndex.map { case ((ch, dt), j) =>
            (u.toLong, ch, 10000L - dt, (u * 100 + j + 1).toLong) }
      }
      val got = graft.operators.Funnel.attributeTimeDecay(
        evs.toDF("u", "et", "ts", "id"), "u", "et", "ts", "id",
        "buy", hl).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("credit_ppm"))
        .toMap
      val want = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      users.foreach { ts0 =>
        if (ts0.nonEmpty) {
          val es = ts0.map { case (ch, dt) => (ch, dt / hl) }
          val minE = es.map(_._2).min
          val ws = es.map { case (ch, e) =>
            val s = e - minE
            (ch, if (s >= 63) BigInt(0) else BigInt(1) << (62 - s.toInt))
          }
          val tot = ws.map(_._2).sum
          ws.foreach { case (ch, w) =>
            want(ch) += (BigInt(1000000) * w / tot).toLong }
        }
      }
      assert(got == want.toMap, s"case $i: got $got want $want")
    }
  }

  test("growthAccounting == the brute-force presence scan") {
    val gen = for {
      ne <- Gen.choose(1, 60)
      evs <- Gen.listOfN(ne, for {
        u <- Gen.choose(0L, 7L); t <- Gen.choose(0L, 99L)
      } yield (u, t))
    } yield evs
    samples(gen, 8).zipWithIndex.foreach { case (evs, i) =>
      val got = graft.operators.Funnel.growthAccounting(
        evs.toDF("u", "ts"), "u", "ts", periodNs = 10L).collect()
        .map(r => r.getAs[Long]("period") ->
          ((r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
            r.getAs[Long]("n_retained"),
            r.getAs[Long]("n_resurrected"),
            r.getAs[Long]("n_churned")))).toMap
      val pres = evs.map { case (u, t) => (u, t / 10L) }.distinct
      val byU = pres.groupBy(_._1).view
        .mapValues(_.map(_._2).sorted).toMap
      val maxP = pres.map(_._2).max
      val rows = scala.collection.mutable.Map[Long,
        (Long, Long, Long, Long, Long)]()
        .withDefaultValue((0L, 0L, 0L, 0L, 0L))
      byU.values.foreach { ps =>
        ps.zipWithIndex.foreach { case (p, ix) =>
          val (a, nw, rt, rs, ch) = rows(p)
          if (ix == 0) rows(p) = (a + 1, nw + 1, rt, rs, ch)
          else if (ps(ix - 1) == p - 1)
            rows(p) = (a + 1, nw, rt + 1, rs, ch)
          else rows(p) = (a + 1, nw, rt, rs + 1, ch)
          val churnsAt = if (ix == ps.length - 1) Some(p + 1)
            else if (ps(ix + 1) != p + 1) Some(p + 1) else None
          churnsAt.filter(_ <= maxP).foreach { cp =>
            val (a2, n2, r2, s2, c2) = rows(cp)
            rows(cp) = (a2, n2, r2, s2, c2 + 1)
          }
        }
      }
      assert(got == rows.toMap, s"case $i: got $got want $rows")
    }
  }

  test("weightedKappa == the BigInt observed/expected fold") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 4L); b <- Gen.choose(0L, 4L)
      } yield (a, b))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val r = EvalMetrics.weightedKappa(
        rows.map { case (a, b) => ("k", a, b) }.toDF("k", "a", "b"),
        "k", "a", "b", maxCat = 5).collect()(0)
      val n = rows.length.toLong
      val num = rows.map { case (a, b) => (a - b) * (a - b) }.sum
      val den = (for {
        (ri, rc) <- rows.groupBy(_._1).view.mapValues(_.size).toSeq
        (cj, cc) <- rows.groupBy(_._2).view.mapValues(_.size).toSeq
      } yield BigInt((ri - cj) * (ri - cj)) * rc * cc).sum
      assert(r.getAs[Long]("num") == num, s"case $i")
      if (den <= 0) assert(r.isNullAt(3), s"case $i")
      else assert(BigInt(r.getAs[Long]("kappa_w_ppm")) ==
        BigInt(1000000) - BigInt(1000000) * n * num / den,
        s"case $i")
    }
  }

  test("cronbachAlpha == the BigInt moment fold on complete grids") {
    val gen = for {
      nr <- Gen.choose(2, 10); ni <- Gen.choose(2, 6)
      vs <- Gen.listOfN(nr * ni, Gen.choose(0L, 9L))
    } yield (nr, ni, vs)
    samples(gen, 8).zipWithIndex.foreach { case ((nr, ni, vs), i) =>
      val rows = for (r <- 0 until nr; it <- 0 until ni) yield
        ("k", s"r$r", s"i$it", vs(r * ni + it))
      val got = EvalMetrics.cronbachAlpha(rows.toDF("k", "r", "i", "v"),
        "k", "r", "i", "v").collect()(0)
      val ts = (0 until nr).map(r => vs.slice(r * ni, r * ni + ni).sum)
      val d = BigInt(nr) * ts.map(t => BigInt(t) * t).sum -
        BigInt(ts.sum) * ts.sum
      val nNum = (0 until ni).map { it =>
        val col0 = (0 until nr).map(r => vs(r * ni + it))
        BigInt(nr) * col0.map(x => BigInt(x) * x).sum -
          BigInt(col0.sum) * col0.sum }.sum
      if (d <= 0) assert(got.isNullAt(3), s"case $i")
      else assert(BigInt(got.getAs[Long]("alpha_milli")) ==
        BigInt(1000) * ni * (d - nNum) / (BigInt(ni - 1) * d),
        s"case $i")
    }
  }

  test("mutualInformation == the per-cell float-term fold") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 3L); b <- Gen.choose(0L, 3L)
      } yield (a, b))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val r = Drift.mutualInformation(
        rows.map { case (a, b) => ("k", a, b) }.toDF("k", "a", "b"),
        "k", "a", "b").collect()(0)
      val n = rows.length.toDouble
      val cells = rows.groupBy(identity).view.mapValues(_.size)
      val na = rows.groupBy(_._1).view.mapValues(_.size).toMap
      val nb = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val want = cells.map { case ((a, b), nab) =>
        math.floor((1000000.0 * (nab / n))
          * math.log((nab * n) / (na(a).toDouble * nb(b).toDouble)))
          .toLong }.sum
      assert(r.getAs[Long]("mi_micro") == want, s"case $i")
    }
  }

  test("npsPerGroup == the direct band count") {
    val gen = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 10L)))
    samples(gen, 8).zipWithIndex.foreach { case (vs, i) =>
      val r = Ops.npsPerGroup(vs.map(("g", _)).toDF("g", "s"),
        "g", "s").collect()(0)
      val p = vs.count(_ >= 9).toLong
      val d = vs.count(_ <= 6).toLong
      assert(r.getAs[Long]("promoters") == p &&
        r.getAs[Long]("detractors") == d &&
        r.getAs[Long]("nps_ppm") == 1000000L * (p - d) / vs.length,
        s"case $i")
    }
  }

  test("gehanBreslow == the sequential weighted risk-set walk") {
    val gen = for {
      n <- Gen.choose(2, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0L, 1L); t <- Gen.choose(0L, 12L)
        e <- Gen.choose(0L, 1L)
      } yield (g, t, e))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val r = Experiment.gehanBreslow(
        rows.map { case (g, t, e) => ("x", g, t, e) }
          .toDF("x", "g", "t", "e"), "x", "g", "t", "e").collect()(0)
      var o = BigInt(0); var ee = BigInt(0); var vv = BigInt(0)
      rows.map(_._2).distinct.sorted.foreach { t =>
        val atRisk = rows.filter(_._2 >= t)
        val n1 = atRisk.count(_._1 == 1L).toLong
        val n0 = atRisk.count(_._1 == 0L).toLong
        val nn = n1 + n0
        val d = rows.count(x => x._2 == t && x._3 == 1L).toLong
        val d1 = rows.count(x =>
          x._2 == t && x._3 == 1L && x._1 == 1L).toLong
        if (d >= 1) {
          o += BigInt(nn) * d1; ee += BigInt(d) * n1
          if (nn > 1) vv += BigInt(1000000) * d * n1 * n0 *
            (nn - d) / (nn - 1)
        }
      }
      assert(BigInt(r.getAs[Long]("o1w")) == o &&
        BigInt(r.getAs[Long]("e1w")) == ee &&
        BigInt(r.getAs[Long]("vw_micro")) == vv, s"case $i")
      if (vv <= 0) assert(r.isNullAt(5), s"case $i")
      else {
        val want = math.floor((o - ee).toDouble * (o - ee).toDouble
          * 1.0e12 / vv.toDouble).toLong
        assert(r.getAs[Long]("chi2_micro") == want, s"case $i")
      }
    }
  }

  test("cohortLtv == the brute-force cohort scan") {
    val gen = for {
      ne <- Gen.choose(1, 50)
      evs <- Gen.listOfN(ne, for {
        u <- Gen.choose(0L, 7L); t <- Gen.choose(0L, 99L)
        v <- Gen.choose(0L, 30L)
      } yield (u, t, v))
    } yield evs
    samples(gen, 8).zipWithIndex.foreach { case (evs, i) =>
      val got = Experiment.cohortLtv(evs.toDF("u", "ts", "v"),
        "u", "ts", "v", periodNs = 10L).collect()
        .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("age")) ->
          ((r.getAs[Long]("n_active"), r.getAs[Long]("cum_revenue"),
            r.getAs[Long]("ltv_micro")))).toMap
      val ps = evs.map { case (u, t, v) => (u, t / 10L, v) }
      val coh = ps.groupBy(_._1).view.mapValues(_.map(_._2).min)
        .toMap
      val sz = coh.values.groupBy(identity).view.mapValues(_.size)
        .toMap
      val cells = ps.groupBy(p => (coh(p._1), p._2 - coh(p._1)))
      val want = cells.keys.map { case (c, a) =>
        val cum = cells.filter { case ((c2, a2), _) =>
          c2 == c && a2 <= a }.values.flatten.map(_._3).sum
        (c, a) -> ((cells((c, a)).map(_._1).distinct.size.toLong,
          cum, 1000000L * cum / sz(c)))
      }.toMap
      assert(got == want, s"case $i")
    }
  }

  test("kruskalWallis == the BigInt midrank fold") {
    val gen = for {
      n <- Gen.choose(2, 50)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0L, 2L); v <- Gen.choose(0L, 12L)
      } yield (g, v))
    } yield rows
    samples(gen, 8).zipWithIndex.foreach { case (rows, i) =>
      val r = Experiment.kruskalWallis(
        rows.map { case (g, v) => ("e", g, v) }.toDF("e", "g", "v"),
        "e", "g", "v").collect()(0)
      val n = rows.length.toLong
      val sorted = rows.map(_._2).sorted
      def mid2(v: Long) =
        2L * sorted.count(_ < v) + sorted.count(_ == v) + 1L
      val terms = rows.groupBy(_._1).values.map { grp =>
        val r2 = grp.map(x => mid2(x._2)).sum
        (BigInt(3000000) * r2 * r2) /
          (BigInt(grp.size) * n * (n + 1)) }
      val h = terms.sum - BigInt(3) * (n + 1) * 1000000
      assert(BigInt(r.getAs[Long]("h_micro")) == h, s"case $i")
      val tc = rows.groupBy(_._2).values
        .map(g => { val c = g.size.toLong; c * c * c - c }).sum
      val cden = n * n * n - n - tc
      if (cden <= 0) assert(r.isNullAt(4), s"case $i")
      else assert(BigInt(r.getAs[Long]("h_corr_micro")) ==
        h * (BigInt(n) * n * n - n) / cden, s"case $i")
    }
  }

  test("friedman == the per-block BigInt midrank fold") {
    val gen = for {
      nb <- Gen.choose(2, 8); k <- Gen.choose(2, 5)
      vs <- Gen.listOfN(nb * k, Gen.choose(0L, 6L))
    } yield (nb, k, vs)
    samples(gen, 8).zipWithIndex.foreach { case ((nb, k, vs), i) =>
      val rows = for (b <- 0 until nb; t <- 0 until k) yield
        ("x", s"b$b", s"t$t", vs(b * k + t))
      val r = Experiment.friedman(rows.toDF("x", "b", "t", "v"),
        "x", "b", "t", "v").collect()(0)
      def mid2(block: Seq[Long], v: Long) =
        2L * block.count(_ < v) + block.count(_ == v) + 1L
      val blocks = (0 until nb).map(b => vs.slice(b * k, b * k + k))
      val r2s = (0 until k).map(t =>
        blocks.map(bl => mid2(bl, bl(t))).sum)
      val terms = r2s.map(rr => (BigInt(3000000) * rr * rr) /
        (BigInt(nb) * k * (k + 1)))
      val chi = terms.sum - BigInt(3) * nb * (k + 1) * 1000000
      assert(BigInt(r.getAs[Long]("chi2_micro")) == chi, s"case $i")
      val tc = blocks.flatMap(bl =>
        bl.groupBy(identity).values.map(g =>
          { val c = g.size.toLong; c * c * c - c })).sum
      val den = nb.toLong * k * (k.toLong * k - 1) - tc
      if (den <= 0) assert(r.isNullAt(4), s"case $i")
      else assert(BigInt(r.getAs[Long]("chi2_corr_micro")) ==
        chi * (BigInt(nb) * k * (k.toLong * k - 1)) / den,
        s"case $i")
    }
  }

  test("wilcoxonSignedRank == the sequential signed midrank walk") {
    val gen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-8L, 8L)))
    samples(gen, 8).zipWithIndex.foreach { case (ds, i) =>
      val r = Experiment.wilcoxonSignedRank(
        ds.zipWithIndex.map { case (d, t) =>
          ("e", t.toLong, 0L, d) }.toDF("e", "i", "x", "y"),
        "e", "i", "x", "y").collect()(0)
      val nz = ds.filter(_ != 0)
      val n = nz.length.toLong
      val abs0 = nz.map(math.abs)
      def mid2(a: Long) =
        2L * abs0.count(_ < a) + abs0.count(_ == a) + 1L
      val w2 = nz.filter(_ > 0).map(d => mid2(math.abs(d))).sum
      val tc = abs0.groupBy(identity).values
        .map(g => { val c = g.size.toLong; c * c * c - c }).sum
      val v48 = 2 * n * (n + 1) * (2 * n + 1) - tc
      assert(r.getAs[Long]("n") == n &&
        r.getAs[Long]("w2_plus") == w2 &&
        r.getAs[Long]("var_num48") == v48, s"case $i")
      if (v48 <= 0) assert(r.isNullAt(6), s"case $i")
      else {
        val want = math.floor(((w2 - n * (n + 1) / 2) * 500L)
          .toDouble / math.sqrt(v48.toDouble / 48.0)).toLong
        assert(r.getAs[Long]("z_milli") == want, s"case $i")
      }
    }
  }
}
