package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Sketches, TextFns}

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keysDf(n: Int, prefix: String) =
    (0 until n).map(i => s"$prefix$i").toDF("k")

  test("hllRegisters: registers match a per-key recomputation and merge " +
      "by max") {
    val df = keysDf(500, "key")
    val reg = Sketches.hllRegisters(df, "k", p = 8).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    // independent recomputation straight from the hash contract
    // (including the quadratic scramble, replicated here from its spec)
    def mix(x: Long) = (x * x % TextFns.HashP + x) % TextFns.HashP
    val expect = (0 until 500).map { i =>
      val base = TextFns.polyHash(s"key$i")
      val b = (mix(TextFns.minhashPerm(100, base)) % 256).toInt
      val wv = mix(TextFns.minhashPerm(101, base))
      val rho = if (wv == 0L) 31
        else 31 - (64 - java.lang.Long.numberOfLeadingZeros(wv))
      (b, rho)
    }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).max }
    assert(reg == expect)
    // mergeability: sketch(A) union sketch(B), re-maxed = sketch(A ∪ B)
    val a = Sketches.hllRegisters(keysDf(300, "key"), "k")
    val b = Sketches.hllRegisters(
      (300 until 500).map(i => s"key$i").toDF("k"), "k")
    val merged = Sketches.hllMerge(Seq(a, b)).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(merged == reg, "register merge must equal the whole-corpus sketch")
    // idempotent: re-merging an already-merged shard changes nothing
    assert(Sketches.hllMerge(Seq(a, b, a)).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap == reg)
  }

  test("hllEstimate: within 10% at 5000 keys, linear-counting small range") {
    val est5k = Sketches.hllEstimate(
      Sketches.hllRegisters(keysDf(5000, "doc"), "k"), p = 8)
      .collect()(0).getDouble(1)
    assert(math.abs(est5k - 5000) / 5000.0 < 0.10,
      s"HLL(m=256) estimate $est5k too far from 5000")
    // 40 distinct keys: raw estimate <= 2.5m with zero registers left →
    // linear counting, which is near-exact at this occupancy
    val est40 = Sketches.hllEstimate(
      Sketches.hllRegisters(keysDf(40, "z"), "k"), p = 8)
      .collect()(0).getDouble(1)
    assert(math.abs(est40 - 40) < 5, s"linear-counting estimate $est40")
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(keysDf(5, "x"), "k", p = 2)
    }
  }

  test("hllRegistersBy/hllEstimateBy: groups are independent — each " +
      "group's rows equal the ungrouped sketch of its subset") {
    // two groups with overlapping key sets of different cardinality
    val df = ((0 until 300).map(i => ("a", s"key$i")) ++
      (0 until 40).map(i => ("b", s"key$i"))).toDF("g", "k")
    val by = Sketches.hllEstimateBy(
      Sketches.hllRegistersBy(df, Seq("g"), "k"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    def solo(gv: String) = Sketches.hllEstimate(
      Sketches.hllRegisters(df.filter(col("g") === gv), "k"))
      .collect()(0).getDouble(1)
    assert(by("a") == solo("a") && by("b") == solo("b"),
      s"grouped estimates must match per-subset sketches: $by")
    assert(math.abs(by("b") - 40) < 6 && math.abs(by("a") - 300) < 60,
      s"estimates must track per-group cardinality: $by")
  }

  test("hllMerge/cmsMerge: per-group register relations fail loudly " +
      "without groupCols and merge per group with them") {
    val rows = (0 until 400).map(i => (s"key$i", s"src${i % 3}"))
      .toDF("k", "src")
    val byGroup = Sketches.hllRegistersBy(rows, Seq("src"), "k")
    // the trap the guard closes: a bare merge would silently collapse
    // all three sources into one sketch — now it refuses
    val e = intercept[IllegalArgumentException] {
      Sketches.hllMerge(Seq(byGroup))
    }
    assert(e.getMessage.contains("groupCols"), e.getMessage)
    intercept[IllegalArgumentException] {
      Sketches.cmsMerge(Seq(rows.toDF("row", "colx"))) // wrong shape too
    }
    // with groupCols: shard merge preserves per-group registers exactly
    val shardA = Sketches.hllRegistersBy(rows.limit(250), Seq("src"), "k")
    val shardB = Sketches.hllRegistersBy(
      rows.exceptAll(rows.limit(250)), Seq("src"), "k")
    val merged = Sketches.hllMerge(Seq(shardA, shardB), Seq("src"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val whole = byGroup.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(merged == whole,
      "grouped shard merge must equal the whole per-group sketch")
  }

  test("bloom: no false negatives ever; fp rate tracks the fill estimate; " +
      "shard merge is idempotent OR; schema guard") {
    val members = (0 until 400).map(i => s"key$i").toDF("k")
    val regs = Sketches.bloomRegisters(members, "k", mBits = 4096,
      kHashes = 4)
    val nBits = regs.count()
    assert(nBits > 0 && nBits <= 1600, s"set bits $nBits")
    // every member must test positive — the Bloom contract
    val flags = Sketches.bloomMightContain(members, "k", regs,
        mBits = 4096, kHashes = 4)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(flags.size == 400 && flags.values.forall(identity),
      "a Bloom filter must NEVER false-negative")
    // non-members: fp frequency within ~3x of the fill estimate
    val others = (0 until 2000).map(i => s"other$i").toDF("k")
    val fp = Sketches.bloomMightContain(others, "k", regs,
        mBits = 4096, kHashes = 4)
      .filter(col("might_contain")).count()
    val est = Sketches.bloomFpEstimate(regs, mBits = 4096, kHashes = 4)
      .collect()(0)
    assert(est.getLong(0) == nBits)
    val fpEst = est.getDouble(1)
    assert(fp <= math.max(6.0, 3.0 * fpEst * 2000),
      s"fp count $fp vs estimate ${fpEst * 2000}")
    // shard merge = whole-corpus filter, and re-merging a shard no-ops
    val a = Sketches.bloomRegisters(members.limit(250), "k", 4096, 4)
    val b = Sketches.bloomRegisters(
      members.exceptAll(members.limit(250)), "k", 4096, 4)
    val whole = regs.collect().map(_.getInt(0)).toSet
    assert(Sketches.bloomMerge(Seq(a, b)).collect()
      .map(_.getInt(0)).toSet == whole)
    assert(Sketches.bloomMerge(Seq(a, b, a)).collect()
      .map(_.getInt(0)).toSet == whole, "OR-merge must be idempotent")
    intercept[IllegalArgumentException] {
      Sketches.bloomMerge(Seq(members))
    }
  }

  test("hllIntersect: inclusion-exclusion tracks true overlap; disjoint " +
      "sets clamp to ~0") {
    // A = keys 0..299, B = keys 200..499 → true intersection 100
    val a = Sketches.hllRegisters(keysDf(300, "key"), "k")
    val b = Sketches.hllRegisters(
      (200 until 500).map(i => s"key$i").toDF("k"), "k")
    val r = Sketches.hllIntersect(a, b).collect()(0)
    val (estA, estB, estU, estI) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(math.abs(estU - 500) / 500.0 < 0.12, s"union $estU vs 500")
    assert(math.abs(estI - 100) < 60,
      s"intersection estimate $estI vs true 100 (a=$estA b=$estB u=$estU)")
    // disjoint: intersection estimate collapses toward 0 (clamped)
    val c = Sketches.hllRegisters(
      (0 until 300).map(i => s"other$i").toDF("k"), "k")
    val d = Sketches.hllIntersect(a, c).collect()(0).getDouble(3)
    assert(d >= 0.0 && d < 60, s"disjoint estimate must be near 0: $d")
  }

  test("randomProject: JL projection preserves cluster geometry, sign " +
      "agrees with rpBucket hyperplanes, deterministic") {
    import graft.functions.VectorFns
    // 3 tight, well-separated 64-dim clusters
    def blob(axis: Int, lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, (0 until 64).map(d =>
        (if (d == axis) 50.0 else 0.0) + 0.01 * (i % 5)).toArray))
    val rows = blob(0, 0, 10) ++ blob(20, 10, 20) ++ blob(40, 20, 30)
    val projected = rows.map { case (id, v) =>
      (id, VectorFns.randomProjectLocal(v.toIndexedSeq, 16))
    }
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // within-cluster distances stay far below cross-cluster after JL
    val within = for (Seq((_, a), (_, b)) <-
      projected.take(10).combinations(2).toSeq) yield d2(a, b)
    val across = for ((_, a) <- projected.take(10);
      (_, b) <- projected.slice(10, 20)) yield d2(a, b)
    assert(within.max < across.min / 10,
      s"JL must keep clusters separated: within ${within.max} vs " +
        s"across ${across.min}")
    // norms preserved within JL distortion at k=16 (loose factor-2 band)
    rows.zip(projected).foreach { case ((_, v), (_, y)) =>
      val r = math.sqrt(y.map(x => x * x).sum / v.map(x => x * x).sum)
      assert(r > 0.5 && r < 2.0, s"norm ratio $r out of band")
    }
    // bucket bit j of rpBucket IS the sign of y_j (shared hyperplanes)
    val v0 = rows.head._2.toIndexedSeq
    val y0 = VectorFns.randomProjectLocal(v0, 16)
    val bucket = VectorFns.rpBucketLocal(v0, 16)
    (0 until 16).foreach { j =>
      assert((((bucket >> j) & 1L) == 1L) == (y0(j) >= 0),
        s"bucket bit $j must be the sign of y_$j")
    }
    assert(VectorFns.randomProjectLocal(v0, 16).toSeq == y0.toSeq)
  }

  test("cmsRegisters/cmsEstimate: one-sided error, exact heavy keys, " +
      "row sums conserve instances, shards merge by sum") {
    // 3 heavy keys (100/50/25 copies) + 200 singletons
    val rows = Seq.fill(100)("alpha") ++ Seq.fill(50)("beta") ++
      Seq.fill(25)("gamma") ++ (0 until 200).map(i => s"tail$i")
    val df = rows.toDF("k")
    val reg = Sketches.cmsRegisters(df, "k", depth = 4, width = 256)
    // every row of the sketch sees every instance exactly once
    val sums = reg.groupBy(col("row")).agg(sum(col("cnt")).as("s"))
      .collect().map(_.getLong(1)).toSeq
    assert(sums == Seq.fill(4)(rows.length.toLong),
      s"each depth row must sum to ${rows.length}: $sums")
    val est = Sketches.cmsEstimate(reg,
      Seq("alpha", "beta", "gamma", "tail0", "absent"), depth = 4,
      width = 256).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("alpha" -> 100L, "beta" -> 50L, "gamma" -> 25L,
      "tail0" -> 1L, "absent" -> 0L)
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"CMS must never undercount: $k ${est(k)} < $t")
    }
    // at 375 instances over 4×256 cells collisions are sparse: heavy keys
    // estimate exactly (min over 4 rows dodges singleton collisions)
    assert(est("alpha") == 100L && est("beta") == 50L, s"$est")
    // mergeability: shard registers add
    val s1 = Sketches.cmsRegisters(rows.take(180).toDF("k"), "k")
    val s2 = Sketches.cmsRegisters(rows.drop(180).toDF("k"), "k")
    val merged = Sketches.cmsMerge(Seq(s1, s2))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = reg.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == whole, "summed shard registers must equal the whole")
    intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(reg, Seq.empty, 4, 256)
    }
  }

  test("logHistRegisters: exact cells for hand-computed values, " +
      "underflow reserved, small values get their own cells") {
    val vals = Seq(-3L, 0L, 1L, 2L, 3L, 7L, 8L, 9L, 15L, 16L, 100L, 1000L)
      .toDF("v")
    val got = Sketches.logHistRegisters(vals, "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // -3, 0 -> underflow; 1 -> (0,0); 2 -> (1,0); 3 -> (1,4); 7 -> (2,6)
    // 8 -> (3,0); 9 -> (3,1); 15 -> (3,7); 16 -> (4,0);
    // 100 = 0b1100100 -> b=6, sub=(100>>3)-8=4; 1000 -> b=9, sub=(1000>>6)-8=7
    assert(got == Map(
      (-1L, 0L) -> 2L, (0L, 0L) -> 1L, (1L, 0L) -> 1L, (1L, 4L) -> 1L,
      (2L, 6L) -> 1L, (3L, 0L) -> 1L, (3L, 1L) -> 1L, (3L, 7L) -> 1L,
      (4L, 0L) -> 1L, (6L, 4L) -> 1L, (9L, 7L) -> 1L), got.toString)
  }

  test("logHist: shard merge equals whole; quantile lower bounds bracket " +
      "the true quantiles within the 12.5% cell width") {
    val all = (1L to 10000L).map(i => (i * i) % 65537L + 1L)
    val whole = Sketches.logHistRegisters(all.toDF("v"), "v")
    val merged = Sketches.logHistMerge(Seq(
      Sketches.logHistRegisters(all.take(4000).toDF("v"), "v"),
      Sketches.logHistRegisters(all.drop(4000).toDF("v"), "v")))
    val a = whole.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = merged.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
    val qs = Seq(0.5, 0.9, 0.99)
    val got = Sketches.logHistQuantiles(whole, qs)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val sorted = all.sorted
    for (q <- qs) {
      val qp = math.round(q * 100)
      val rank = math.max(1L, (qp * sorted.size + 99L) / 100L)
      val truth = sorted((rank - 1).toInt)
      val lb = got(qp)
      assert(lb <= truth, s"q=$q lb=$lb > truth=$truth")
      // upper bound of the chosen cell is lb + cellWidth; truth is in it
      // cell width = 2^(b-3) <= lb/8 (and 1 for the exact small cells)
      assert(truth < lb + math.max(1L, lb >> 3),
        s"q=$q truth=$truth outside cell at lb=$lb")
    }
  }

  test("logHistQuantilesBy: groups sketch independently, match the " +
      "global readout run per group") {
    val rows = (1L to 500L).map(i => ("small", i)) ++
      (1L to 500L).map(i => ("big", i * 1000L))
    val regs = Sketches.logHistRegistersBy(rows.toDF("g", "v"),
      Seq("g"), "v")
    val got = Sketches.logHistQuantilesBy(regs, "g", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    for (g <- Seq("small", "big")) {
      val solo = Sketches.logHistQuantiles(
        Sketches.logHistRegisters(
          rows.filter(_._1 == g).map(_._2).toDF("v"), "v"),
        Seq(0.5, 0.9))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got(g -> 50L) == solo(50L) && got(g -> 90L) == solo(90L),
        s"$g: $got vs $solo")
    }
    // and the big group's p50 really is ~1000x the small group's
    assert(got("big" -> 50L) >= 500L * got("small" -> 50L))
  }

  test("logHistMerge with group columns: per-group shards merge to the " +
      "per-group whole; schema mismatches refuse") {
    val rows = (1L to 600L).map(i => (s"g${i % 3}", i))
    val whole = Sketches.logHistRegistersBy(rows.toDF("g", "v"),
      Seq("g"), "v")
    val merged = Sketches.logHistMerge(Seq(
      Sketches.logHistRegistersBy(rows.take(250).toDF("g", "v"), Seq("g"), "v"),
      Sketches.logHistRegistersBy(rows.drop(250).toDF("g", "v"), Seq("g"), "v")),
      groupCols = Seq("g"))
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(m(whole) == m(merged))
    val e = intercept[IllegalArgumentException] {
      Sketches.logHistMerge(Seq(whole)) // grouped relation, no groupCols
    }
    assert(e.getMessage.contains("expected exactly"), e.getMessage)
  }
}
