package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ops

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("explodeZip: lockstep explode with null padding to longest list") {
    val df = Seq(("l1", "220;380", "2;4;6")).toDF("id", "voltage", "wires")
    val got = Ops.explodeZip(df, Seq("voltage", "wires"))
      .orderBy("wires").collect()
    assert(got.length == 3)
    val rows = got.map(r => (r.getAs[String]("voltage"), r.getAs[String]("wires")))
    assert(rows.toSet == Set(("220", "2"), ("380", "4"), (null, "6")))
  }

  test("explodeZip: null cell pads as nulls, all-null row survives") {
    val df = Seq(("l1", null.asInstanceOf[String], "2;4"), ("l2", null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("id", "voltage", "wires")
    val got = Ops.explodeZip(df, Seq("voltage", "wires")).collect()
    assert(got.count(_.getAs[String]("id") == "l1") == 2, "null cell row kept, padded")
    assert(got.count(_.getAs[String]("id") == "l2") == 1, "all-null row survives as one row")
    assert(got.filter(_.getAs[String]("id") == "l1").forall(_.getAs[String]("voltage") == null))
  }

  test("recode: conflicting expanded keys never multiply fact rows") {
    val mapping = Seq(("A, B", "X"), ("A", "Y")).toDF("f", "to")
    val df = Seq("A", "A", "B").toDF("c")
    val got = Ops.recode(df, "c", mapping, "f", "to").collect().map(_.getString(0))
    assert(got.length == 3, s"row count must be preserved, got ${got.length}")
    assert(got.toSet == Set("X"), "deterministic min target for conflicting keys")
  }

  test("rangeLookup: smallest threshold >= value, inf catch-all, dup rows kept") {
    val limits = Seq((10.0, "low"), (20.0, "mid"), (Double.PositiveInfinity, "high"))
      .toDF("threshold", "attr")
    val fact = Seq(("a", 5.0), ("a", 5.0), ("b", 10.0), ("c", 15.0), ("d", 99.0))
      .toDF("k", "v")
    val got = Ops.rangeLookup(fact, "v", limits, "threshold")
      .select($"k", $"v", $"attr").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(got.length == 5, "duplicate fact rows must survive")
    assert(got.count(_ == ("a", 5.0, "low")) == 2)
    assert(got.contains(("b", 10.0, "low")), "boundary: x <= threshold")
    assert(got.contains(("c", 15.0, "mid")))
    assert(got.contains(("d", 99.0, "high")))
  }

  test("modePerGroup: highest count wins, ties to smallest value") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "b"), ("g2", "a")).toDF("g", "v")
    val got = Ops.modePerGroup(df, Seq("g"), "v").orderBy("g").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("g1", "x"), ("g2", "a")))
  }

  test("topKPerGroup keeps k rows per group in order") {
    val df = Seq(("g", 1), ("g", 3), ("g", 2), ("h", 9)).toDF("g", "v")
    val got = Ops.topKPerGroup(df, Seq("g"), Seq($"v".desc), 2)
      .groupBy("g").agg(collect_set($"v").as("vs")).orderBy("g").collect()
    assert(got(0).getSeq[Int](1).toSet == Set(3, 2))
    assert(got(1).getSeq[Int](1).toSet == Set(9))
  }

  test("forwardFill carries last non-null within partition") {
    val df = Seq(("u", 1, Some(10.0)), ("u", 2, None), ("u", 3, None),
      ("u", 4, Some(7.0)), ("v", 1, None)).toDF("p", "t", "v")
    val got = Ops.forwardFill(df, "t", Seq("v"), Seq("p"))
      .orderBy("p", "t").collect().map(r => Option(r.get(2)))
    assert(got.toSeq == Seq(Some(10.0), Some(10.0), Some(10.0), Some(7.0), None))
  }

  test("forwardFill refuses an empty partition spec; forwardFillGlobal is the opt-in") {
    val df = Seq((1, Some(1.0)), (2, None)).toDF("t", "v")
    intercept[IllegalArgumentException] {
      Ops.forwardFill(df, "t", Seq("v"), Nil)
    }
    val got = Ops.forwardFillGlobal(df, "t", Seq("v"))
      .orderBy("t").collect().map(r => Option(r.get(1)))
    assert(got.toSeq == Seq(Some(1.0), Some(1.0)))
  }

  test("gapFillDayTrend fills zeros by trend-scaled previous day") {
    // 40 hourly points, constant 10.0, with a zero at t=35:
    // fill = sum(t30..34)/sum(t6..10) * x[t11] = 50/50 * 10 = 10
    val rows = (1 to 40).map(t => ("c", t, if (t == 35) 0.0 else 10.0))
    val df = rows.toDF("c", "t", "v")
    val got = Ops.gapFillDayTrend(df, Seq("c"), "t", "v")
      .filter($"t" === 35).head.getDouble(2)
    assert(got == 10.0)
    // leading rows (no fill possible) keep their value
    val head = Ops.gapFillDayTrend(df, Seq("c"), "t", "v")
      .filter($"t" === 1).head.getDouble(2)
    assert(head == 10.0)
  }

  test("gapFillDayTrendFixpoint converges where single pass cannot") {
    // two adjacent gaps: the second needs the first's filled value
    val rows = (1 to 40).map(t => ("c", t, if (t == 35 || t == 36) 0.0 else 10.0))
    val df = rows.toDF("c", "t", "v")
    val once = Ops.gapFillDayTrend(df, Seq("c"), "t", "v")
    val fixed = Ops.gapFillDayTrendFixpoint(df, Seq("c"), "t", "v", maxIters = 3)
    assert(fixed.filter($"v" === 0).count() == 0, "fixpoint fills both gaps")
    assert(fixed.filter($"t" === 35).head.getDouble(2) > 0)
    assert(fixed.filter($"t" === 36).head.getDouble(2) > 0)
    assert(once.collect().length == 40)
  }

  test("adaptive fixpoint matches sequential fill on a deep day-ago chain") {
    // gaps at 30, 54, 78, 102, 126: each one's day-ago donor (t-24) is the
    // previous gap, so pandas' top-down fill resolves them in order — five
    // dependency levels. The old maxIters=3 bound left the tail at zero;
    // the adaptive loop keeps passing while fills occur and lands on the
    // exact sequential result (all 10.0 on this constant series).
    val gaps = Set(30, 54, 78, 102, 126)
    val rows = (1 to 150).map(t => ("c", t, if (gaps(t)) 0.0 else 10.0))
    val df = rows.toDF("c", "t", "v")
    val old3 = Ops.gapFillDayTrendFixpoint(df, Seq("c"), "t", "v", maxIters = 3)
    assert(old3.filter($"v" === 0).count() > 0,
      "fixture must be one where a 3-pass bound genuinely diverges")
    val fixed = Ops.gapFillDayTrendFixpoint(df, Seq("c"), "t", "v")
    val got = fixed.orderBy("t").collect().map(_.getDouble(2))
    assert(got.length == 150 && got.forall(_ == 10.0),
      s"sequential-parity fill: ${got.zipWithIndex.filter(_._1 != 10.0).take(5).toSeq}")
  }

  test("adaptive fixpoint stalls cleanly on unfillable zeros") {
    // a zero with no day-ago donor (t=3: lag-24 is null) can never fill;
    // the loop must stop on no-progress, leaving it intact
    val rows = (1 to 40).map(t => ("c", t, if (t == 3) 0.0 else 10.0))
    val df = rows.toDF("c", "t", "v")
    val fixed = Ops.gapFillDayTrendFixpoint(df, Seq("c"), "t", "v")
    assert(fixed.filter($"t" === 3).head.getDouble(2) == 0.0)
    assert(fixed.count() == 40)
  }

  test("histogramQuantiles: within a bin width of exact, deterministic") {
    // 1000 uniform values 0..999 in one group; exact p50 = ~500, p95 = ~950
    val df = spark.range(1000).select(lit("g").as("grp"),
      col("id").cast("double").as("v"))
    val got = Ops.histogramQuantiles(df, Seq("grp"), "v",
      lo = 0.0, hi = 1000.0, bins = 100, qs = Seq(0.5, 0.95)).head
    val q50 = got.getAs[Double]("q50"); val q95 = got.getAs[Double]("q95")
    assert(math.abs(q50 - 500.0) <= 10.0, s"q50=$q50") // one bin width
    assert(math.abs(q95 - 950.0) <= 10.0, s"q95=$q95")
    assert(got.getAs[Long]("n_rows") == 1000L)
    // out-of-range values clamp into edge bins instead of vanishing
    val clamped = Ops.histogramQuantiles(
      df.withColumn("v", col("v") - 500.0), Seq("grp"), "v",
      lo = 0.0, hi = 100.0, bins = 10, qs = Seq(0.5)).head
    assert(clamped.getAs[Long]("n_rows") == 1000L)
    // heavily skewed: 999 zeros + one far value — the target bin must win,
    // not a sparse tail bin's negative interpolant (regression: min() over
    // every qualifying bin let bin31 emit q50 = -3744)
    val skewed = spark.range(1000).select(lit("g").as("grp"),
      when(col("id") < 999, 0.0).otherwise(255.0).as("v"))
    val sg = Ops.histogramQuantiles(skewed, Seq("grp"), "v",
      lo = 0.0, hi = 256.0, bins = 32, qs = Seq(0.5, 0.95)).head
    val s50 = sg.getAs[Double]("q50"); val s95 = sg.getAs[Double]("q95")
    assert(s50 >= 0.0 && s50 <= 8.0, s"q50=$s50 must sit in the zero bin")
    assert(s95 >= 0.0 && s95 <= 8.0, s"q95=$s95 must sit in the zero bin")
  }

  test("saltedSum: equals the plain aggregation, two-stage plan") {
    val df = spark.range(100000).select(
      (col("id") % 3).cast("string").as("k"), // 3 hot keys
      (col("id") % 7).as("v"), col("id").as("rowkey"))
    val salted = Ops.saltedSum(df, Seq("k"), "v", col("rowkey"), salts = 16)
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = salted.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == plain)
    // two aggregation exchanges: (k, salt) then k
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") >= 2, plan)
  }

  test("saltedJoin: equals the plain join, keys carry the salt") {
    val big = spark.range(50000).select(
      when(col("id") % 10 < 5, lit(0L)).otherwise(col("id") % 10).as("k"),
      (col("id") % 13).as("v"), col("id").as("rowkey"))
    val small = spark.range(10).select(col("id").as("k"), (col("id") * 2).as("w"))
    val salted = Ops.saltedJoin(big, small, "k", col("rowkey"), salts = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("s"))
    val plain = big.join(small, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = salted.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == plain)
    // the join keys must include the salt — that is the whole spreading
    // mechanism; assert it survives optimization
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"join must key on the salt:\n$plan")
  }

  test("saltedJoin: NULL saltExpr rows still join (salt bucket 0)") {
    // a null salt value must not null the salt column — null never equals
    // the small side's exploded salts, which would silently drop the row
    val big = Seq((1L, Some(7L)), (1L, None), (2L, Some(3L)))
      .toDF("k", "rowkey")
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "w")
    val got = Ops.saltedJoin(big, small, "k", col("rowkey"), salts = 8)
    assert(got.count() == 3L, "the null-salt row must survive the join")
    val plain = big.join(small, "k").collect()
      .map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
    val saltedRows = got.collect()
      .map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
    assert(saltedRows == plain)
  }

  test("canonicalEdge orients start <= end") {
    val df = Seq(("B", "A", 1.0), ("A", "B", 2.0), ("C", "C", 3.0)).toDF("s", "e", "cap")
    val got = Ops.canonicalEdge(df, "s", "e")
      .groupBy("s", "e").agg(sum($"cap").as("cap")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(("A", "B", 3.0), ("C", "C", 3.0)))
  }

  test("recode: mapping applies, comma keys expand, unmatched pass through") {
    val mapping = Seq(("Deutschland, Germany", "DE"), ("France", "FR")).toDF("f", "to")
    val df = Seq("Deutschland", "Germany", "France", "Spain").toDF("c")
    val got = Ops.recode(df, "c", mapping, "f", "to").collect().map(_.getString(0))
    assert(got.toSeq == Seq("DE", "DE", "FR", "Spain"))
  }

  test("normalizePerGroup sums to 1 within each group") {
    val df = Seq(("g", 1.0), ("g", 3.0), ("h", 5.0)).toDF("g", "v")
    val got = Ops.normalizePerGroup(df, Seq("g"), "v", "share")
      .groupBy("g").agg(round(sum($"share"), 9).as("s")).collect()
    got.foreach(r => assert(r.getDouble(1) == 1.0))
  }

  test("dedupSuffix appends _n to repeat names only") {
    val df = Seq((1, "a"), (2, "a"), (3, "b")).toDF("id", "name")
    val got = Ops.dedupSuffix(df, "name", Seq($"id".asc))
      .orderBy("id").collect().map(_.getString(1))
    assert(got.toSeq == Seq("a", "a_1", "b"))
  }

  test("quantileNormalizePpm: percentile ranks within group, " +
      "deterministic ties, singleton group -> 0") {
    val rows = Seq(("g", 10L, 1L), ("g", 30L, 2L), ("g", 20L, 3L),
      ("g", 30L, 4L), ("h", 99L, 5L))
    val got = Ops.quantileNormalizePpm(rows.toDF("grp", "v", "id"),
        "grp", "v", "id").collect()
      .map(r => r.getLong(2) -> r.getLong(3)).toMap
    // g ranks by (v, id): 10->1, 20->2, 30(id2)->3, 30(id4)->4
    assert(got == Map(1L -> 0L, 3L -> 333333L, 2L -> 666666L,
      4L -> 1000000L, 5L -> 0L), s"got $got")
  }

  test("profile: one row per column with rows/nulls/distincts and " +
      "string-rendered extremes, single pass") {
    val df = Seq((Some(1L), Some("b")), (Some(1L), None),
      (Some(3L), Some("a"))).toDF("x", "s")
    val got = Ops.profile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.getString(4)), Option(r.getString(5)))))
      .toMap
    assert(got("x") == ((3L, 0L, 2L, Some("1"), Some("3"))))
    assert(got("s") == ((3L, 1L, 2L, Some("a"), Some("b"))))
    intercept[IllegalArgumentException] { Ops.profile(df, Seq.empty) }
  }

  test("trimmedMeanPpm: symmetric rank cut, outliers dropped, " +
      "deterministic ties, tiny groups vanish, trim refusal") {
    // group g: values 1..10 -> trim 20% cuts {1,2} and {9,10},
    // mean of 3..8 = 5.5 -> 5500000
    val rows = (1 to 10).map(i => ("g", i.toLong, i.toLong)) ++
      Seq(("h", 1000000L, 1L)) ++            // lone outlier group
      Seq(("t", 5L, 1L), ("t", 5L, 2L))      // ties cut by id
    val got = Ops.trimmedMeanPpm(rows.toDF("grp", "v", "id"),
        "grp", "v", "id", trimPct = 20).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got("g") == ((6L, 33L, 5500000L)))
    assert(got("h") == ((1L, 1000000L, 1000000000000L)))  // cut=0
    assert(got("t") == ((2L, 10L, 5000000L)))
    // trim 40% on n=2: cut = 0 (floor(2*40/100)=0) -> both kept;
    // trim 50% refuses
    intercept[IllegalArgumentException] {
      Ops.trimmedMeanPpm(rows.toDF("grp", "v", "id"), "grp", "v",
        "id", trimPct = 50)
    }
  }

  test("winsorizePpm: outliers clamp to the rank-cut boundary values, " +
      "rows preserved, trim 0 is identity") {
    val rows = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
      ("g", 4L, 4L), ("g", 100L, 5L))
    // n=5, cut = 5*20 div 100 = 1: lo = value@rank2 = 2, hi = @rank4 = 4
    val got = Ops.winsorizePpm(rows.toDF("grp", "v", "id"), "grp", "v",
        "id", trimPct = 20).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) == ((1L, 2L, 2L, 4L)), s"got $got")
    assert(got(3L) == ((3L, 3L, 2L, 4L)))
    assert(got(5L) == ((100L, 4L, 2L, 4L)))
    assert(got.size == 5, "winsorize preserves every row")
    val id0 = Ops.winsorizePpm(rows.toDF("grp", "v", "id"), "grp", "v",
        "id", trimPct = 0).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(id0 == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> 100L))
    intercept[IllegalArgumentException] {
      Ops.winsorizePpm(rows.toDF("grp", "v", "id"), "grp", "v", "id",
        trimPct = 50)
    }
  }

  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null) t else rootCause(t.getCause)

  test("groupOls: exact slope/intercept on a perfect line, " +
      "zero-variance x gives nulls not a fit, null refusal") {
    // y = 2x + 1 exactly: num = 3*34-6*15 = 12, den = 3*14-36 = 6
    val rows = Seq(("a", 1L, 3L), ("a", 2L, 5L), ("a", 3L, 7L),
      ("b", 4L, 9L), ("b", 4L, 11L)).toDF("g", "x", "y")
    val got = Ops.groupOls(rows, "g", "x", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(got("a") == ((3L, 12L, 6L, 2000000L, 1000L)), s"got $got")
    // b: x constant -> num = 2*80-8*20 = 0, den = 2*32-64 = 0
    assert(got("b") == ((2L, 0L, 0L, -1L, -1L)))
    val e = intercept[Exception] {
      Ops.groupOls(Seq(("a", 1L, Option.empty[Long])).toDF("g", "x", "y"),
        "g", "x", "y").collect()
    }
    assert(rootCause(e).getMessage.contains("groupOls: y"))
  }

  test("seasonalProfile: pmod-floor phases (pre-epoch ts), per-phase " +
      "means, index vs key mean, zero-sum key is null, refusal") {
    // slot 10ns, period 2: ts 0,20 -> phase 0; ts 10,-10 -> phase 1
    val rows = Seq(("k", 0L, 2L), ("k", 20L, 4L), ("k", 10L, 1L),
      ("k", -10L, 1L), ("z", 0L, 1L), ("z", 10L, -1L))
      .toDF("key", "ts", "v")
    val got = Ops.seasonalProfile(rows, "key", "ts", "v",
        slotNs = 10L, periodSlots = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    // key k: overall mean 2; phase 0 mean 3 -> 1.5e6; phase 1 mean 1
    assert(got(("k", 0L)) == ((2L, 6L, 3000L, 1500000L)), s"got $got")
    assert(got(("k", 1L)) == ((2L, 2L, 1000L, 500000L)))
    // key z sums to zero -> index undefined (null), means still emit
    assert(got(("z", 0L)) == ((1L, 1L, 1000L, -1L)))
    assert(got(("z", 1L)) == ((1L, -1L, -1000L, -1L)))
    val e = intercept[Exception] {
      Ops.seasonalProfile(Seq(("k", 0L, Option.empty[Long]))
        .toDF("key", "ts", "v"), "key", "ts", "v", 10L, 2).collect()
    }
    assert(rootCause(e).getMessage.contains("seasonalProfile value"))
    intercept[IllegalArgumentException] {
      Ops.seasonalProfile(rows, "key", "ts", "v", 0L, 2)
    }
  }

  test("giniPpm: equality 0, max-concentration (n-1)/n, textbook " +
      "half on {0,1}, all-zero null, negative refusal") {
    val rows = Seq(("eq", 5L), ("eq", 5L), ("eq", 5L),
      ("half", 0L), ("half", 1L),
      ("conc", 0L), ("conc", 0L), ("conc", 10L),
      ("zero", 0L), ("zero", 0L)).toDF("g", "v")
    val got = Ops.giniPpm(rows, "g", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got == Map(
      "eq" -> ((3L, 15L, 0L)),
      "half" -> ((2L, 1L, 500000L)),
      "conc" -> ((3L, 10L, 666666L)),
      "zero" -> ((2L, 0L, -1L))), s"got $got")
    val neg = intercept[Exception] {
      Ops.giniPpm(Seq(("g", -1L)).toDF("g", "v"), "g", "v").collect()
    }
    assert(rootCause(neg).getMessage.contains("negative value"))
    val nul = intercept[Exception] {
      Ops.giniPpm(Seq(("g", Option.empty[Long])).toDF("g", "v"),
        "g", "v").collect()
    }
    assert(rootCause(nul).getMessage.contains("giniPpm value"))
  }

  test("runsTest: exact run counts over (ts, tie) order, expected " +
      "runs lattice, single-row key, refusals") {
    // 0,0,1,1,1,0 -> 3 runs; n0=3, n1=3 -> mu = 1 + 2*9/6 = 4.0
    val rows = Seq(("k", 1L, 1L, 0L), ("k", 2L, 2L, 0L),
      ("k", 3L, 3L, 1L), ("k", 4L, 4L, 1L), ("k", 5L, 5L, 1L),
      ("k", 6L, 6L, 0L), ("solo", 1L, 7L, 1L))
      .toDF("key", "ts", "id", "v")
    val got = Ops.runsTest(rows, "key", "ts", "id", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map("k" -> ((6L, 3L, 3L, 3L, 4000L)),
      "solo" -> ((1L, 0L, 1L, 1L, 1000L))), s"got $got")
    // equal ts breaks on the tie column: 1 then 0 -> 2 runs
    val tie = Ops.runsTest(Seq(("t", 1L, 2L, 0L), ("t", 1L, 1L, 1L))
      .toDF("key", "ts", "id", "v"), "key", "ts", "id", "v")
      .collect()(0)
    assert(tie.getLong(4) == 2L)
    val bad = intercept[Exception] {
      Ops.runsTest(Seq(("k", 1L, 1L, 2L)).toDF("key", "ts", "id", "v"),
        "key", "ts", "id", "v").collect()
    }
    assert(rootCause(bad).getMessage.contains("outside {0,1}"))
    val nul2 = intercept[Exception] {
      Ops.runsTest(Seq(("k", 1L, 1L, Option.empty[Long]))
        .toDF("key", "ts", "id", "v"), "key", "ts", "id", "v")
        .collect()
    }
    assert(rootCause(nul2).getMessage.contains("runsTest value"))
  }

  test("seasonalProfile: a NULL key is a real group — its phases " +
      "fold against its own totals, not dropped (round-16 advice)") {
    val rows = Seq(
      (Option.empty[String], 0L, 10L), (Option.empty[String], 1L, 30L),
      (Some("k"), 0L, 5L))
      .toDF("key", "ts", "v")
    val got = Ops.seasonalProfile(rows, "key", "ts", "v",
        slotNs = 1L, periodSlots = 2).collect()
      .map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0),
        r.getLong(1)) -> ((r.getLong(3),
          if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(got.size == 3, s"null-key phases dropped: $got")
    // null key: mean 20; phase 0 index = 10/20, phase 1 = 30/20
    assert(got(("<null>", 0L)) == ((10L, 500000L)), s"got $got")
    assert(got(("<null>", 1L)) == ((30L, 1500000L)))
    assert(got(("k", 0L)) == ((5L, 1000000L)))
  }

  test("theilSen: outlier-proof lower-median slope on the truncated-" +
      "ppm lattice, truncation toward zero for negative slopes, " +
      "degenerate groups null, loud group-size contract") {
    // group g: a clean slope-2 line plus one wild outlier the OLS
    // line would chase; pairwise slopes (ppm, sorted):
    // [1e6, 1.5e6, 2e6, 11e6, 12.125e6, 13714285] -> lower median 2e6
    val rows = Seq(
      ("g", 1L, 1L), ("g", 2L, 3L), ("g", 3L, 4L), ("g", 10L, 100L),
      // group t: one pair with slope -2/3 — trunc toward zero gives
      // -666666 (floor would give -666667): pins the div semantics
      ("t", 0L, 1L), ("t", 3L, -1L),
      // group s: singleton; group v: vertical-only
      ("s", 5L, 5L), ("v", 7L, 1L), ("v", 7L, 2L))
      .toDF("grp", "x", "y")
    val got = Ops.theilSen(rows, "grp", "x", "y", maxN = 16).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3)))).toMap
    assert(got("g") == ((4L, 6L, 2000000L)), s"got ${got("g")}")
    assert(got("t") == ((2L, 1L, -666666L)), s"got ${got("t")}")
    assert(got("s") == ((1L, 0L, Long.MinValue)))
    assert(got("v") == ((2L, 0L, Long.MinValue)), s"got ${got("v")}")
    val big = intercept[Exception] {
      Ops.theilSen(Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L))
        .toDF("grp", "x", "y"), "grp", "x", "y", maxN = 2).collect()
    }
    assert(rootCause(big).getMessage.contains("rows > maxN"),
      rootCause(big).getMessage)
    val nul = intercept[Exception] {
      Ops.theilSen(Seq(("g", 1L, Option.empty[Long]))
        .toDF("grp", "x", "y"), "grp", "x", "y").collect()
    }
    assert(rootCause(nul).getMessage.contains("theilSen: y"))
  }

  test("spearmanRho: perfect monotone = the documented lattice edge " +
      "(999999 up, -1e6 down), ties on the doubled midranks, " +
      "constant series null") {
    // the stated sqrt-product edge: perfect +1 floors to 10^6 - 1
    val up = (1L to 5L).map(i => ("a", i, 2 * i)).toDF("g", "x", "y")
    assert(Ops.spearmanRho(up, "g", "x", "y").collect()(0)
      .getAs[Long]("rho_ppm") == 999999L)
    val down = (1L to 5L).map(i => ("a", i, -3 * i)).toDF("g", "x", "y")
    assert(Ops.spearmanRho(down, "g", "x", "y").collect()(0)
      .getAs[Long]("rho_ppm") == -1000000L)
    // hand-computed tie case: x=(1,1,2), y=(1,2,3) -> rho = 18/sqrt(432)
    val tied = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 3L))
      .toDF("g", "x", "y")
    assert(Ops.spearmanRho(tied, "g", "x", "y").collect()(0)
      .getAs[Long]("rho_ppm") == 866025L)
    val const = Seq(("a", 1L, 5L), ("a", 2L, 5L)).toDF("g", "x", "y")
    assert(Ops.spearmanRho(const, "g", "x", "y").collect()(0)
      .isNullAt(2), "constant y has no rank variance -> null")
  }

  test("kendallTauB: textbook 0.2 fixture, tie-corrected denominator, " +
      "dup-id and oversize refusals") {
    val xs = Seq(1L, 2L, 3L, 4L, 5L); val ys = Seq(3L, 4L, 1L, 2L, 5L)
    val df = xs.zip(ys).zipWithIndex.map { case ((x, y), i) =>
      ("a", i.toLong, x, y) }.toDF("g", "i", "x", "y")
    val r = Ops.kendallTauB(df, "g", "i", "x", "y").collect()(0)
    assert(r.getAs[Long]("concordant") == 6L &&
      r.getAs[Long]("discordant") == 4L)
    assert(r.getAs[Long]("tau_b_ppm") == 200000L)
    // ties: x=(1,1,2), y=(1,2,2) -> C=1, n1=n2=1, tau_b = 0.5
    val tied = Seq(("a", 0L, 1L, 1L), ("a", 1L, 1L, 2L),
      ("a", 2L, 2L, 2L)).toDF("g", "i", "x", "y")
    assert(Ops.kendallTauB(tied, "g", "i", "x", "y").collect()(0)
      .getAs[Long]("tau_b_ppm") == 500000L)
    val dup = intercept[Exception] {
      Ops.kendallTauB(Seq(("a", 1L, 1L, 1L), ("a", 1L, 2L, 2L))
        .toDF("g", "i", "x", "y"), "g", "i", "x", "y").collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate id"))
    val big = intercept[Exception] {
      Ops.kendallTauB((1L to 10L).map(i => ("a", i, i, i))
        .toDF("g", "i", "x", "y"), "g", "i", "x", "y", maxN = 8)
        .collect()
    }
    assert(rootCause(big).getMessage.contains("maxN=8"))
  }

  test("autocorr: alternating series reads -833333 at lag 1 and " +
      "666666 at lag 2; constant and short series null") {
    val df = Seq(1L, 0L, 1L, 0L, 1L, 0L).zipWithIndex
      .map { case (v, t) => ("a", t.toLong, v) }.toDF("g", "t", "v")
    assert(Ops.autocorr(df, "g", "t", "t", "v", 1).collect()(0)
      .getAs[Long]("acf_ppm") == -833333L)
    assert(Ops.autocorr(df, "g", "t", "t", "v", 2).collect()(0)
      .getAs[Long]("acf_ppm") == 666666L)
    val const = Seq(("a", 0L, 7L), ("a", 1L, 7L), ("a", 2L, 7L))
      .toDF("g", "t", "v")
    assert(Ops.autocorr(const, "g", "t", "t", "v", 1).collect()(0)
      .isNullAt(3), "zero variance -> null")
    val short = Seq(("a", 0L, 1L), ("a", 1L, 2L)).toDF("g", "t", "v")
    assert(Ops.autocorr(short, "g", "t", "t", "v", 5).collect()(0)
      .isNullAt(3), "n <= k -> null")
    val dup = intercept[Exception] {
      Ops.autocorr(Seq(("a", 1L, 0L, 5L), ("a", 1L, 0L, 6L))
        .toDF("g", "t", "tie", "v"), "g", "t", "tie", "v", 1)
        .collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate position"),
      s"got ${rootCause(dup).getMessage}")
  }

  test("rollingMedian: trailing lower medians, full windows only, " +
      "even w stays on the lattice, null refusal") {
    val df = Seq(5L, 1L, 9L, 3L, 7L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong + 1L, i.toLong, v) }
      .toDF("g", "t", "tie", "v")
    val w3 = Ops.rollingMedian(df, "g", "t", "tie", "v", 3)
      .orderBy("ts").collect()
    assert(w3.map(_.getAs[Long]("ts")).toSeq == Seq(3L, 4L, 5L),
      "partial head windows must not emit")
    assert(w3.map(_.getAs[Long]("med")).toSeq == Seq(5L, 3L, 7L))
    // even w: lower median = element (w+1)/2 = 2 of the sorted 4
    val w4 = Ops.rollingMedian(df, "g", "t", "tie", "v", 4)
      .orderBy("ts").collect()
    assert(w4.map(_.getAs[Long]("med")).toSeq == Seq(3L, 3L))
    val nul = intercept[Exception] {
      Ops.rollingMedian(Seq(("a", 1L, 0L, Option.empty[Long]))
        .toDF("g", "t", "tie", "v"), "g", "t", "tie", "v", 2)
        .collect()
    }
    assert(rootCause(nul).getMessage.contains("rollingMedian value"))
    intercept[IllegalArgumentException] {
      Ops.rollingMedian(df, "g", "t", "tie", "v", 1)
    }
    val dup = intercept[Exception] {
      Ops.rollingMedian(Seq(("a", 1L, 0L, 5L), ("a", 1L, 0L, 6L))
        .toDF("g", "t", "tie", "v"), "g", "t", "tie", "v", 2)
        .collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate position"),
      s"got ${rootCause(dup).getMessage}")
  }

  test("rollingMedianLarge == rollingMedian bit-for-bit on shared " +
      "fixtures; w=600 equals the plain-Scala sliding median; " +
      "lattice refusal") {
    // deterministic tie-rich series on a 13-value lattice, two keys
    val vals = (0 until 240).map(i =>
      ((i * 37 + (i * i) % 11) % 13).toLong)
    val df = (vals.zipWithIndex.map { case (v, i) =>
        ("a", i.toLong, 0L, v) } ++
      vals.take(50).zipWithIndex.map { case (v, i) =>
        ("b", i.toLong, 0L, v + 100L) })
      .toDF("g", "t", "tie", "v")
    for (w <- Seq(2, 3, 7, 50)) {
      val want = Ops.rollingMedian(df, "g", "t", "tie", "v", w)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      val got = Ops.rollingMedianLarge(df, "g", "t", "tie", "v", w)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      assert(got == want, s"w=$w")
    }
    // w = 600 — past rollingMedian's contract; plain-Scala reference
    val big = (0 until 800).map(i =>
      ("k", i.toLong, 0L, ((i * 53 + (i * i * i) % 17) % 9).toLong))
    val gotBig = Ops.rollingMedianLarge(big.toDF("g", "t", "tie", "v"),
        "g", "t", "tie", "v", 600).collect()
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    val vs = big.map(_._4)
    (599 until 800).foreach { i =>
      val sorted = vs.slice(i - 599, i + 1).sorted
      assert(gotBig(i.toLong) == sorted((600 + 1) / 2 - 1),
        s"t=$i")
    }
    assert(gotBig.size == 201)
    val wide = intercept[Exception] {
      Ops.rollingMedianLarge(
        Seq(("a", 1L, 0L, 0L), ("a", 2L, 0L, 99999L))
          .toDF("g", "t", "tie", "v"), "g", "t", "tie", "v", 2,
        maxLattice = 1024).collect()
    }
    assert(rootCause(wide).getMessage.contains("maxLattice=1024"),
      s"got ${rootCause(wide).getMessage}")
  }

  test("madPerGroup: hand fixture (1,2,3,4,100) -> median 3 mad 1; " +
      "even n takes the lower median") {
    val df = Seq(1L, 2L, 3L, 4L, 100L).map(("a", _))
      .toDF("g", "v")
    val r = Ops.madPerGroup(df, "g", "v").collect()(0)
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("median") == 3L)
    assert(r.getAs[Long]("mad") == 1L, "50% breakdown: the 100 is invisible")
    val even = Seq(1L, 2L, 3L, 4L).map(("b", _)).toDF("g", "v")
    val e = Ops.madPerGroup(even, "g", "v").collect()(0)
    assert(e.getAs[Long]("median") == 2L && e.getAs[Long]("mad") == 1L)
    val nul = intercept[Exception] {
      Ops.madPerGroup(Seq(("a", Option.empty[Long])).toDF("g", "v"),
        "g", "v").collect()
    }
    assert(rootCause(nul).getMessage.contains("madPerGroup value"))
  }

  test("robustOutliers: integer cross-multiplied fence flags only the " +
      "spike; mad=0 group flags every off-median row") {
    val df = Seq(1L, 2L, 3L, 4L, 100L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) }.toDF("g", "i", "v")
    // mad=1, k=3.5: |v-3|*1000 > 3500 -> only the 100 (dev 97)
    val got = Ops.robustOutliers(df, "g", "i", "v", 3500L).collect()
    assert(got.length == 1 && got(0).getAs[Long]("v") == 100L &&
      got(0).getAs[Long]("dev") == 97L)
    // frozen feed + glitch: mad=0 -> every row off the median flags
    val frozen = Seq(5L, 5L, 5L, 9L).zipWithIndex
      .map { case (v, i) => ("b", i.toLong, v) }.toDF("g", "i", "v")
    val f = Ops.robustOutliers(frozen, "g", "i", "v", 3500L).collect()
    assert(f.length == 1 && f(0).getAs[Long]("v") == 9L,
      "dev*1000 > k*0 flags exactly the off-median rows")
    intercept[IllegalArgumentException] {
      Ops.robustOutliers(df, "g", "i", "v", 0L)
    }
  }

  test("mannKendallTrend: hand-computed z for monotone, tied and " +
      "zero-S series; constant null; duplicate-position refusal") {
    def mk(vs: Seq[Long]) = vs.zipWithIndex
      .map { case (v, i) => ("a", i.toLong, i.toLong, v) }
      .toDF("g", "t", "e", "v")
    // up: S=10, var18=300, z = 9000/sqrt(300/18) = 2204.54 -> 2204
    val up = Ops.mannKendallTrend(mk(Seq(1L, 2L, 3L, 4L, 5L)),
      "g", "t", "e", "v").collect()(0)
    assert(up.getAs[Long]("s") == 10L &&
      up.getAs[Long]("var_num18") == 300L &&
      up.getAs[Long]("z_milli") == 2204L)
    // down: floor(-2204.54) = -2205 (floor, not truncate — stated)
    assert(Ops.mannKendallTrend(mk(Seq(5L, 4L, 3L, 2L, 1L)),
      "g", "t", "e", "v").collect()(0)
      .getAs[Long]("z_milli") == -2205L)
    // ties (1,1,2): S=2, var18 = 66-18 = 48, z = 1000/1.63299 = 612
    val tied = Ops.mannKendallTrend(mk(Seq(1L, 1L, 2L)),
      "g", "t", "e", "v").collect()(0)
    assert(tied.getAs[Long]("s") == 2L &&
      tied.getAs[Long]("var_num18") == 48L &&
      tied.getAs[Long]("z_milli") == 612L)
    // S=0 with variance -> exactly 0; all-tied -> var 0 -> null
    assert(Ops.mannKendallTrend(mk(Seq(1L, 2L, 1L)),
      "g", "t", "e", "v").collect()(0).getAs[Long]("z_milli") == 0L)
    assert(Ops.mannKendallTrend(mk(Seq(7L, 7L, 7L)),
      "g", "t", "e", "v").collect()(0).isNullAt(4))
    val dup = intercept[Exception] {
      Ops.mannKendallTrend(Seq(("a", 1L, 1L, 1L), ("a", 1L, 1L, 2L))
        .toDF("g", "t", "e", "v"), "g", "t", "e", "v").collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate position"))
    val big = intercept[Exception] {
      Ops.mannKendallTrend(mk((1L to 10L).toSeq), "g", "t", "e", "v",
        maxN = 8).collect()
    }
    assert(rootCause(big).getMessage.contains("maxN=8"))
  }

  test("hhiPpm: 3:1 split reads 625000, monopoly 1e6, null category " +
      "refusal") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "z"), ("b", "z")).toDF("g", "c")
    val got = Ops.hhiPpm(df, "g", "c").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"),
        r.getAs[Long]("n_categories"), r.getAs[Long]("hhi_ppm")))
      .toMap
    assert(got("a") == ((4L, 2L, 625000L)), s"got $got")
    assert(got("b") == ((2L, 1L, 1000000L)))
    val nul = intercept[Exception] {
      Ops.hhiPpm(Seq(("a", Option.empty[String])).toDF("g", "c"),
        "g", "c").collect()
    }
    assert(rootCause(nul).getMessage.contains("null category"))
  }

  test("associationRules: hand support/confidence/lift lattice, " +
      "duplicate membership collapses, threshold cuts after exact " +
      "counts, basket-size refusal") {
    val df = Seq(("b1", "A"), ("b1", "A"), ("b1", "B"), ("b1", "C"),
      ("b2", "A"), ("b2", "B"), ("b3", "A"), ("b4", "B"),
      ("b4", "C")).toDF("bk", "it")
    val got = Ops.associationRules(df, "bk", "it",
      minSupportPpm = 300000L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("support_ppm"),
          r.getAs[Long]("confidence_ppm"), r.getAs[Long]("lift_ppm"))))
      .toMap
    // N=4, n_A=3, n_B=3, n_C=2; AB=2, BC=2, AC=1 (cut at 300000)
    assert(got(("A", "B")) == ((500000L, 666666L, 888888L)),
      s"got $got")
    assert(got(("B", "A")) == ((500000L, 666666L, 888888L)))
    assert(got(("C", "B")) == ((500000L, 1000000L, 1333333L)))
    assert(got(("B", "C")) == ((500000L, 666666L, 1333333L)))
    assert(!got.contains(("A", "C")) && !got.contains(("C", "A")),
      "support 250000 < 300000: cut after counting")
    val big = intercept[Exception] {
      Ops.associationRules(df, "bk", "it", 0L,
        maxItemsPerBasket = 2).collect()
    }
    assert(rootCause(big).getMessage.contains("maxItemsPerBasket=2"))
    val nul = intercept[Exception] {
      Ops.associationRules(Seq(("b", Option.empty[String]))
        .toDF("bk", "it"), "bk", "it", 0L).collect()
    }
    assert(rootCause(nul).getMessage.contains("null item"))
  }

  test("weightedMedianPerGroup: reduces to the lower median at " +
      "w=1, weight mass moves the answer, non-positive refusal") {
    val unit = Seq(1L, 2L, 3L, 4L, 100L).map(("a", _, 1L))
      .toDF("g", "v", "w")
    val r = Ops.weightedMedianPerGroup(unit, "g", "v", "w")
      .collect()(0)
    assert(r.getAs[Long]("wmedian") == 3L &&
      r.getAs[Long]("n") == 5L && r.getAs[Long]("w_total") == 5L)
    val heavy = Seq(("b", 1L, 9L), ("b", 10L, 1L),
      ("c", 1L, 1L), ("c", 10L, 9L)).toDF("g", "v", "w")
    val got = Ops.weightedMedianPerGroup(heavy, "g", "v", "w")
      .collect().map(x => x.getString(0) -> x.getAs[Long]("wmedian"))
      .toMap
    assert(got == Map("b" -> 1L, "c" -> 10L), s"got $got")
    val zero = intercept[Exception] {
      Ops.weightedMedianPerGroup(Seq(("a", 1L, 0L)).toDF("g", "v", "w"),
        "g", "v", "w").collect()
    }
    assert(rootCause(zero).getMessage.contains("not positive"))
  }

  test("hillTailIndex: dyadic tail reads exactly the ln-lattice " +
      "mean 1386294; short group null; non-positive refusal") {
    val df = (Seq(1000L, 500L, 250L, 125L, 100L, 90L).map(("a", _))
      ++ Seq(5L, 4L, 3L).map(("b", _))).toDF("g", "v")
    val got = Ops.hillTailIndex(df, "g", "v", k = 3).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    // terms ln8/ln4/ln2 over x_k1=125: (2079441+1386294+693147)/3
    assert(a.getAs[Long]("x_k1") == 125L &&
      a.getAs[Long]("hill_micro") == 1386294L, s"got $a")
    val b = got("b")
    assert(b.getAs[Long]("n") == 3L && b.isNullAt(3) && b.isNullAt(4),
      "fewer than k+1 rows: visible null row")
    val bad = intercept[Exception] {
      Ops.hillTailIndex(Seq(("a", 0L)).toDF("g", "v"), "g", "v", 1)
        .collect()
    }
    assert(rootCause(bad).getMessage.contains("< 1"))
  }

  test("npsPerGroup: band edges at 9 and 7, balanced survey reads " +
      "0, all-detractor reads -1e6; out-of-scale refusal") {
    val df = Seq(10L, 9L, 8L, 7L, 6L, 0L).map(("a", _))
      .toDF("g", "s")
    val a = Ops.npsPerGroup(df, "g", "s").collect()(0)
    assert(a.getAs[Long]("promoters") == 2L &&
      a.getAs[Long]("passives") == 2L &&
      a.getAs[Long]("detractors") == 2L &&
      a.getAs[Long]("nps_ppm") == 0L)
    val got = Ops.npsPerGroup(
      (Seq(10L, 10L, 6L).map(("b", _)) ++ Seq(0L, 0L).map(("c", _)))
        .toDF("g", "s"), "g", "s").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("nps_ppm")).toMap
    assert(got == Map("b" -> 333333L, "c" -> -1000000L), s"got $got")
    val bad = intercept[Exception] {
      Ops.npsPerGroup(Seq(("a", 11L)).toDF("g", "s"), "g", "s")
        .collect()
    }
    assert(rootCause(bad).getMessage.contains("outside [0, 10]"))
  }
}
