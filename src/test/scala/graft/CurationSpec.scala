package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate flags exactly the docs sharing an n-gram") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely different sentence with no overlap here"),
      (3L, "we observed the quick brown fox in the wild"),
      (4L, "quick brown unrelated padding words everywhere")) // only a 2-gram
      .toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox ran")).toDF("doc_id", "text")
    val hits = Curation.decontaminate(docs, "doc_id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 and 3 share "the quick brown"/"quick brown fox"; 2 and 4 do not
    assert(hits.keySet == Set(1L, 3L))
    assert(hits(1L) == 2) // both trigrams leak
    val clean = Curation.decontaminated(docs, "doc_id", "text", bench, "text", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 4L))
  }

  test("hashSample is deterministic, key-stable and roughly proportional") {
    val df = spark.range(10000).toDF("id")
    val a = Curation.hashSample(df, "id", 0.25).select("id").as[Long].collect().toSet
    val b = Curation.hashSample(df, "id", 0.25).select("id").as[Long].collect().toSet
    assert(a == b) // pure function of the key
    assert(math.abs(a.size - 2500) < 250) // ~binomial tolerance
    // monotone in fraction: smaller sample is a subset of the larger
    val small = Curation.hashSample(df, "id", 0.1).select("id").as[Long].collect().toSet
    assert(small.subsetOf(a.union(small))) // same rule, threshold only
    assert(Curation.hashSample(df, "id", 0.1)
      .filter(not(Curation.sampleBucket(col("id")) <
        lit((0.25 * (1L << 31)).toLong))).count() == 0)
  }

  test("stratifiedHashSample applies per-stratum fractions; absent stratum drops") {
    val df = spark.range(8000)
      .select(col("id"), (when(col("id") % 2 === 0, "a").otherwise("b")).as("s"))
    val fr = Seq(("a", 1.0), ("c", 0.5)).toDF("s", "fraction")
    val got = Curation.stratifiedHashSample(df, "id", "s", fr)
    assert(got.filter(col("s") === "b").count() == 0) // no fraction -> dropped
    assert(got.filter(col("s") === "a").count() == 4000) // fraction 1.0 keeps all
  }

  test("clipContaminatedSpans excises exactly the leaked benchmark " +
      "passage, keeps clean docs and null text intact") {
    val docs = Seq(
      (1L, "intro words here The Secret Benchmark Answer is X trailing content"),
      (2L, "totally clean document with nothing leaked at all"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val bench = Seq("the secret benchmark answer is x").toDF("text")
    val out = Curation.clipContaminatedSpans(docs, "doc_id", "text",
        bench, "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)), r.getLong(2))).toMap
    assert(out(1L) == ("intro words here trailing content", 6L), out(1L))
    assert(out(2L) ==
      ("totally clean document with nothing leaked at all", 0L), out(2L))
    assert(out(3L) == ((null, 0L)), out(3L))
  }

  test("temperatureMix: τ=1 keeps natural shares, τ→0 flattens; " +
      "budgets sum within rounding of the total") {
    // two domains, big 9× the mass of small
    val docs = (0L until 90L).map(i => (i, "big", 100L))
      .++((100L until 110L).map(i => (i, "small", 100L)))
      .toDF("doc_id", "source", "toks")
    def taken(tau: Double): Map[String, Long] =
      Curation.temperatureMix(docs, "doc_id", "toks", "source",
          totalBudget = 5000L, tau = tau)
        .groupBy("source").agg(sum("toks").as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val natural = taken(1.0)
    // τ=1: shares ∝ mass → big 4500, small 500 (docs are 100-token atoms)
    assert(natural("big") == 4500L && natural("small") == 500L, s"$natural")
    val flat = taken(0.5)
    // τ=0.5: shares ∝ sqrt(mass) = 3:1 → budgets 3750/1250; big cuts to
    // 3700 (100-token atoms), small is capped by its 1000-token inventory
    assert(flat("big") == 3700L && flat("small") == 1000L, s"$flat")
    // τ <= 0 refuses
    intercept[IllegalArgumentException] {
      Curation.temperatureMix(docs, "doc_id", "toks", "source", 5000L, 0.0)
    }
    // a NULL source domain is a contract error, not an opaque NPE in the
    // driver-side normalizer sort
    val withNull = docs.unionByName(
      Seq((500L, null.asInstanceOf[String], 100L))
        .toDF("doc_id", "source", "toks"))
    val e = intercept[IllegalArgumentException] {
      Curation.temperatureMix(withNull, "doc_id", "toks", "source", 5000L, 1.0)
    }
    assert(e.getMessage.contains("null"), e.getMessage)
  }

  test("packSequences: bins respect the budget up to one doc of overshoot") {
    val docs = spark.range(500).select(col("id").as("doc_id"),
      (col("id") % 4).as("shard"),
      (col("id") % 97 + 5).cast("long").as("toks"))
    val packed = Curation.packSequences(docs, "doc_id", "toks", 200, "shard")
    val stats = Curation.packingStats(packed, "toks", 200, "shard")
    val fills = stats.select("fill").as[Long].collect()
    // cumulative-sum packing: a bin never exceeds budget + max single doc
    assert(fills.forall(_ <= 200 + 101))
    // every bin except possibly the last per shard is at least half full
    val lastBins = stats.groupBy("shard").agg(max("bin").as("last"))
      .withColumnRenamed("shard", "shard2")
    val nonLast = stats.join(lastBins,
      col("shard") === col("shard2") && col("bin") =!= col("last"))
    assert(nonLast.filter(col("fill") < 100).count() == 0)
    // no doc lost or duplicated
    assert(packed.count() == 500)
    assert(packed.select("doc_id").distinct().count() == 500)
  }

  test("packSequences gives oversized docs their own bin space") {
    val docs = Seq((1L, 0L, 50L), (2L, 0L, 9999L), (3L, 0L, 50L))
      .toDF("doc_id", "shard", "toks")
    val packed = Curation.packSequences(docs, "doc_id", "toks", 100, "shard")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    // doc 2 clamps to the budget, filling its window alone
    assert(packed(2L) != packed(3L))
  }

  test("redactPii scrubs and counts emails, phones, SSNs in order") {
    val docs = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org now"),
      (2L, "call (555) 123-4567 or 555.987.6543"),
      (3L, "ssn 123-45-6789 phone 555-123-4567"),
      (4L, "nothing sensitive here"))
      .toDF("doc_id", "text")
    val got = Curation.redactPii(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"),
          r.getAs[Long]("n_ssn")), r.getAs[String]("text"))).toMap
    assert(got(1L)._1 == ((2L, 0L, 0L)))
    assert(got(1L)._2 == "mail <EMAIL> and <EMAIL> now")
    assert(got(2L)._1 == ((0L, 2L, 0L)))
    assert(got(3L)._1 == ((0L, 1L, 1L))) // SSN not double-counted as phone
    assert(got(3L)._2 == "ssn <SSN> phone <PHONE>")
    assert(got(4L)._1 == ((0L, 0L, 0L)))
  }

  test("repeatedSpans: island merge, cross- and within-doc repeats, minCount") {
    // doc 1 and 2 share the 8-token run a..h → every 3-gram inside it
    // repeats; the islands [0,8) (doc 1) and [2,10) (doc 2) must come out
    // MERGED, not as six 3-gram fragments. doc 3 repeats a 3-gram WITHIN
    // itself (positions 0 and 5 — disjoint islands). doc 4 is clean.
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e f g h z"),
      (3L, "p q r s t p q r u v"),
      (4L, "one two three four five six seven"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Curation.repeatedSpans(docs, "doc_id", "text", n = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 0L, 8L),  // whole shared run, merged
      (2L, 2L, 10L), // same run at its shifted offset
      (3L, 0L, 3L), (3L, 5L, 8L)), // within-doc repeat, two islands
      s"got $got")
    // minCount above the repeat multiplicity → nothing survives
    assert(Curation.repeatedSpans(docs, "doc_id", "text", n = 3,
      minCount = 3).count() == 0)
    // adjacency merges: doc 6's [0,3) and [3,6) touch (pos == prevMax) —
    // one island, because together they form one contiguous repeated run
    val adj = Seq(
      (6L, "a b c d e f"),
      (7L, "a b c q w e"),
      (8L, "r t y d e f"))
      .toDF("doc_id", "text")
    val got2 = Curation.repeatedSpans(adj, "doc_id", "text", n = 3, minCount = 2)
      .filter(col("doc_id") === 6L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got2 == Set((0L, 6L)), s"adjacent islands must merge: $got2")
  }
  test("topQualityPerGroup: rank cut per group, no cross-group " +
      "calibration, id tie-breaks") {
    import spark.implicits._
    // group a: scores 1..8; group b: scores all 0.5 except one 0.9 —
    // a global threshold would wipe out group b entirely
    val rows = (1 to 8).map(i => (i.toLong, "a", i.toDouble / 10)) ++
      (11 to 17).map(i => (i.toLong, "b", 0.5)) :+ (18L, "b", 0.9)
    val df = rows.toDF("id", "g", "score")
    val kept = Curation.topQualityPerGroup(df, "g", "score", "id", 0.75)
      .collect().map(r => r.getLong(0)).toSet
    // a: percent_rank = (rank-1)/7 >= .75 → ranks 7, 8 → scores .7, .8
    assert(kept.intersect(Set(1L, 2L, 3L, 4L, 5L, 6L)).isEmpty &&
      kept.contains(7L) && kept.contains(8L), s"$kept")
    // b: ties rank by id — ids 17 (rank 7) and 18 (rank 8) survive
    assert(kept.intersect((11L to 16L).toSet).isEmpty &&
      kept.contains(17L) && kept.contains(18L), s"$kept")
    // minPercentile 0 keeps everything, 1.0 keeps exactly the per-group max
    assert(Curation.topQualityPerGroup(df, "g", "score", "id", 0.0)
      .count() == 16)
    assert(Curation.topQualityPerGroup(df, "g", "score", "id", 1.0)
      .collect().map(_.getLong(0)).toSet == Set(8L, 18L))
  }

  test("topQualityPerGroupAtScale: bit-identical to the window form on a " +
      "DOMINANT source with heavy ties; no raw-row sort in the plan") {
    import spark.implicits._
    // dominant source: 5000 rows in one group (the 100 TB straggler
    // shape), 12-point score lattice so the threshold score carries a
    // big tie set; two small groups incl. a 1-row group (percent_rank 0)
    val rows = (0 until 5000).map(i =>
        (i.toLong, "big", (i % 12).toDouble / 100)) ++
      (9000 to 9007).map(i => (i.toLong, "small", (i % 3).toDouble / 10)) :+
      (9900L, "solo", 0.4)
    val df = rows.toDF("id", "g", "score")
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val want = Curation.topQualityPerGroup(df, "g", "score", "id", p)
        .collect().map(_.getLong(0)).toSet
      val got = Curation.topQualityPerGroupAtScale(df, "g", "score", "id", p)
        .collect().map(_.getLong(0)).toSet
      assert(got == want,
        s"p=$p: scale form diverges — missing ${want -- got}, " +
          s"extra ${got -- want}")
    }
    // plan shape: thresholds reach the corpus as a BROADCAST, and the
    // only window over raw rows is the threshold-score tie residual
    val plan = Curation.topQualityPerGroupAtScale(df, "g", "score", "id",
      0.75).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "thresholds must broadcast, not shuffle the corpus")
  }

  test("topQualityAtScale: identical to the grouped form under one " +
      "constant group, and its plan has NO partitionless window") {
    import spark.implicits._
    val rows = (0 until 5000).map(i =>
      (i.toLong, (i % 12).toDouble / 100)) :+ (9900L, 0.4)
    val df = rows.toDF("id", "score")
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 1.0)) {
      val want = Curation.topQualityPerGroupAtScale(
          df.withColumn("g", lit("all")), "g", "score", "id", p)
        .collect().map(_.getLong(0)).toSet
      val got = Curation.topQualityAtScale(df, "score", "id", p)
        .collect().map(_.getLong(0)).toSet
      assert(got == want, s"p=$p diverges")
    }
    // 1-row edge: percent_rank 0 — kept only at p = 0
    val one = Seq((1L, 0.5)).toDF("id", "score")
    assert(Curation.topQualityAtScale(one, "score", "id", 0.0).count() == 1)
    assert(Curation.topQualityAtScale(one, "score", "id", 0.5).count() == 0)
    // every WindowExec in the plan carries a real partition spec
    val plan = Curation.topQualityAtScale(df, "score", "id", 0.75)
      .queryExecution.executedPlan.toString
    val bad = plan.split('\n').filter(l =>
      l.contains("windowspecdefinition") && {
        val first = l.split("windowspecdefinition\\(")(1).split(",")(0)
        first.contains(" ASC") || first.contains(" DESC")
      })
    assert(bad.isEmpty, s"partitionless window in plan:\n${bad.mkString}")
  }

  test("dsirWeights: target-like docs outscore junk; hand-check; resample " +
      "is deterministic and favors high weights") {
    import spark.implicits._
    // target corpus: documents about one tight topic
    val target = Seq(
      (100L, "solar panel energy yield model"),
      (101L, "wind energy capacity model output"),
      (102L, "solar energy model yield")).toDF("doc_id", "text")
    // raw corpus: 5 target-like docs, 5 junk docs, one blank
    val raw = Seq(
      (1L, "solar energy model"), (2L, "wind energy yield model"),
      (3L, "solar panel capacity yield"), (4L, "energy model output"),
      (5L, "wind solar energy"),
      (6L, "zzz qqq vvv kkk"), (7L, "lorem ipsum dolor sit"),
      (8L, "qqq kkk zzz"), (9L, "unrelated filler junk noise"),
      (10L, "vvv lorem qqq"), (11L, "   ")).toDF("doc_id", "text")
    val byId = Curation.dsirWeights(raw, target, "doc_id", "text",
      nBuckets = 4096).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // blank doc dropped; every target-like doc outweighs every junk doc
    assert(!byId.contains(11L), s"blank doc must be dropped: $byId")
    val tgtLike = (1L to 5L).map(byId(_)._1)
    val junk = (6L to 10L).map(byId(_)._1)
    assert(tgtLike.min > junk.max,
      s"target-like ${tgtLike.toSeq} must all outscore junk ${junk.toSeq}")
    // n_features = unigrams + bigrams = 2·n−1 for an n-token doc
    assert(byId(1L)._2 == 5 && byId(6L)._2 == 7, s"$byId")
    // hand-check doc 8 ("qqq kkk zzz", 4096 buckets — no collisions at
    // this size): all 5 features unseen in target (count 0), each raw
    // count from the corpus; alpha=1, T_t = 2·5·3−3... compute directly
    val alpha = 1.0; val b = 4096
    def polyMod(s: String) = graft.functions.TextFns.polyHash(s) % b
    val tgtFeats = Seq("solar panel energy yield model",
      "wind energy capacity model output", "solar energy model yield")
      .flatMap { t => val ts = t.split("\\s+").toSeq
        ts.map(polyMod) ++ ts.sliding(2).map(p => polyMod(p.mkString(" "))) }
    val rawFeats = Seq("solar energy model", "wind energy yield model",
      "solar panel capacity yield", "energy model output",
      "wind solar energy", "zzz qqq vvv kkk", "lorem ipsum dolor sit",
      "qqq kkk zzz", "unrelated filler junk noise", "vvv lorem qqq")
      .flatMap { t => val ts = t.split("\\s+").toSeq
        ts.map(polyMod) ++ ts.sliding(2).map(p => polyMod(p.mkString(" "))) }
    val tCnt = tgtFeats.groupBy(identity).view.mapValues(_.size).toMap
    val rCnt = rawFeats.groupBy(identity).view.mapValues(_.size).toMap
    val doc8 = { val ts = Seq("qqq", "kkk", "zzz")
      ts.map(polyMod) ++ ts.sliding(2).map(p => polyMod(p.mkString(" "))) }
    val expected = doc8.map { f =>
      math.log((tCnt.getOrElse(f, 0) + alpha) / (tgtFeats.size + alpha * b)) -
        math.log((rCnt.getOrElse(f, 0) + alpha) / (rawFeats.size + alpha * b))
    }.sum
    assert(math.abs(byId(8L)._1 - expected) < 1e-9,
      s"doc 8 weight ${byId(8L)._1} != hand-computed $expected")
    // resample: deterministic, exactly k rows, biased toward target-like
    val s1 = Curation.dsirResample(raw, target, "doc_id", "text", k = 4,
      nBuckets = 4096).collect().map(_.getLong(0)).toSeq
    val s2 = Curation.dsirResample(raw, target, "doc_id", "text", k = 4,
      nBuckets = 4096).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "resample must be exactly re-runnable")
    assert(s1.length == 4 && s1.count(_ <= 5L) >= 3,
      s"Gumbel-top-k must favor the high-weight docs: $s1")
  }


  test("gopherQualityFlags: each planted defect fails exactly its rule") {
    import graft.operators.Curation
    import spark.implicits._
    val good = ((1 to 56).map(i => s"word${i % 19}") ++
      Seq("the", "of", "and", "that")).mkString(" ")
    val docs = Seq(
      (0L, good), // passes all six
      (1L, "too few words the of"), // r_words only
      (2L, good.split(" ").map(w =>
        if (w.startsWith("word")) w + "unreasonablylong" else w)
        .mkString(" ")), // mean wlen > 10
      (3L, good + " ##### ##### ##### #####"), // 20 symbol chars, only
      // 4 non-alpha tokens so the alpha rule still passes
      (4L, ((1 to 48).map(i => s"${i}23") ++ (1 to 8).map(_ => "the") ++
        Seq("of", "and", "that")).mkString(" ")), // <80% alpha words
      (5L, (1 to 60).map(i => s"word${i % 19}").mkString(" ")), // no stops
      (6L, (Seq.fill(30)("dup gram") ++ (1 to 10).map(i => s"w$i") ++
        Seq("the", "of")).flatMap(_.split(" ")).mkString(" ")) // top bigram
    ).toDF("doc_id", "text")
    val f = Curation.gopherQualityFlags(docs, "doc_id", "text",
        minWords = 50, minStops = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(f(0L) == ((1L, 1L, 1L, 1L, 1L, 1L, 1L)), s"doc0 ${f(0L)}")
    assert(f(1L)._1 == 0L && f(1L)._7 == 0L)
    assert(f(2L)._2 == 0L, s"doc2 ${f(2L)}")
    assert(f(3L)._3 == 0L, s"doc3 ${f(3L)}")
    assert(f(4L)._4 == 0L, s"doc4 ${f(4L)}")
    assert(f(5L)._5 == 0L, s"doc5 ${f(5L)}")
    assert(f(6L)._6 == 0L, s"doc6 ${f(6L)}")
    // the planted defect is the ONLY failed rule for docs 2..6
    Seq(2L, 3L, 4L, 5L, 6L).foreach { id =>
      val flags = Seq(f(id)._1, f(id)._2, f(id)._3, f(id)._4, f(id)._5,
        f(id)._6)
      assert(flags.count(_ == 0L) == 1, s"doc $id flags $flags")
    }
  }

  test("gopherRepetitionFlags: coverage merges overlaps; planted " +
      "repetition fails exactly its n; clean doc passes all nine") {
    import graft.operators.Curation
    import spark.implicits._
    // doc 1: a 6-token phrase repeated 3 times inside unique filler —
    // every 5- and 6-gram inside the copies repeats, so the dup5/dup6
    // coverage is the MERGED span (overlap must not double-count chars
    // beyond the island length). 18 of 48 tokens covered -> far over
    // the 15%/14% caps; 7..10-grams spanning copy+filler are unique.
    val phrase = "alpha bravo charlie delta echo foxtrot"
    val fill = (1 to 10).map(i => s"u$i")
    val d1 = (fill.take(4) ++ phrase.split(" ") ++ fill.slice(4, 8) ++
      phrase.split(" ") ++ fill.slice(8, 10) ++ phrase.split(" ") ++
      (11 to 30).map(i => s"v$i")).mkString(" ")
    // doc 2: clean — all tokens distinct
    val d2 = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val got = Curation.gopherRepetitionFlags(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (2 to 10).zipWithIndex.map { case (_, j) => r.getLong(2 + j) })
      .toMap
    // doc 2 passes everything
    assert(got(2L).forall(_ == 1L), s"clean doc flags ${got(2L)}")
    // doc 1 fails dup5 and dup6 (indices 3 and 4), passes dup7..dup10
    assert(got(1L)(3) == 0L && got(1L)(4) == 0L, s"doc1 ${got(1L)}")
    assert((5 to 8).forall(j => got(1L)(j) == 1L), s"doc1 ${got(1L)}")
  }

  test("distinctiveTermsPerGroup surfaces source-specific vocabulary " +
      "with exact integer lift, shared vocabulary never flagged") {
    // "shared" appears uniformly everywhere; "medical" only in src_a,
    // "legal" only in src_b, both above minCount
    val a = (1 to 10).map(i => s"medical shared filler_a$i").mkString(" ")
    val b = (1 to 10).map(i => s"legal shared filler_b$i").mkString(" ")
    val docs = Seq((1L, a, "src_a"), (2L, b, "src_b"))
      .toDF("doc_id", "text", "source")
    val got = Curation.distinctiveTermsPerGroup(docs, "text", "source",
      minCount = 5L, liftNum = 2L, liftDen = 1L, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // N = 60, each source 30 tokens: "medical" lift = 10·60/(10·30) = 2
    assert(got.contains(("src_a", "medical")))
    assert(got.contains(("src_b", "legal")))
    val (cIn, cAll, nGrp, lift) = got(("src_a", "medical"))
    assert((cIn, cAll, nGrp) == ((10L, 10L, 30L)))
    assert(lift == 1000000L * 10L * 60L / (10L * 30L))
    assert(!got.keys.exists(_._2 == "shared"),
      "uniformly distributed term must not be distinctive")
  }
}

/** k-means IVF training: convergence and recall on separable clusters. */
class KMeansIvfSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import graft.operators.Similarity

  // 4 well-separated clusters in 8-d: center c has coordinate 10c in dim c
  def clustered() = {
    spark.range(400).select(col("id"),
      expr("transform(sequence(0, 7), d -> " +
        "CASE WHEN d = CAST(id % 4 AS INT) THEN 10.0 * (1 + id % 4) ELSE 0.0 END" +
        " + 0.01 * pmod(id * (d + 3), 7))").as("embedding"))
  }

  test("kmeansCentroids recovers separable cluster structure") {
    val vecs = clustered()
    val cents = Similarity.kmeansCentroids(vecs, "id", "embedding", k = 4, iters = 6)
    assert(cents.length == 4)
    // each true center (dominant dim c with value 10(c+1)) is represented:
    // some centroid has its max coordinate in dim c with magnitude near 10(c+1)
    val found = cents.map { c =>
      val m = c.indices.maxBy(c(_)); (m, c(m))
    }
    (0 until 4).foreach { cl =>
      assert(found.exists { case (d, v) => d == cl && math.abs(v - 10.0 * (cl + 1)) < 1.0 },
        s"cluster $cl not recovered: ${found.mkString(",")}")
    }
  }

  test("trained IVF finds the same top-k as brute force on clustered data") {
    val vecs = clustered()
    val query = (0 until 8).map(d => if (d == 2) 30.0 else 0.0) // cluster 2 center
    val brute = Similarity.bruteForceTopK(vecs, "id", "embedding", query, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val cents = Similarity.kmeansCentroids(vecs, "id", "embedding", 4, 6)
    val ivf = Similarity.ivfTopKTrained(vecs, "id", "embedding", query, 10,
      cents, nProbe = 1)
    val got = ivf.select("id").collect().map(_.getLong(0)).toSet
    assert(got == brute, s"recall loss: ${brute.diff(got)}") // 1 probe suffices: clusters separable
  }
}

/** Persisted IVF index: partition pruning + recall. */
class IvfIndexSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import graft.operators.Similarity

  test("writeIvfIndex + ivfTopKIndexed: pruned scan, exact recall on clusters") {
    val vecs = spark.range(400).select(col("id"),
      expr("transform(sequence(0, 7), d -> " +
        "CASE WHEN d = CAST(id % 4 AS INT) THEN 10.0 * (1 + id % 4) ELSE 0.0 END" +
        " + 0.01 * pmod(id * (d + 3), 7))").as("embedding"))
    val cents = Similarity.kmeansCentroids(vecs, "id", "embedding", 4, 6)
    val path = java.nio.file.Files.createTempDirectory("ivf").resolve("idx").toString
    Similarity.writeIvfIndex(vecs, "id", "embedding", cents, path)

    val query = (0 until 8).map(d => if (d == 1) 20.0 else 0.0)
    val probe = Similarity.ivfTopKIndexed(spark, path, "id", "embedding",
      query, 10, nProbe = 1)
    // the probe plan prunes partitions on __list
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__list"),
      s"expected partition-pruned scan:\n$plan")
    val brute = Similarity.bruteForceTopK(vecs, "id", "embedding", query, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val got = probe.select("id").collect().map(_.getLong(0)).toSet
    assert(got == brute)
  }
}

/** int8 quantization: round trip error bound + quantized search recall. */
class QuantizationSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import graft.functions.VectorFns

  def vecs() = spark.range(300).select(col("id"),
    expr("transform(sequence(0, 15), d -> " +
      "sin(CAST(id * (d + 1) AS DOUBLE) / 7.0) * (1.0 + pmod(id, 5)))").as("v"))

  test("quantize/dequantize error bounded by scale/254 per element") {
    val got = vecs()
      .withColumn("s", VectorFns.quantizeInt8(col("v")))
      .withColumn("back", VectorFns.dequantizeInt8(col("s")))
      .withColumn("err", expr(
        "aggregate(zip_with(v, back, (a, b) -> abs(a - b)), 0D, (m, e) -> greatest(m, e))"))
      .withColumn("bound", col("s.scale").cast("double") / 254.0 * 1.0001)
      .filter(col("err") > col("bound"))
    assert(got.count() == 0)
  }

  test("all-zero vector quantizes to scale 0 and survives cosine") {
    import spark.implicits._
    val z = Seq((1L, Seq.fill(8)(0.0)), (2L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
      .toDF("id", "v")
      .withColumn("s", VectorFns.quantizeInt8(col("v")))
    val rows = z.select(col("id"), col("s.scale"),
      VectorFns.cosineQuantized(col("s.q"), col("s.q")).as("self")).collect()
      .map(r => r.getLong(0) -> (r.getFloat(1), r.getDouble(2))).toMap
    assert(rows(1L)._1 == 0f && rows(1L)._2 == 0.0)
    assert(rows(2L)._2 == 1.0)
  }

  test("quantized cosine preserves top-k ordering within tolerance") {
    val data = vecs().withColumn("s", VectorFns.quantizeInt8(col("v")))
    val q = data.filter(col("id") === 7)
      .select(col("v"), col("s.q").as("qq")).head()
    val qv = q.getSeq[Double](0)
    val qq = q.getSeq[Byte](1)
    val exact = data.select(col("id"),
        VectorFns.cosine(col("v"), array(qv.map(lit): _*)).as("c"))
      .orderBy(desc("c"), asc("id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val quant = data.select(col("id"),
        VectorFns.cosineQuantized(col("s.q"),
          array(qq.map(b => lit(b)): _*)).as("c"))
      .orderBy(desc("c"), asc("id")).limit(20) // 2k slack: int8 ties
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(quant), s"missing: ${exact.diff(quant)}")
  }
}

/** Real image decode/resize on JDK ImageIO codecs. */
class ImageDecodeSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import graft.multimodal.Multimodal

  def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  test("decodeImage parses real PNG/JPEG headers and pixels") {
    import spark.implicits._
    val rows = Seq(
      (1L, png(32, 20, 0xffffff)), // white -> band0 mean 255
      (2L, png(8, 8, 0x000000)),   // black -> 0
      (3L, jpeg(17, 9)),
      (4L, Array.empty[Byte]),
      (5L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val got = Multimodal.withRealImageMeta(rows, "media")
      .select("doc_id", "width", "height", "format", "mean_band0")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got(1L) == ((Some(32), Some(20), Some("png"), Some(255))))
    assert(got(2L) == ((Some(8), Some(8), Some("png"), Some(0))))
    assert(got(3L)._1 == Some(17) && got(3L)._2 == Some(9) && got(3L)._3 == Some("jpeg"))
    assert(got(4L)._1.isEmpty && got(5L)._1.isEmpty) // nulls, not failures
  }

  test("resizeImage halves dimensions and re-encodes decodable PNG") {
    import spark.implicits._
    val rows = Seq((1L, png(40, 30, 0x808080))).toDF("doc_id", "media")
    val half = rows.select(Multimodal.resizeImage(col("media"), lit(50)).as("m"))
    val back = Multimodal.withRealImageMeta(half, "m")
      .select("width", "height", "format").head()
    assert(back.getInt(0) == 20 && back.getInt(1) == 15 && back.getString(2) == "png")
  }

  private def gradientPng(w: Int, h: Int, invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = x * 255 / math.max(1, w - 1)
      val v = if (invert) 255 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash64 is resize-invariant on the same content and " +
      "hammingPairs finds image near-dups but not the inverse") {
    import spark.implicits._
    import graft.operators.Dedup
    val rows = Seq(
      (1L, gradientPng(64, 64)),
      (2L, gradientPng(32, 32)),          // same content, resized
      (3L, gradientPng(64, 64, invert = true)),
      (4L, Array.empty[Byte]))            // undecodable → null, dropped
      .toDF("doc_id", "media")
    val hashed = Multimodal.withImageAHash(rows, "media")
      .select(col("doc_id"), col("ahash"))
    val hs = hashed.collect().map(r => r.getLong(0) ->
      Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(hs(4L).isEmpty)
    val hm12 = java.lang.Long.bitCount(hs(1L).get ^ hs(2L).get)
    val hm13 = java.lang.Long.bitCount(hs(1L).get ^ hs(3L).get)
    assert(hm12 <= 3, s"resized gradient drifted $hm12 bits")
    assert(hm13 > 20, s"inverted gradient too close: $hm13 bits")
    val pairs = Dedup.hammingPairs(
      hashed.select(col("doc_id"), col("ahash")), "doc_id", "ahash",
      bits = 64, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("chunkWindows: tail-preserving overlapping windows, short docs, blanks") {
    import spark.implicits._
    val text30 = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text30), (2L, "a b c"), (3L, "   "), (4L, null))
      .toDF("doc_id", "text")
    val got = Curation.chunkWindows(docs, "doc_id", "text", window = 16, stride = 12)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    // doc 1: chunks at 0, 12, 24 → sizes 16, 16, 6
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, 16L, "t1", "t16"),
      (1L, 1L, 16L, "t13", "t28"),
      (1L, 2L, 6L, "t25", "t30")))
    // short doc: exactly one chunk
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "a", "c")))
    // blank and null docs yield nothing
    assert(!got.exists(r => r._1 == 3L || r._1 == 4L))
  }

  test("semanticDecontaminate: planted near-dup flagged, orthogonal clean") {
    import spark.implicits._
    val bench = Seq((100L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.99, 0.1, 0.0, 0.0)),  // near the bench vector
      (2L, Seq(0.0, 0.0, 1.0, 0.0)),   // orthogonal
      (3L, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "embedding")
    val got = Curation.semanticDecontaminate(corpus, "vec_id", "embedding",
      bench, "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == Set(1L))
    assert(got(1L) == 1L)
  }

  test("unigramSurprisal: matches hand-computed corpus distribution") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Curation.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // counts: a=2 b=2 c=1, T=5
    val s1 = math.log(5.0 / 2) // all three tokens have C=2
    val s2 = (math.log(5.0 / 2) + math.log(5.0)) / 2
    assert(math.abs(got(1L)._1 - s1) < 1e-12 && got(1L)._2 == 3L)
    assert(math.abs(got(2L)._1 - s2) < 1e-12 && got(2L)._2 == 2L)
  }

  test("bigramSurprisal: repeated bigrams score fluent, singleton exact") {
    import spark.implicits._
    import graft.operators.Curation
    val docs = Seq(
      (1L, "x x x x"),   // bigram (x,x) ×3 — high P(x|x)
      (2L, "p q r s"),   // every bigram unique
      (3L, "z"))         // single token: unigram-only position
      .toDF("doc_id", "text")
    val got = Curation.bigramSurprisal(docs, "doc_id", "text", lambda = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2))).toMap
    assert(got(1L)._1 < got(2L)._1,
      s"repeated bigrams must score more fluent: ${got(1L)._1} vs ${got(2L)._1}")
    assert(got(1L)._2 == 4L && got(2L)._2 == 4L && got(3L)._2 == 1L)
    // d3: one token z, corpus t = 9 tokens, c(z) = 1 → -ln(1/9) exactly
    assert(math.abs(got(3L)._1 - (-math.log(1.0 / 9.0))) < 1e-12)
    // d1 position 2: λ·c(xx)/c(x) + (1−λ)·c(x)/t = 0.5·3/4 + 0.5·4/9
    val inner = 0.5 * 3.0 / 4.0 + 0.5 * 4.0 / 9.0
    val d1 = (-math.log(4.0 / 9.0) + 3.0 * -math.log(inner)) / 4.0
    assert(math.abs(got(1L)._1 - d1) < 1e-12, s"${got(1L)._1} vs $d1")
  }
}

class UrlLineDedupSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Curation

  test("registeredDomains: longest suffix wins, bare suffix and " +
      "unmatched hosts map to null") {
    val hosts = Seq("www.ex.com", "a.b.ex.co.uk", "co.uk", "weird.zz", null)
      .toDF("h")
    val sfx = Seq("com", "uk", "co.uk").toDF("s")
    val got = Curation.registeredDomains(hosts, "h", sfx, "s")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("www.ex.com") == Some("ex.com"))
    assert(got("a.b.ex.co.uk") == Some("ex.co.uk")) // co.uk beats uk
    assert(got("co.uk") == None)   // bare suffix
    assert(got("weird.zz") == None) // no suffix listed
  }

  test("registeredDomains: PSL wildcard and exception rules (*.ck / " +
      "!www.ck), comments and blanks ignored") {
    val hosts = Seq(
      "a.b.ck",       // *.ck -> public suffix b.ck -> registers a.b.ck
      "b.ck",         // IS a wildcard public suffix -> null
      "ck",           // wildcard needs one more label; no plain 'ck' rule
      "www.ck",       // exception: registers itself
      "sub.www.ck",   // exception covers subdomains -> www.ck
      "x.co.uk")      // plain rules unaffected
      .toDF("h")
    val sfx = Seq("co.uk", "*.ck", "!www.ck",
      "// a comment line", "", "  ").toDF("s")
    val got = Curation.registeredDomains(hosts, "h", sfx, "s")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("a.b.ck") == Some("a.b.ck"))
    assert(got("b.ck") == None)
    assert(got("ck") == None)
    assert(got("www.ck") == Some("www.ck"))
    assert(got("sub.www.ck") == Some("www.ck"))
    assert(got("x.co.uk") == Some("x.co.uk"))
  }

  test("registeredDomains: a real-format publicsuffix.org FILE loads " +
      "via spark.read.text — comments, blanks, wildcard and exception " +
      "rules straight off disk") {
    val dir = java.nio.file.Files.createTempDirectory("psl").toFile
    val f = new java.io.File(dir, "public_suffix_list.dat")
    val pw = new java.io.PrintWriter(f, "UTF-8")
    pw.println("// This Source Code Form is subject to the terms...")
    pw.println("")
    pw.println("// ===BEGIN ICANN DOMAINS===")
    pw.println("com")
    pw.println("uk")
    pw.println("co.uk")
    pw.println("ck")
    pw.println("*.ck")
    pw.println("!www.ck")
    pw.println("")
    pw.close()
    val sfx = spark.read.text(f.getAbsolutePath)
      .withColumnRenamed("value", "suffix")
    val hosts = Seq("a.ex.com", "b.co.uk", "x.y.ck", "www.ck", "ck")
      .toDF("h")
    val got = Curation.registeredDomains(hosts, "h", sfx, "suffix")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("a.ex.com") == Some("ex.com"))
    assert(got("b.co.uk") == Some("b.co.uk"))
    assert(got("x.y.ck") == Some("x.y.ck"))  // *.ck -> suffix y.ck
    assert(got("www.ck") == Some("www.ck")) // exception
    assert(got("ck") == None)                // bare plain suffix
  }

  test("registeredDomains: exception prevails over a longer wildcard " +
      "match and most-labels precedence holds") {
    val hosts = Seq("deep.sub.www.ck", "p.q.r.platform.example")
      .toDF("h")
    val sfx = Seq("*.ck", "!www.ck", "example", "platform.example",
      "*.platform.example").toDF("s")
    val got = Curation.registeredDomains(hosts, "h", sfx, "s")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // exception (2 labels) beats the wildcard's 2-label suffix www.ck
    assert(got("deep.sub.www.ck") == Some("www.ck"))
    // *.platform.example (3 labels incl. *) beats platform.example (2)
    // and example (1): public suffix r.platform.example -> q.r....
    assert(got("p.q.r.platform.example") == Some("q.r.platform.example"))
  }

  test("lineDedup is idempotent: one pass removes every shared line, " +
      "a second pass is a no-op") {
    val docs = Seq(
      (1L, "shared header\nunique a\nshared footer"),
      (2L, "shared header\nunique b\nshared footer"),
      (3L, "shared header\nunique c"))
      .toDF("doc_id", "text")
    val once = Curation.lineDedup(docs, "doc_id", "text")
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = Curation.lineDedup(once, "doc_id", "text")
    val a = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = twice.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a(1L) == "unique a" && a(3L) == "unique c")
  }

  test("lineDedup: shared normalized lines removed, blanks and unique " +
      "lines kept in order, null text passes through") {
    val docs = Seq(
      (1L, "Unique One\nCopyright FOO corp\n\nbody text a"),
      (2L, "body intro\ncopyright foo CORP\nUnique Two"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Curation.lineDedup(docs, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((Some("Unique One\n\nbody text a"), 4L, 1L)),
      got(1L).toString)
    assert(got(2L) == ((Some("body intro\nUnique Two"), 3L, 1L)),
      got(2L).toString)
    assert(got(3L) == ((None, 0L, 0L)))
  }

  test("tokenBalancedShards: size-rank round-robin, shard token gap " +
      "bounded by the largest doc, ties by id") {
    val docs = (1L to 40L).map(i => (i, ((i * 7919) % 97) + 1))
      .toDF("id", "toks")
    val got = Curation.tokenBalancedShards(docs, "id", "toks", 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("toks"),
        r.getAs[Long]("rank"), r.getAs[Long]("shard")))
    // rank is the (toks desc, id asc) total order, 1..n
    val expected = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, t) => (-t, id) }.map(_._1)
    assert(got.sortBy(_._3).map(_._1).toSeq == expected.toSeq)
    // provable balance bound: any two shard totals differ by <= max doc
    val totals = got.groupBy(_._4).map { case (_, xs) => xs.map(_._2).sum }
    val maxDoc = got.map(_._2).max
    assert(totals.max - totals.min <= maxDoc,
      s"gap ${totals.max - totals.min} > max doc $maxDoc")
    // every shard gets floor/ceil(n / nShards) docs
    val sizes = got.groupBy(_._4).map(_._2.size).toSet
    assert(sizes.subsetOf(Set(13, 14)), sizes.toString)
  }

  test("ccnetBuckets: per-group integer tercile labels, ties by id, " +
      "small-group edges") {
    val df = Seq(
      ("a", 10L, 1L), ("a", 10L, 2L), ("a", 20L, 3L), // tie at 10
      ("b", 5L, 4L),                                   // n = 1
      ("c", 1L, 5L), ("c", 2L, 6L), ("c", 3L, 7L), ("c", 4L, 8L))
      .toDF("g", "score", "id")
    val got = Curation.ccnetBuckets(df, "g", "score", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("n"),
          r.getAs[String]("bucket")))).toMap
    // group a (n=3): floor cuts 1 and 2 -> one of each bucket
    assert(got(1L) == ((1L, 3L, "tail")))
    assert(got(2L) == ((2L, 3L, "middle"))) // tie resolved by id
    assert(got(3L) == ((3L, 3L, "head")))
    // n=1: rank 1 > floor(2/3)=0 -> head
    assert(got(4L) == ((1L, 1L, "head")))
    // n=4: cuts floor(4/3)=1, floor(8/3)=2 -> 1 tail, 1 middle, 2 head
    assert(got(5L) == ((1L, 4L, "tail")) && got(6L) == ((2L, 4L, "middle")))
    assert(got(7L) == ((3L, 4L, "head")) && got(8L) == ((4L, 4L, "head")))
  }

  test("bloomLineDedup: reference lines always drop (no false " +
      "negatives), unique lines survive at low fill, order kept, " +
      "null/blank safe") {
    import graft.functions.Sketches
    val ref = Seq("shared header line", "shared footer line")
      .toDF("norm")
    val regs = Sketches.bloomRegisters(ref, "norm",
      mBits = 65536, kHashes = 4)
    val docs = Seq(
      (1L, "Shared Header Line\nunique middle a\nshared footer line"),
      (2L, "unique only doc\n\nanother unique line"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Curation.bloomLineDedup(docs, "doc_id", "text", regs,
        mBits = 65536, kHashes = 4)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3)))).toMap
    // normalization: case-folded match drops; blank line never drops
    assert(got(1L) == ((Some("unique middle a"), 3L, 2L)), got(1L).toString)
    assert(got(2L) ==
      ((Some("unique only doc\n\nanother unique line"), 3L, 0L)),
      got(2L).toString)
    assert(got(3L) == ((None, 0L, 0L)))
    // idempotence on the APPLY side: re-applying the same filter to the
    // cleaned text is a no-op (all matching lines already gone)
    val once = Curation.bloomLineDedup(docs, "doc_id", "text", regs,
      mBits = 65536, kHashes = 4)
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = Curation.bloomLineDedup(once, "doc_id", "text", regs,
      mBits = 65536, kHashes = 4)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(twice(1L) == Some("unique middle a") &&
      twice(2L) == Some("unique only doc\n\nanother unique line"))
  }

  test("c4Filter: every published rule fires — line keeps (terminal " +
      "punct incl. quote, min words, javascript), page drops (badword " +
      "after punct strip, lorem ipsum, brace, few sentences)") {
    val good = (1 to 5).map(i => s"good sentence number $i.").mkString("\n")
    val docs = Seq(
      (1L, good),                                  // kept
      (2L, good + "\nno terminal punct line\nok line here."),
      (3L, good + "\nShe said \"fine.\""),         // quote terminal kept
      (4L, good + "\ntiny."),                      // <3 words -> dropped line
      (5L, good + "\nenable javascript to view."), // js line dropped
      (6L, good + "\nplease Badwordx. appears."),  // badword (punct strip)
      (7L, good + "\nSee Lorem Ipsum inc."),       // lorem_ipsum
      (8L, good.replace("number 5.", "number { 5.")),   // brace
      (9L, "one. two. three. four."),              // 4 sentences -> drop
      (10L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bw = Seq("badwordx").toDF("w")
    val got = Curation.c4Filter(docs, "doc_id", "text", bw, "w")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    assert(got(1L) == ((Some(good), 5L, 5L, 5L, "kept")))
    // unpunctuated line dropped, terminal line kept
    assert(got(2L)._1.get == good + "\nok line here." &&
      got(2L)._5 == "kept", got(2L).toString)
    assert(got(3L)._1.get == good + "\nShe said \"fine.\"" &&
      got(3L)._4 == 6L && got(3L)._5 == "kept", got(3L).toString)
    assert(got(4L)._1.get == good && got(4L)._5 == "kept")
    assert(got(5L)._1.get == good && got(5L)._5 == "kept")
    assert(got(6L)._5 == "badword", got(6L).toString)
    assert(got(7L)._5 == "lorem_ipsum")
    assert(got(8L)._5 == "brace")
    assert(got(9L) == ((Some("one. two. three. four."), 1L, 1L, 4L,
      "few_sentences")), got(9L).toString)
    assert(got(10L) == ((None, 0L, 0L, 0L, "few_sentences")))
  }
}

class CcnRedactSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Curation

  test("redactValidatedCcn: Luhn-valid PANs redacted in all groupings, " +
      "invalid lookalikes and short/long runs untouched, nulls pass") {
    val docs = Seq(
      (1L, "pay 4111111111111111 now"),          // valid, bare
      (2L, "pay 5500 0000 0000 0004 now"),       // valid, spaced
      (3L, "pay 4012-8888-8888-1881 now"),       // valid, dashed
      (4L, "ref 4111111111111112 here"),         // invalid checksum
      (5L, "ref 1234 5678 9012 3456 here"),      // invalid checksum
      (6L, "order 123456789012 done"),           // 12 digits: too short
      (7L, "twice 4111111111111111 and 4111111111111111"),
      (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Curation.redactValidatedCcn(docs, "text")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2)))).toMap
    assert(got(1L) == ((Some("pay <CCN> now"), 1L)))
    assert(got(2L) == ((Some("pay <CCN> now"), 1L)))
    assert(got(3L) == ((Some("pay <CCN> now"), 1L)))
    assert(got(4L)._1.get.contains("4111111111111112") && got(4L)._2 == 0L)
    assert(got(5L)._1.get.contains("1234 5678 9012 3456") && got(5L)._2 == 0L)
    assert(got(6L)._1.get.contains("123456789012") && got(6L)._2 == 0L)
    assert(got(7L) == ((Some("twice <CCN> and <CCN>"), 2L)))
    assert(got(8L) == ((None, 0L)))
  }

  test("trendingTerms: smoothed ratio on the exact lattice, minC1 " +
      "cut, k cap with term tie-break, period refusal") {
    import spark.implicits._
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    // period 0: N0 = 4 (alpha x2, beta, gamma); period 1: N1 = 5
    // (beta x2, delta x3); null text rows drop like everywhere else
    val docs = Seq((0L, "alpha  alpha beta gamma"),
      (1L, "beta beta delta\tdelta delta"),
      (0L, null.asInstanceOf[String]))
      .toDF("p", "text")
    val got = Curation.trendingTerms(docs, "text", "p", k = 10,
        minC1 = 2L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // delta: (3+1)*4*1e6 // ((0+1)*5) = 3200000; beta:
    // (2+1)*4*1e6 // ((1+1)*5) = 1200000; gamma/alpha fail minC1
    assert(got.toSeq == Seq(("delta", 0L, 3L, 3200000L),
      ("beta", 1L, 2L, 1200000L)), s"got ${got.toSeq}")
    // k = 1 keeps only the top row
    val top1 = Curation.trendingTerms(docs, "text", "p", k = 1,
      minC1 = 2L).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "delta")
    val e = intercept[Exception] {
      Curation.trendingTerms(Seq((3L, "x x")).toDF("p", "text"),
        "text", "p", k = 5).collect()
    }
    assert(rc(e).getMessage.contains("outside {0,1}"))
    intercept[IllegalArgumentException] {
      Curation.trendingTerms(docs, "text", "p", k = 0)
    }
  }

  test("distinctiveTerms: group-vs-rest smoothed scores, per-group " +
      "top-k with term tie-break, null-group refusal") {
    import spark.implicits._
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    // g1: N=3 (apple x2, banana); g2: N=4 (banana x2, cherry x2)
    val docs = Seq(("g1", "apple  apple banana"),
      ("g2", "banana banana cherry cherry")).toDF("g", "text")
    val got = Curation.distinctiveTerms(docs, "text", "g", k = 5,
        minCg = 2L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // apple: (2+1)*4e6 // ((0+1)*3) = 4000000
    // cherry: (2+1)*3e6 // ((0+1)*4) = 2250000
    // banana in g2: rest = 1 -> (2+1)*3e6 // ((1+1)*4) = 1125000
    assert(got == Map(
      ("g1", "apple") -> ((2L, 0L, 4000000L)),
      ("g2", "cherry") -> ((2L, 0L, 2250000L)),
      ("g2", "banana") -> ((2L, 1L, 1125000L))), s"got $got")
    // k = 1 keeps only the top term per group
    val top = Curation.distinctiveTerms(docs, "text", "g", k = 1,
        minCg = 2L).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top == Map("g1" -> "apple", "g2" -> "cherry"), s"got $top")
    val e = intercept[Exception] {
      Curation.distinctiveTerms(
        Seq((null.asInstanceOf[String], "a a")).toDF("g", "text"),
        "text", "g", k = 2).collect()
    }
    assert(rc(e).getMessage.contains("null group"))
  }

  test("readability: vowel-group syllables, sentence splits, the " +
      "Flesch fold in fixed op order, unscorable rows are null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. It ran!"),
      (2L, null.asInstanceOf[String]),
      (3L, ""),        // zero words -> null score
      (4L, "beautiful education"))
      .toDF("id", "text")
    val got = Curation.readability(docs, "id", "text").collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // doc 1: 5 words, 2 sentences, 5 vowel groups
    val want1 = math.floor((206.835 - 1.015 * (5.0 / 2.0)
      - 84.6 * (5.0 / 5.0)) * 1000).toLong
    assert(got(1L) == ((5L, 2L, 5L, want1)), s"got ${got(1L)}")
    assert(got(2L) == ((-1L, -1L, -1L, -1L)))
    // empty text: 0 words/sentences counted, score null
    assert(got(3L)._1 == 0L && got(3L)._4 == -1L, s"got ${got(3L)}")
    // beautiful = eau+i+u = 3 groups; education = e+u+a+io = 4;
    // no terminal punctuation still counts as ONE sentence
    val want4 = math.floor((206.835 - 1.015 * (2.0 / 1.0)
      - 84.6 * (7.0 / 2.0)) * 1000).toLong
    assert(got(4L) == ((2L, 1L, 7L, want4)), s"got ${got(4L)}")
  }
}
