package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EvalMetrics

class EvalMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normalizeAnswer: case, punctuation, articles, whitespace") {
    val r = Seq("The  Quick, Brown Fox!", "an answer", "a", "")
      .toDF("s")
      .select(EvalMetrics.normalizeAnswer(col("s")))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("quick brown fox", "answer", "", ""))
  }

  test("normalizeAnswer: official remove_punc semantics — intra-word " +
      "punctuation deleted (don't -> dont), non-ASCII letters kept") {
    val r = Seq("Don't Panic", "the Café-au-lait", "semi;colon\tTAB")
      .toDF("s")
      .select(EvalMetrics.normalizeAnswer(col("s")))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("dont panic", "caféaulait", "semicolon tab"))
  }

  test("emF1: exact after mangling, multiset overlap, empty edges") {
    val d = Seq(
      (1L, "The Quick FOX!", "quick fox"),        // em, f1 = 1e6
      (2L, "x x y", "x y y"),                     // overlap 2 of 3+3
      (3L, "", "something"),                      // one empty -> 0
      (4L, "a the an", ""),                       // both normalize empty
      (5L, "p q", "r s"))                         // disjoint -> 0
      .toDF("id", "pred", "ref")
    val r = EvalMetrics.emF1(d, "pred", "ref").collect()
      .map(x => x.getLong(0) -> ((x.getBoolean(3), x.getLong(4)))).toMap
    assert(r(1L) == ((true, 1000000L)))
    assert(r(2L) == ((false, 666666L)))           // floor(4e6/6)
    assert(r(3L) == ((false, 0L)))
    assert(r(4L) == ((true, 1000000L)))
    assert(r(5L) == ((false, 0L)))
  }

  test("passAtK: exact combinatorics, saturation, refusal under k") {
    // problem 1: n=8, c=2 -> 1e6 - floor(C(6,3)/C(8,3)*1e6)
    //   = 1e6 - floor(20/56*1e6) = 642858
    // problem 2: n=4, c=0 -> pass 0; problem 3: n=3, c=1 -> n-c<k -> 1e6
    val d = ((0 until 8).map(i => (1L, i < 2)) ++
      (0 until 4).map(_ => (2L, false)) ++
      (0 until 3).map(i => (3L, i == 0)))
      .toDF("problem", "ok")
    val r = EvalMetrics.passAtK(d, "problem", "ok", k = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3)))).toMap
    assert(r(1L) == ((8L, 2L, 642858L)))
    assert(r(2L) == ((4L, 0L, 0L)))
    assert(r(3L) == ((3L, 1L, 1000000L)))
    val small = Seq((9L, true), (9L, false)).toDF("problem", "ok")
    val e = intercept[Exception] {
      EvalMetrics.passAtK(small, "problem", "ok", k = 3).collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null) t else root(t.getCause)
    assert(root(e).getMessage.contains("needs >= 3 samples"))
  }

  test("bleuStats: clipped n-gram counts, geometric product lattice, " +
      "short-candidate null, repetition clipping") {
    val d = Seq(
      (1L, "the cat sat on the mat", "the cat is on the mat"),
      (2L, "a b c d", "a b c d"),              // perfect -> 1e6
      (3L, "a b c", "a b c"),                  // < 4 tokens -> t4=0, null
      (4L, "the the the the the", "the cat"))  // clipping: m1 = 1
      .toDF("id", "cand", "ref")
    val r = EvalMetrics.bleuStats(d, "cand", "ref").collect()
      .map(x => x.getAs[Long]("id") -> x).toMap
    val r1 = r(1L)
    assert(r1.getAs[Long]("m1") == 5L && r1.getAs[Long]("t1") == 6L)
    assert(r1.getAs[Long]("m2") == 3L && r1.getAs[Long]("t2") == 5L)
    assert(r1.getAs[Long]("m3") == 1L && r1.getAs[Long]("t3") == 4L)
    assert(r1.getAs[Long]("m4") == 0L && r1.getAs[Long]("t4") == 3L)
    assert(r1.getAs[Long]("cand_len") == 6L &&
      r1.getAs[Long]("ref_len") == 6L)
    assert(r1.getAs[Long]("prec_geo_ppm") == 0L)   // m4 = 0
    assert(r(2L).getAs[Long]("prec_geo_ppm") == 1000000L)
    assert(r(3L).isNullAt(r(3L).fieldIndex("prec_geo_ppm")))
    assert(r(4L).getAs[Long]("m1") == 1L && r(4L).getAs[Long]("t1") == 5L)
  }

  test("bleuStats: adjacent tokens cannot fuse across the n-gram " +
      "joiner (separator is a control char)") {
    // cand bigrams {"a b_c"-style fusions} must NOT match ref ones
    val d = Seq((1L, "x ab c", "x a bc")).toDF("id", "cand", "ref")
    val r = EvalMetrics.bleuStats(d, "cand", "ref").collect().head
    assert(r.getAs[Long]("m2") == 0L)   // "x ab" != "x a", "ab c" != "a bc"
  }

  test("rougeL: LCS on the ppm lattice, empty edges, loud refusal " +
      "past maxTokens") {
    val d = Seq(
      (1L, "a b c d e", "a c e f"),
      (2L, "", ""),
      (3L, "x", ""))
      .toDF("id", "cand", "ref")
    val r = EvalMetrics.rougeL(d, "cand", "ref").collect()
      .map(x => x.getAs[Long]("id") ->
        ((x.getAs[Long]("lcs_len"), x.getAs[Long]("rouge_p_ppm"),
          x.getAs[Long]("rouge_r_ppm"), x.getAs[Long]("rouge_f_ppm"))))
      .toMap
    assert(r(1L) == ((3L, 600000L, 750000L, 666666L)))
    assert(r(2L) == ((0L, 1000000L, 1000000L, 1000000L)))
    assert(r(3L) == ((0L, 0L, 0L, 0L)))
    // null text scores like empty text — no NPE in the DP UDF
    val withNull = Seq((9L, null.asInstanceOf[String], "a b"))
      .toDF("id", "cand", "ref")
    val rn = EvalMetrics.rougeL(withNull, "cand", "ref").collect().head
    assert(rn.getAs[Long]("lcs_len") == 0L &&
      rn.getAs[Long]("rouge_f_ppm") == 0L)
    val long = Seq((1L, (1 to 20).map(_ => "w").mkString(" "), "w"))
      .toDF("id", "cand", "ref")
    val e2 = intercept[Exception] {
      EvalMetrics.rougeL(long, "cand", "ref", maxTokens = 10).collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null) t else root(t.getCause)
    assert(root(e2).getMessage.contains("truncate upstream"))
  }

  test("rougeDedup: max-F against the pool with min-seed-id argmax, " +
      "self-match drops, threshold gates keep, pool-size refusal") {
    val pool = Seq((10L, "write a poem about spring"),
      (11L, "write a poem about spring"),   // duplicate seed text
      (12L, "summarize the article"))
      .toDF("sid", "stext")
    val cands = Seq(
      (1L, "write a poem about spring"),    // exact vs 10 AND 11 -> min 10
      (2L, "write a poem about autumn"),    // 4/5 tokens LCS vs 10
      (3L, "translate this sentence now"))  // novel
      .toDF("cid", "ctext")
    val r = EvalMetrics.rougeDedup(cands, "cid", "ctext", pool, "sid",
        "stext", thresholdPpm = 700000L).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getBoolean(3)))).toMap
    assert(r(1L) == ((1000000L, 10L, false)))
    // LCS("write a poem about autumn","write a poem about spring")=4,
    // F = floor(4*2e6/10) = 800000 >= threshold -> dropped
    assert(r(2L) == ((800000L, 10L, false)))
    assert(r(3L)._3 == true && r(3L)._1 < 700000L)
    intercept[IllegalArgumentException] {
      EvalMetrics.rougeDedup(cands, "cid", "ctext", pool, "sid",
        "stext", maxSeeds = 2)
    }
  }

  test("cohensKappa: exact integer lattice, negative kappa floors " +
      "toward -inf, constant-equal raters undefined") {
    // N=6, agree=5, marginals r1(a4,b2) r2(a3,b3): sum_rc=18,
    // kappa = (30-18)/(36-18) = 2/3 -> 666666
    val d = Seq(("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b")).toDF("r1", "r2")
    val r = EvalMetrics.cohensKappa(d, "r1", "r2").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3)) == ((6L, 5L, 18L, 666666L)))
    // perfect disagreement on symmetric marginals: kappa = -1
    val neg = Seq(("a", "b"), ("b", "a")).toDF("r1", "r2")
    assert(EvalMetrics.cohensKappa(neg, "r1", "r2").collect()
      .head.getLong(3) == -1000000L)
    // both raters constant and equal: p_e = 1 -> null
    val const = Seq(("x", "x"), ("x", "x")).toDF("r1", "r2")
    assert(EvalMetrics.cohensKappa(const, "r1", "r2").collect()
      .head.isNullAt(3))
    // unrated rows (null label) are EXCLUDED, not counted as
    // disagreement: kappa over the rated subset only
    val withNulls = Seq(("a", "a"), ("a", "a"), ("a", "a"),
      ("a", "b"), ("b", "b"), ("b", "b"),
      ("a", null.asInstanceOf[String]), (null.asInstanceOf[String], "b"))
      .toDF("r1", "r2")
    val rn = EvalMetrics.cohensKappa(withNulls, "r1", "r2")
      .collect().head
    assert((rn.getLong(0), rn.getLong(3)) == ((6L, 666666L)))
  }

  test("corpusBleu: sums segment stats FIRST, precision on the sums " +
      "(not the mean of segment scores); short-corpus null") {
    val pairs = Seq(
      ("s1", "a b c d e", "a b c d e"),   // perfect segment
      ("s1", "a b c d", "x y z w"),       // zero-match segment
      ("s2", "p q r", "p q r"))           // < 4 tokens: t4 = 0
      .toDF("sys", "cand", "ref")
    val stats = EvalMetrics.bleuStats(pairs, "cand", "ref")
    val got = EvalMetrics.corpusBleu(stats, Seq("sys")).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = got("s1")
    // sums: m=(5,4,3,2), t=(9,7,5,3); corpus prec =
    // floor(120e6/945) = 126984 — NOT the 500000 a segment mean gives
    assert((s1.getAs[Long]("m1"), s1.getAs[Long]("t1")) == ((5L, 9L)))
    assert((s1.getAs[Long]("m4"), s1.getAs[Long]("t4")) == ((2L, 3L)))
    assert(s1.getAs[Long]("prec_geo_ppm") == 126984L)
    assert(s1.getAs[Long]("n_segments") == 2L)
    assert(s1.getAs[Long]("cand_len_sum") == 9L)
    assert(s1.getAs[Long]("ref_len_sum") == 9L)
    // a corpus whose candidates never reach maxN tokens: null, not 0
    assert(got("s2").isNullAt(got("s2").fieldIndex("prec_geo_ppm")))
    // no group columns: one global row over every segment
    val g = EvalMetrics.corpusBleu(stats, Seq.empty).collect()
    assert(g.length == 1 && g.head.getAs[Long]("n_segments") == 3L)
  }

  test("fleissKappa: exact integer algebra, null labels excluded, " +
      "ragged panels refused, all-one-label undefined") {
    // i1: a,a  i2: a,b  ->  P_o = 0.5, P_e = 0.625, kappa = -1/3
    val r = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"))
      .toDF("item", "label")
    val got = EvalMetrics.fleissKappa(r, "item", "label").collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) == ((2L, 2L, 6L, 10L)))
    assert(got.getAs[Long]("kappa_ppm") == -333334L) // floor toward -inf
    // a null label is an unrated slot, excluded BEFORE the panel check
    val withNull = r.unionByName(Seq((1L, null.asInstanceOf[String]))
      .toDF("item", "label"))
    assert(EvalMetrics.fleissKappa(withNull, "item", "label").collect()
      .head.getAs[Long]("kappa_ppm") == -333334L)
    // ragged panel (item 3 has one rating) refuses loudly
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null) t else rootCause(t.getCause)
    val e = intercept[Exception] {
      EvalMetrics.fleissKappa(r.unionByName(
        Seq((3L, "a")).toDF("item", "label")), "item", "label").collect()
    }
    assert(rootCause(e).getMessage.contains("ragged"),
      rootCause(e).getMessage)
    // every rating one label: P_e = 1, kappa undefined
    val const = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"))
      .toDF("item", "label")
    assert(EvalMetrics.fleissKappa(const, "item", "label").collect()
      .head.isNullAt(4))
    // textbook sanity: perfect agreement on a diverse panel is 10^6
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("item", "label")
    assert(EvalMetrics.fleissKappa(perfect, "item", "label").collect()
      .head.getAs[Long]("kappa_ppm") == 1000000L)
  }

  test("mrrAtK: first relevant rank on the ppm lattice, misses are " +
      "zero, the k cut excludes deep hits, refusals") {
    // q1 hits at rank 2; q2 never; q3 hits only at rank 4 (> k)
    val rows = Seq(("q1", 1L, 0L), ("q1", 2L, 1L), ("q1", 3L, 1L),
      ("q2", 1L, 0L), ("q2", 2L, 0L),
      ("q3", 4L, 1L)).toDF("q", "rank", "rel")
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null) t else rootCause(t.getCause)
    val got = EvalMetrics.mrrAtK(rows, "q", "rank", "rel", k = 3)
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
    // mean = (500000 + 0 + 0) div 3 = 166666
    assert(got == Map("q1" -> ((2L, 500000L, 166666L)),
      "q2" -> ((-1L, 0L, 166666L)),
      "q3" -> ((-1L, 0L, 166666L))), s"got $got")
    val r0 = intercept[Exception] {
      EvalMetrics.mrrAtK(Seq(("q", 0L, 1L)).toDF("q", "rank", "rel"),
        "q", "rank", "rel", k = 3).collect()
    }
    assert(rootCause(r0).getMessage.contains("must be >= 1"))
    val g2 = intercept[Exception] {
      EvalMetrics.mrrAtK(Seq(("q", 1L, 2L)).toDF("q", "rank", "rel"),
        "q", "rank", "rel", k = 3).collect()
    }
    assert(rootCause(g2).getMessage.contains("outside {0,1}"))
  }

  test("winRate: canonicalized pairs with flipped verdicts, tie-" +
      "splitting half-count lattice, three refusals") {
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null) t else rootCause(t.getCause)
    // (1 vs 2, A wins), (2 vs 1, A wins -> flips to hi), (1 vs 2 tie)
    val prefs = Seq((1L, 2L, 1L), (2L, 1L, 1L), (1L, 2L, 0L))
      .toDF("a", "b", "w")
    val r = EvalMetrics.winRate(prefs, "a", "b", "w").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      ((1L, 2L, 3L, 1L, 1L, 1L)), s"got $r")
    assert(r.getLong(6) == 500000L) // (2*1+1) * 1e6 div 6
    val self = intercept[Exception] {
      EvalMetrics.winRate(Seq((1L, 1L, 0L)).toDF("a", "b", "w"),
        "a", "b", "w").collect()
    }
    assert(rootCause(self).getMessage.contains("self-comparison"))
    val bad = intercept[Exception] {
      EvalMetrics.winRate(Seq((1L, 2L, 3L)).toDF("a", "b", "w"),
        "a", "b", "w").collect()
    }
    assert(rootCause(bad).getMessage.contains("outside {0=tie"))
    val nm = intercept[Exception] {
      EvalMetrics.winRate(Seq((Option.empty[Long], Some(2L), Some(0L)))
        .toDF("a", "b", "w"), "a", "b", "w").collect()
    }
    assert(rootCause(nm).getMessage.contains("null a model id"))
  }

  test("ece: integer-exact bin gaps, conf=1e6 clamps into the top " +
      "bin, occupied bins only, refusals") {
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null) t else rootCause(t.getCause)
    val rows = Seq((200000L, 0L), (200000L, 1L), (900000L, 1L),
      (1000000L, 1L)).toDF("c", "y")
    val got = EvalMetrics.ece(rows, "c", "y", bins = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    // bin0: gap |1e6*1-400000| = 600000; bin1: |2e6-1900000| = 100000
    // ece = 700000 div 4 = 175000
    assert(got == Map(
      0L -> ((2L, 1L, 400000L, 500000L, 200000L, 4L, 175000L)),
      1L -> ((2L, 2L, 1900000L, 1000000L, 950000L, 4L, 175000L))),
      s"got $got")
    val over = intercept[Exception] {
      EvalMetrics.ece(Seq((1000001L, 1L)).toDF("c", "y"), "c", "y")
        .collect()
    }
    assert(rootCause(over).getMessage.contains("outside [0, 1000000]"))
    val lab = intercept[Exception] {
      EvalMetrics.ece(Seq((5L, 2L)).toDF("c", "y"), "c", "y").collect()
    }
    assert(rootCause(lab).getMessage.contains("outside {0,1}"))
    intercept[IllegalArgumentException] {
      EvalMetrics.ece(rows, "c", "y", bins = 1)
    }
  }

  test("brierScore: integer-exact mean squared error on the ppm " +
      "lattice, refusals shared with ece") {
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null) t else rootCause(t.getCause)
    // residuals 0, 0, -5e5, 2.5e5 -> brier = 0.078125 -> 78125 micro
    val rows = Seq(("k", 1000000L, 1L), ("k", 0L, 0L),
      ("k", 500000L, 1L), ("k", 250000L, 0L)).toDF("k", "c", "y")
    val r = EvalMetrics.brierScore(rows, "k", "c", "y").collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2)) ==
      (("k", 4L, 78125L)), s"got $r")
    val bad = intercept[Exception] {
      EvalMetrics.brierScore(Seq(("k", -1L, 0L)).toDF("k", "c", "y"),
        "k", "c", "y").collect()
    }
    assert(rootCause(bad).getMessage.contains("outside [0, 1000000]"))
  }

  test("aucPpm: perfect separation 1e6, single tie 5e5, hand-computed " +
      "3/4, one-class null") {
    val perfect = Seq(("k", 10L, 1L), ("k", 9L, 1L), ("k", 5L, 0L),
      ("k", 1L, 0L)).toDF("k", "s", "y")
    def auc(df: org.apache.spark.sql.DataFrame) =
      EvalMetrics.aucPpm(df, "k", "s", "y").collect()
        .map(r => (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).head
    assert(auc(perfect) == ((2L, 2L, 1000000L)))
    assert(auc(Seq(("k", 5L, 1L), ("k", 5L, 0L)).toDF("k", "s", "y"))
      == ((1L, 1L, 500000L)))
    // neg {1,3}, pos {2,4}: 3 of 4 pairs ordered -> 750000
    assert(auc(Seq(("k", 1L, 0L), ("k", 3L, 0L), ("k", 2L, 1L),
      ("k", 4L, 1L)).toDF("k", "s", "y")) == ((2L, 2L, 750000L)))
    assert(auc(Seq(("k", 1L, 1L)).toDF("k", "s", "y")) ==
      ((0L, 1L, -1L)))
  }

  test("winRate: STRING model names canonicalize on the native type " +
      "(the arena case), mixed-type columns refuse driver-side") {
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null) t else rootCause(t.getCause)
    // (alpha vs beta, A wins), (beta vs alpha, A wins -> flips back to
    // alpha), (alpha vs beta, tie): alpha takes 2 wins + half a tie
    val prefs = Seq(("alpha", "beta", 1L), ("beta", "alpha", 2L),
      ("alpha", "beta", 0L)).toDF("a", "b", "w")
    val r = EvalMetrics.winRate(prefs, "a", "b", "w").collect()(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      (("alpha", "beta", 3L, 2L, 0L, 1L, 833333L)), s"got $r")
    val nm = intercept[Exception] {
      EvalMetrics.winRate(
        Seq((Option.empty[String], Some("beta"), Some(0L)))
          .toDF("a", "b", "w"), "a", "b", "w").collect()
    }
    assert(rootCause(nm).getMessage.contains("null a model id"))
    intercept[IllegalArgumentException] {
      EvalMetrics.winRate(Seq(("alpha", 2L, 0L)).toDF("a", "b", "w"),
        "a", "b", "w")
    }
  }

  test("ndcgAtK: graded position terms on the ln/ln2 micro lattice, " +
      "ideal ordering per query, position-1 term exact, zero-" +
      "relevance queries null, refusals") {
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null) t else rootCause(t.getCause)
    // query a: rels [3, 2, 3] at ranks 1..3, k = 2 — the ideal order
    // front-loads both 3s, so nDCG < 1; query z: all-zero relevance
    val rows = Seq(("a", 1L, 3L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("z", 1L, 0L), ("z", 2L, 0L)).toDF("q", "r", "rel")
    def term(rel: Long, pos: Long): Long =
      math.floor(rel.toDouble * 1000000.0 * math.log(2.0)
        / math.log((pos + 1).toDouble)).toLong
    val dcg = term(3, 1) + term(2, 2)
    val idcg = term(3, 1) + term(3, 2)
    val got = EvalMetrics.ndcgAtK(rows, "q", "r", "rel", k = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got("a") == ((3L, dcg, idcg, 1000000L * dcg / idcg)),
      s"got ${got("a")}, want dcg=$dcg idcg=$idcg")
    assert(term(3, 1) == 3000000L) // position 1 exact: ln2/ln2 = 1
    assert(got("z") == ((2L, 0L, 0L, -1L)), s"got ${got("z")}")
    // a perfect ordering scores exactly 1e6
    val perfect = EvalMetrics.ndcgAtK(
      Seq(("p", 1L, 5L), ("p", 2L, 3L), ("p", 3L, 1L))
        .toDF("q", "r", "rel"), "q", "r", "rel", k = 3).collect()(0)
    assert(perfect.getLong(4) == 1000000L)
    val dup = intercept[Exception] {
      EvalMetrics.ndcgAtK(Seq(("a", 1L, 1L), ("a", 1L, 2L))
        .toDF("q", "r", "rel"), "q", "r", "rel", 5).collect()
    }
    assert(rootCause(dup).getMessage.contains("duplicate rank"),
      rootCause(dup).getMessage)
    val neg = intercept[Exception] {
      EvalMetrics.ndcgAtK(Seq(("a", 1L, -1L)).toDF("q", "r", "rel"),
        "q", "r", "rel", 5).collect()
    }
    assert(rootCause(neg).getMessage.contains("negative"))
    val badRank = intercept[Exception] {
      EvalMetrics.ndcgAtK(Seq(("a", 0L, 1L)).toDF("q", "r", "rel"),
        "q", "r", "rel", 5).collect()
    }
    assert(rootCause(badRank).getMessage.contains("1-based"))
  }

  test("bradleyTerry: hand-solvable 3-model tournament — the integer " +
      "MM recurrence replays exactly, strengths order with the " +
      "record, the 1-ppm floor holds for a winless model, refusals") {
    // ledger: 1 beats 2 twice; 2 beats 3 twice; 1 vs 3 one win one tie
    val ledger = Seq(
      (1L, 2L, 2L, 2L, 0L, 0L),
      (2L, 3L, 2L, 2L, 0L, 0L),
      (1L, 3L, 2L, 1L, 0L, 1L))
      .toDF("m_lo", "m_hi", "n", "wins_lo", "wins_hi", "ties")
    val iters = 4
    val got = EvalMetrics.bradleyTerry(ledger, iters).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // the documented recurrence in plain scala
    val edges = Seq((1L, 2L, 4L, 4L), (2L, 1L, 0L, 4L),
      (2L, 3L, 4L, 4L), (3L, 2L, 0L, 4L),
      (1L, 3L, 3L, 4L), (3L, 1L, 1L, 4L)) // (i, j, w2, n2)
    val w2 = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var p = Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)
    for (_ <- 1 to iters) {
      val d = edges.groupBy(_._1).view.mapValues(_.map { case (i, j, _, n2)
        => (1000000000L * n2) / (p(i) + p(j)) }.sum).toMap
      val raw = w2.map { case (m, w) => m -> (1000000000L * w) / d(m) }
      val s = raw.values.sum
      p = raw.map { case (m, r) => m -> math.max(1L, (1000000L * r) / s) }
    }
    assert(got == Map(
      1L -> ((7L, 8L, p(1L))), 2L -> ((4L, 8L, p(2L))),
      3L -> ((1L, 8L, p(3L)))), s"got $got, want p=$p")
    assert(p(1L) > p(2L) && p(2L) > p(3L),
      s"strengths must order with the record: $p")
    // a winless model floors at 1 ppm, visibly (w2 = 0 rides along)
    val shutout = Seq((1L, 2L, 3L, 3L, 0L, 0L))
      .toDF("m_lo", "m_hi", "n", "wins_lo", "wins_hi", "ties")
    val s2 = EvalMetrics.bradleyTerry(shutout, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(s2(2L) == ((0L, 1L)), s"got ${s2(2L)}")
    assert(s2(1L)._2 > 900000L)
    intercept[IllegalArgumentException] {
      EvalMetrics.bradleyTerry(ledger, 0)
    }
  }

  test("averagePrecision: hand-computed terms, no-positive null, " +
      "duplicate rank and non-binary relevance refuse") {
    // rel at ranks 1,3,4 of 5: terms 1000000 + 666666 + 750000,
    // ap = 2416666 div 3 = 805555
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L))
      .map { case (r, rel) => ("q", r, rel) }.toDF("q", "rank", "rel")
    val row = EvalMetrics.averagePrecision(df, "q", "rank", "rel")
      .collect()(0)
    assert(row.getAs[Long]("n") == 5L && row.getAs[Long]("n_pos") == 3L)
    assert(row.getAs[Long]("ap_ppm") == 805555L)
    val none = Seq(("q", 1L, 0L), ("q", 2L, 0L)).toDF("q", "rank", "rel")
    assert(EvalMetrics.averagePrecision(none, "q", "rank", "rel")
      .collect()(0).isNullAt(3), "no positives -> AP undefined")
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val dup = intercept[Exception] {
      EvalMetrics.averagePrecision(
        Seq(("q", 1L, 1L), ("q", 1L, 0L)).toDF("q", "rank", "rel"),
        "q", "rank", "rel").collect()
    }
    assert(rc(dup).getMessage.contains("duplicate rank"))
    val grade = intercept[Exception] {
      EvalMetrics.averagePrecision(
        Seq(("q", 1L, 3L)).toDF("q", "rank", "rel"),
        "q", "rank", "rel").collect()
    }
    assert(rc(grade).getMessage.contains("outside {0,1}"))
  }

  test("krippendorffAlpha: hand fixture 0.444, dropped singleton " +
      "visible, degenerate single-category null") {
    // u1:(a,a) u2:(a,b) u3:(b,b) u4:(b singleton, dropped)
    // Do_micro = 2000000 (u2), N=6, De = 18 ->
    // alpha = 1e6 - (5 * 2000000) // 18 = 444445
    val df = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 2L, "a"),
      ("g", 2L, "b"), ("g", 3L, "b"), ("g", 3L, "b"), ("g", 4L, "b"))
      .toDF("g", "unit", "v")
    val r = EvalMetrics.krippendorffAlpha(df, "g", "unit", "v")
      .collect()(0)
    assert(r.getAs[Long]("n_units") == 3L &&
      r.getAs[Long]("n_dropped_units") == 1L)
    assert(r.getAs[Long]("n_pairable") == 6L &&
      r.getAs[Long]("n_categories") == 2L)
    assert(r.getAs[Long]("alpha_ppm") == 444445L)
    // perfect agreement on one category: De = 0 -> null
    val mono = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 2L, "a"),
      ("g", 2L, "a")).toDF("g", "unit", "v")
    assert(EvalMetrics.krippendorffAlpha(mono, "g", "unit", "v")
      .collect()(0).isNullAt(5))
    // perfect agreement on TWO categories: Do = 0 -> alpha = 1e6
    val perf = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 2L, "b"),
      ("g", 2L, "b")).toDF("g", "unit", "v")
    assert(EvalMetrics.krippendorffAlpha(perf, "g", "unit", "v")
      .collect()(0).getAs[Long]("alpha_ppm") == 1000000L)
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val nul = intercept[Exception] {
      EvalMetrics.krippendorffAlpha(
        Seq(("g", 1L, null.asInstanceOf[String]),
          ("g", 1L, "a")).toDF("g", "unit", "v"),
        "g", "unit", "v").collect()
    }
    assert(rc(nul).getMessage.contains("null rating"))
  }

  test("seasonalNaiveBacktest: hand-walked m=2 fixture (mae 4e6, " +
      "smape 249349, mase 375000); constant series null MASE; " +
      "short keys absent") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val df = (Seq(10L, 20L, 14L, 26L, 12L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong + 1L, i.toLong, v) }
      ++ Seq(3L, 3L, 3L, 3L).zipWithIndex
        .map { case (v, i) => ("b", i.toLong + 1L, i.toLong, v) }
      ++ Seq(("c", 1L, 0L, 1L), ("c", 2L, 1L, 2L)))
      .toDF("k", "t", "e", "v")
    val got = EvalMetrics.seasonalNaiveBacktest(df, "k", "t", "e",
      "v", m = 2).collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    // eval rows t=3,4,5: em=(4,6,2) e1=(6,12,14) den=(24,46,26)
    // sm terms 333333+260869+153846 = 748048 -> /3 = 249349
    assert(a.getAs[Long]("n_eval") == 3L &&
      a.getAs[Long]("mae_micro") == 4000000L &&
      a.getAs[Long]("smape_ppm") == 249349L &&
      a.getAs[Long]("mase_ppm") == 375000L)
    val b = got("b")
    assert(b.getAs[Long]("mae_micro") == 0L &&
      b.getAs[Long]("smape_ppm") == 0L && b.isNullAt(4),
      "a series that never moves has no MASE reference")
    assert(!got.contains("c"), "n <= m: nothing to score")
    val nul = intercept[Exception] {
      EvalMetrics.seasonalNaiveBacktest(
        Seq(("a", 1L, 0L, Option.empty[Long]))
          .toDF("k", "t", "e", "v"), "k", "t", "e", "v", 1).collect()
    }
    assert(rc(nul).getMessage.contains("seasonalNaiveBacktest value"))
    intercept[IllegalArgumentException] {
      EvalMetrics.seasonalNaiveBacktest(df, "k", "t", "e", "v", 0)
    }
    val dup = intercept[Exception] {
      EvalMetrics.seasonalNaiveBacktest(
        Seq(("a", 1L, 0L, 5L), ("a", 1L, 0L, 6L))
          .toDF("k", "t", "e", "v"), "k", "t", "e", "v", 1).collect()
    }
    assert(rc(dup).getMessage.contains("duplicate position"),
      s"got ${rc(dup).getMessage}")
  }

  test("maseForecast: hand-walked m=2 fixture (mae 1e6, mase " +
      "250000); perfectly seasonal series null; short keys absent; " +
      "null-forecast refusal") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val df = (Seq((10L, 9L), (20L, 19L), (14L, 13L), (26L, 25L),
        (12L, 11L)).zipWithIndex
        .map { case ((y, f), i) => ("a", i.toLong, 0L, y, f) }
      ++ Seq(3L, 4L, 3L, 4L).zipWithIndex
        .map { case (y, i) => ("b", i.toLong, 0L, y, y + 1L) }
      ++ Seq(("c", 1L, 0L, 1L, 1L)))
      .toDF("k", "t", "e", "y", "f")
    val got = EvalMetrics.maseForecast(df, "k", "t", "e", "y", "f",
      m = 2).collect().map(r => r.getString(0) -> r).toMap
    // a: eval t=3,4,5 — ef = 1+1+1 = 3, en = 4+6+2 = 12
    val a = got("a")
    assert(a.getAs[Long]("n_eval") == 3L &&
      a.getAs[Long]("mae_f_micro") == 1000000L &&
      a.getAs[Long]("mase_ppm") == 250000L, s"got $a")
    // b repeats with period 2 exactly: naive never errs -> null
    assert(got("b").isNullAt(3),
      "a perfectly seasonal reference has no MASE")
    assert(!got.contains("c"), "n <= m: nothing to score")
    val nul = intercept[Exception] {
      EvalMetrics.maseForecast(
        Seq(("a", 1L, 0L, 1L, Option.empty[Long]),
          ("a", 2L, 0L, 2L, Some(1L)), ("a", 3L, 0L, 3L, Some(2L)))
          .toDF("k", "t", "e", "y", "f"),
        "k", "t", "e", "y", "f", 1).collect()
    }
    assert(rc(nul).getMessage.contains("maseForecast forecast"))
    val dup = intercept[Exception] {
      EvalMetrics.maseForecast(
        Seq(("a", 1L, 0L, 1L, 1L), ("a", 1L, 0L, 2L, 2L))
          .toDF("k", "t", "e", "y", "f"),
        "k", "t", "e", "y", "f", 1).collect()
    }
    assert(rc(dup).getMessage.contains("duplicate position"))
  }

  test("isotonicFitLarge == isotonicFitMicro bit-for-bit on random " +
      "fixtures incl. negatives; monotone output; refusals") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val rnd = new scala.util.Random(1804L)
    (0 until 6).foreach { cse =>
      val n1 = 1 + rnd.nextInt(40)
      val rows = (0 until n1).map(i =>
        ("a", i.toLong, 0L, (rnd.nextInt(21) - 10).toLong)) ++
        (0 until 17).map(i =>
          ("b", i.toLong, 0L, (rnd.nextInt(7) - 3).toLong))
      val df = rows.toDF("k", "t", "e", "v")
      val want = EvalMetrics.isotonicFitMicro(df, "k", "t", "e", "v",
          maxN = 64).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4))
        .toMap
      val got = EvalMetrics.isotonicFitLarge(df, "k", "t", "e", "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4))
        .toMap
      assert(got == want, s"case $cse:\n got $got\nwant $want")
      // monotone non-decreasing per key in the (ts, tie) order
      got.toSeq.groupBy(_._1._1).foreach { case (_, g) =>
        val fits = g.sortBy(_._1._2).map(_._2)
        assert(fits == fits.sorted)
      }
    }
    val dup = intercept[Exception] {
      EvalMetrics.isotonicFitLarge(
        Seq(("a", 1L, 0L, 5L), ("a", 1L, 0L, 6L))
          .toDF("k", "t", "e", "v"), "k", "t", "e", "v").collect()
    }
    assert(rc(dup).getMessage.contains("duplicate position"))
    val big = intercept[Exception] {
      EvalMetrics.isotonicFitLarge(
        Seq(("a", 1L, 0L, 2000000000000L))
          .toDF("k", "t", "e", "v"), "k", "t", "e", "v").collect()
    }
    assert(rc(big).getMessage.contains("1e12"))
    val wide = intercept[Exception] {
      EvalMetrics.isotonicFitLarge(
        (0 until 5).map(i => ("a", i.toLong, 0L, 1L))
          .toDF("k", "t", "e", "v"), "k", "t", "e", "v", maxN = 4)
        .collect()
    }
    assert(rc(wide).getMessage.contains("maxN=4"))
  }

  test("wordErrorRate: insertions 500000, transposition charges 2 " +
      "edits where F1 sees none, empty sides, vocab refusal") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    def run(rows: Seq[(Long, String, String)]) =
      EvalMetrics.wordErrorRate(rows.toDF("id", "h", "r"),
        "id", "h", "r").collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("n_hyp"), r.getAs[Long]("n_ref"),
            r.getAs[Long]("dist"),
            if (r.isNullAt(4)) null else r.getAs[Long]("wer_ppm"))))
        .toMap
    val got = run(Seq(
      (1L, "the cat sat", "the cat sat on the mat"),
      (2L, "b a", "a b"),
      (3L, "same same", "same same"),
      (4L, "", "x y"),
      (5L, "x y", "")))
    assert(got(1L) == ((3L, 6L, 3L, 500000L)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 2L, 2L, 1000000L)),
      "a transposition is two edits to WER, invisible to bag-F1")
    assert(got(3L) == ((2L, 2L, 0L, 0L)))
    assert(got(4L) == ((0L, 2L, 2L, 1000000L)))
    assert(got(5L) == ((2L, 0L, 2L, null)),
      "empty reference: unbounded rate, visible null")
    val big = intercept[Exception] {
      EvalMetrics.wordErrorRate(
        Seq((1L, "a b", "c d")).toDF("id", "h", "r"),
        "id", "h", "r", maxVocab = 3).collect()
    }
    assert(rc(big).getMessage.contains("maxVocab=3"))
    val nul = intercept[Exception] {
      EvalMetrics.wordErrorRate(
        Seq((1L, Option.empty[String], "x")).toDF("id", "h", "r"),
        "id", "h", "r").collect()
    }
    assert(rc(nul).getMessage.contains("null hypothesis"))
  }

  test("pinballLossPpm: q=0.9 charges under-prediction 9x harder; " +
      "hand mean 1550000; refusals") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val df = Seq(("k", 10L, 7L), ("k", 5L, 9L)).toDF("k", "a", "f")
    val r = EvalMetrics.pinballLossPpm(df, "k", "a", "f", 900000L)
      .collect()(0)
    // 900000*3 + 100000*4 = 3100000 -> mean 1550000
    assert(r.getAs[Long]("n") == 2L &&
      r.getAs[Long]("sum_loss_ppm") == 3100000L &&
      r.getAs[Long]("mean_loss_ppm") == 1550000L)
    // symmetry check at q=0.5: both rows cost 0.5*|e|
    val s = EvalMetrics.pinballLossPpm(df, "k", "a", "f", 500000L)
      .collect()(0)
    assert(s.getAs[Long]("sum_loss_ppm") == 3500000L)
    val nul = intercept[Exception] {
      EvalMetrics.pinballLossPpm(Seq(("k", Option.empty[Long], 1L))
        .toDF("k", "a", "f"), "k", "a", "f", 900000L).collect()
    }
    assert(rc(nul).getMessage.contains("actual"))
    intercept[IllegalArgumentException] {
      EvalMetrics.pinballLossPpm(df, "k", "a", "f", 1000000L)
    }
  }

  test("hosmerLemeshowDeciles: 20-row rank deciles carry exact " +
      "O and sum-conf E; three refusals") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val df = (1 to 20).map(i =>
      ("k", i.toLong, 50000L * i, (i % 2).toLong))
      .toDF("k", "tie", "conf", "lab")
    val got = EvalMetrics.hosmerLemeshowDeciles(df, "k", "tie",
      "conf", "lab").collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("o"),
          r.getAs[Long]("e_ppm")))).toMap
    assert(got.keySet == (0L to 9L).toSet)
    (0 to 9).foreach { d =>
      assert(got(d.toLong) == ((2L, 1L, 50000L * (4 * d + 3))),
        s"decile $d: got ${got(d.toLong)}")
    }
    val big = intercept[Exception] {
      EvalMetrics.hosmerLemeshowDeciles(
        Seq(("k", 1L, 1000001L, 1L)).toDF("k", "tie", "conf", "lab"),
        "k", "tie", "conf", "lab").collect()
    }
    assert(rc(big).getMessage.contains("outside [0, 1000000]"))
    val bl = intercept[Exception] {
      EvalMetrics.hosmerLemeshowDeciles(
        Seq(("k", 1L, 5L, 2L)).toDF("k", "tie", "conf", "lab"),
        "k", "tie", "conf", "lab").collect()
    }
    assert(rc(bl).getMessage.contains("outside {0,1}"))
    val dup = intercept[Exception] {
      EvalMetrics.hosmerLemeshowDeciles(
        Seq(("k", 1L, 5L, 1L), ("k", 1L, 5L, 0L))
          .toDF("k", "tie", "conf", "lab"),
        "k", "tie", "conf", "lab").collect()
    }
    assert(rc(dup).getMessage.contains("duplicate"))
  }

  test("isotonicFitMicro: PAVA pools (3,1,2) flat and (1,3,2) into " +
      "a step; output is monotone; refusals") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    def run(vs: Seq[Long]) = EvalMetrics.isotonicFitMicro(
      vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, i.toLong, v) }
        .toDF("k", "t", "e", "v"), "k", "t", "e", "v")
      .orderBy("ts").collect().map(_.getAs[Long]("iso_micro")).toSeq
    assert(run(Seq(3L, 1L, 2L)) == Seq(2000000L, 2000000L, 2000000L))
    assert(run(Seq(1L, 3L, 2L)) == Seq(1000000L, 2500000L, 2500000L))
    val fit = run(Seq(5L, -2L, 9L, 0L, 7L))
    assert(fit == fit.sorted, s"not monotone: $fit")
    val dup = intercept[Exception] {
      EvalMetrics.isotonicFitMicro(
        Seq(("k", 1L, 1L, 1L), ("k", 1L, 1L, 2L))
          .toDF("k", "t", "e", "v"), "k", "t", "e", "v").collect()
    }
    assert(rc(dup).getMessage.contains("duplicate position"))
    val big = intercept[Exception] {
      EvalMetrics.isotonicFitMicro(
        (1 to 5).map(i => ("k", i.toLong, i.toLong, i.toLong))
          .toDF("k", "t", "e", "v"), "k", "t", "e", "v", maxN = 4)
        .collect()
    }
    assert(rc(big).getMessage.contains("maxN=4"))
  }

  test("gainsTable: hand-walked 5-bucket gains end at lift 1e6; " +
      "no-positive key nulls; refusals") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val labels = Seq(1L, 1L, 1L, 1L, 0L, 0L, 0L, 1L, 0L, 0L)
    val df = labels.zipWithIndex.map { case (l, i) =>
      ("k", i.toLong, 10L - i, l) }  // score 10..1 descending
      .toDF("k", "tie", "s", "l")
    val got = EvalMetrics.gainsTable(df, "k", "tie", "s", "l",
      nBuckets = 5).orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("cum_o"), r.getAs[Long]("cum_n"),
        r.getAs[Long]("capture_ppm"), r.getAs[Long]("lift_ppm")))
    assert(got.toSeq == Seq(
      (2L, 2L, 400000L, 2000000L), (4L, 4L, 800000L, 2000000L),
      (4L, 6L, 800000L, 1333333L), (5L, 8L, 1000000L, 1250000L),
      (5L, 10L, 1000000L, 1000000L)), s"got ${got.toSeq}")
    val none = EvalMetrics.gainsTable(
      Seq(("z", 1L, 5L, 0L), ("z", 2L, 4L, 0L))
        .toDF("k", "tie", "s", "l"), "k", "tie", "s", "l",
      nBuckets = 2).collect()
    assert(none.forall(r => r.isNullAt(6) && r.isNullAt(7)),
      "no positives: capture/lift are undefined, visibly null")
    val bad = intercept[Exception] {
      EvalMetrics.gainsTable(Seq(("k", 1L, 5L, 2L))
        .toDF("k", "tie", "s", "l"), "k", "tie", "s", "l").collect()
    }
    assert(rc(bad).getMessage.contains("outside {0,1}"))
    val dup = intercept[Exception] {
      EvalMetrics.gainsTable(
        Seq(("k", 1L, 5L, 1L), ("k", 1L, 5L, 0L))
          .toDF("k", "tie", "s", "l"), "k", "tie", "s", "l").collect()
    }
    assert(rc(dup).getMessage.contains("duplicate"))
  }

  test("weightedKappa: hand 3-category fixture reads 333334 (one " +
      "ppm truncation); constant raters null; range refusal") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val df = (Seq.fill(2)((0L, 0L)) ++ Seq.fill(2)((1L, 1L))
      ++ Seq.fill(2)((2L, 2L)) ++ Seq((0L, 2L), (2L, 0L)))
      .map { case (a, b) => ("k", a, b) }.toDF("k", "r1", "r2")
    val r = EvalMetrics.weightedKappa(df, "k", "r1", "r2",
      maxCat = 3).collect()(0)
    // num = 8, den = 96: kappa = 1e6 - (1e6*8*8) div 96 = 333334
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("num") == 8L &&
      r.getAs[Long]("kappa_w_ppm") == 333334L, s"got $r")
    val const = Seq(("k", 1L, 1L), ("k", 1L, 1L)).toDF("k", "r1", "r2")
    assert(EvalMetrics.weightedKappa(const, "k", "r1", "r2")
      .collect()(0).isNullAt(3),
      "both raters constant: chance disagreement 0, undefined")
    val bad = intercept[Exception] {
      EvalMetrics.weightedKappa(Seq(("k", 3L, 1L)).toDF("k", "r1", "r2"),
        "k", "r1", "r2", maxCat = 3).collect()
    }
    assert(rc(bad).getMessage.contains("outside [0, 3)"))
  }

  test("cronbachAlpha: hand 3-item/4-respondent fixture reads " +
      "exactly 666 milli; incomplete and duplicate designs refuse; " +
      "degenerate nulls") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val df = Seq(
      ("A", "i1", 2L), ("A", "i2", 2L), ("A", "i3", 2L),
      ("B", "i1", 4L), ("B", "i2", 4L), ("B", "i3", 4L),
      ("C", "i1", 2L), ("C", "i2", 3L), ("C", "i3", 4L),
      ("D", "i1", 4L), ("D", "i2", 3L), ("D", "i3", 2L))
      .map { case (r, i, v) => ("k", r, i, v) }
      .toDF("k", "r", "i", "v")
    val a = EvalMetrics.cronbachAlpha(df, "k", "r", "i", "v")
      .collect()(0)
    // N = 16+8+16 = 40, D = 72: (1000*3*32) div (2*72) = 666
    assert(a.getAs[Long]("n") == 4L && a.getAs[Long]("k") == 3L &&
      a.getAs[Long]("alpha_milli") == 666L, s"got $a")
    val inc = intercept[Exception] {
      EvalMetrics.cronbachAlpha(df.filter(
        !(col("r") === "D" && col("i") === "i3")),
        "k", "r", "i", "v").collect()
    }
    assert(rc(inc).getMessage.contains("must be complete"))
    val dup = intercept[Exception] {
      EvalMetrics.cronbachAlpha(df.union(
        Seq(("k", "A", "i1", 5L)).toDF("k", "r", "i", "v")),
        "k", "r", "i", "v").collect()
    }
    assert(rc(dup).getMessage.contains("more than once"))
    // all totals equal -> zero total variance -> null
    val flat = Seq(("k", "A", "i1", 1L), ("k", "A", "i2", 2L),
      ("k", "B", "i1", 2L), ("k", "B", "i2", 1L))
      .toDF("k", "r", "i", "v")
    assert(EvalMetrics.cronbachAlpha(flat, "k", "r", "i", "v")
      .collect()(0).isNullAt(3))
    // single item: k/(k-1) undefined -> null
    val one = Seq(("k", "A", "i1", 1L), ("k", "B", "i1", 5L))
      .toDF("k", "r", "i", "v")
    assert(EvalMetrics.cronbachAlpha(one, "k", "r", "i", "v")
      .collect()(0).isNullAt(3))
  }
}
