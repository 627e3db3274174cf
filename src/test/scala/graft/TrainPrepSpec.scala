package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrainPrep

class TrainPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spanCorrupt: sentinels collapse contiguous runs, inputs+targets " +
      "partition the words, identity when nothing masks") {
    // doc 0: (0*31 + pos*7) % 10 == 0 at pos 0 and 10 -> two runs
    val d = Seq((0L, (0 until 12).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TrainPrep.spanCorrupt(d, "doc_id", "text").collect().head
    assert(r.getString(1) ==
      "<extra_id_0> w1 w2 w3 w4 w5 w6 w7 w8 w9 <extra_id_1> w11")
    assert(r.getString(2) == "<extra_id_0> w0 <extra_id_1> w10")
    assert(r.getInt(3) == 2)
    // modulus so large nothing masks -> inputs = text, empty targets
    // (doc_id 1: (31 + 7*pos) % 1000000 is never 0 at these positions;
    // doc_id 0 pos 0 would mask under ANY modulus)
    val d1 = Seq((1L, (0 until 12).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val id0 = TrainPrep.spanCorrupt(d1, "doc_id", "text", modulus = 1000000)
      .collect().head
    assert(id0.getString(1) == d1.collect().head.getString(1))
    assert(id0.getString(2) == "" && id0.getInt(3) == 0)
    // adjacent masked positions merge into ONE run: doc where pos 0 and
    // pos 10 mask under modulus 10 are non-adjacent (covered above); use
    // modulus 1 -> everything masks -> single run, all words in targets
    val all1 = TrainPrep.spanCorrupt(d, "doc_id", "text", modulus = 1)
      .collect().head
    assert(all1.getString(1) == "<extra_id_0>")
    assert(all1.getString(2) ==
      "<extra_id_0> " + (0 until 12).map(i => s"w$i").mkString(" "))
  }

  test("epochShards: windows cover every token with the given stride, " +
      "shard deal is a permutation, reseeding permutes") {
    val d = Seq((1L, (0 until 80).toList), (2L, (100 until 110).toList))
      .toDF("seq_id", "tokens")
    val r = TrainPrep.epochShards(d, "seq_id", "tokens",
      width = 32, stride = 24, nShards = 4, seed = 7L)
    val rows = r.collect()
    // seq 1: n=80 -> w = 0..ceil(48/24)=2 -> 3 windows (sizes 32,32,32);
    // seq 2: n=10 -> 1 window of 10
    val bySeq = rows.groupBy(_.getLong(0))
    assert(bySeq(1L).length == 3 && bySeq(2L).length == 1)
    assert(bySeq(2L).head.getInt(4) == 10 &&
      bySeq(2L).head.getInt(5) == 100)
    // window w of seq 1 starts at token 24*w
    bySeq(1L).foreach { x =>
      assert(x.getInt(5) == 24 * x.getInt(1)) }
    // pos_in_shard is dense 0..k-1 within each shard
    rows.groupBy(_.getInt(2)).foreach { case (_, xs) =>
      assert(xs.map(_.getInt(3)).sorted.toSeq == (0 until xs.length)) }
    // another seed produces a different deal (overwhelmingly likely)
    val r2 = TrainPrep.epochShards(d, "seq_id", "tokens",
      width = 32, stride = 24, nShards = 4, seed = 8L).collect()
    val key = (x: org.apache.spark.sql.Row) =>
      (x.getLong(0), x.getInt(1)) -> ((x.getInt(2), x.getInt(3)))
    assert(rows.map(key).toMap != r2.map(key).toMap)
    // checksum is the window token sum
    assert(bySeq(2L).head.getLong(6) == (100 until 110).sum)
  }

  test("blockPack: composition covers every token exactly once per " +
      "shard, boundaries cross documents, EOS flag marks the last block") {
    // one shard (nShards=1), docs 10,11,12 tokens + EOS each = 36 slots;
    // blockSize 16 -> blocks 0..2 (last partial)
    val d = Seq((0L, (0 until 10).toList), (1L, (0 until 11).toList),
      (2L, (0 until 12).toList)).toDF("seq_id", "tokens")
    val r = graft.operators.TrainPrep
      .blockPack(d, "seq_id", "tokens", blockSize = 16, nShards = 1)
      .collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getInt(3), x.getInt(4),
        x.getBoolean(5)))
    // doc 0: [0,10) block 0; doc 1: [11,22) blocks 0,1; doc 2: [23,35)
    // blocks 1,2
    assert(r.toSet == Set(
      (0L, 0L, 0, 10, true),    // EOS at 10 -> in block 0
      (0L, 1L, 11, 16, false), (1L, 1L, 0, 6, true),  // EOS at 22 in b1
      (1L, 2L, 7, 16, false), (2L, 2L, 0, 3, true)))  // EOS at 35 in b2
    // token coverage per block: each block's slices tile without overlap
    r.groupBy(_._1).foreach { case (_, xs) =>
      val spans = xs.map(x => (x._3, x._4)).sortBy(_._1)
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 == e1 + 1) // +1 = EOS
        case _ => () }
    }
  }

  test("blockPack: EOS exactly on a block boundary emits the s==e " +
      "carrier row in the next block") {
    // 16 tokens, blockSize 16: EOS position 16 == start of block 1 —
    // it must surface as an (s=0, e=0, eos=true) row, not vanish
    val d = Seq((0L, (0 until 16).toList)).toDF("seq_id", "tokens")
    val r = graft.operators.TrainPrep
      .blockPack(d, "seq_id", "tokens", blockSize = 16, nShards = 1)
      .collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getInt(3), x.getInt(4),
        x.getBoolean(5))).toSet
    assert(r == Set((0L, 0L, 0, 16, false), (1L, 0L, 0, 0, true)))
  }

  test("tokenWaterfill: budget covering everything saturates all") {
    val d = Seq(("a", 10L, 500000L), ("b", 20L, 500000L))
      .toDF("domain", "avail", "weight_ppm")
    val r = graft.operators.TrainPrep
      .tokenWaterfill(d, "domain", "avail", "weight_ppm", budget = 30L)
      .collect().map(x => (x.getString(0), x.getLong(3), x.getBoolean(4)))
      .toSet
    assert(r == Set(("a", 10L, true), ("b", 20L, true)))
  }

  test("tokenWaterfill: two-wave saturation, exact budget, remainder " +
      "to first unsaturated domains by name") {
    // a saturates in wave 1 (tiny cap), b absorbs the rest exactly
    val d = Seq(("a", 10L, 500000L), ("b", 100L, 500000L))
      .toDF("domain", "avail", "weight_ppm")
    val r = graft.operators.TrainPrep
      .tokenWaterfill(d, "domain", "avail", "weight_ppm", budget = 60L)
      .collect().map(x => (x.getString(0), x.getLong(3), x.getBoolean(4)))
      .toSet
    assert(r == Set(("a", 10L, true), ("b", 50L, false)))
    // three equal unsaturated domains, budget 100: floors give 33 each,
    // the +1 remainder goes to the name-first domain
    val e = Seq(("x", 100L, 1L), ("y", 100L, 1L), ("z", 100L, 1L))
      .toDF("domain", "avail", "weight_ppm")
    val r2 = graft.operators.TrainPrep
      .tokenWaterfill(e, "domain", "avail", "weight_ppm", budget = 100L)
      .collect().map(x => (x.getString(0), x.getLong(3))).toMap
    assert(r2 == Map("x" -> 34L, "y" -> 33L, "z" -> 33L))
    // allocation always sums to min(budget, total availability)
    assert(r2.values.sum == 100L)
  }

  test("tokenWaterfill: refuses duplicates, bad weights, oversized " +
      "relations") {
    val dup = Seq(("a", 1L, 1L), ("a", 2L, 1L))
      .toDF("domain", "avail", "weight_ppm")
    intercept[IllegalArgumentException] {
      graft.operators.TrainPrep.tokenWaterfill(dup, "domain", "avail",
        "weight_ppm", 10L)
    }
    val zw = Seq(("a", 1L, 0L)).toDF("domain", "avail", "weight_ppm")
    intercept[IllegalArgumentException] {
      graft.operators.TrainPrep.tokenWaterfill(zw, "domain", "avail",
        "weight_ppm", 10L)
    }
    val many = (0 until 10).map(i => (s"d$i", 1L, 1L))
      .toDF("domain", "avail", "weight_ppm")
    intercept[IllegalArgumentException] {
      graft.operators.TrainPrep.tokenWaterfill(many, "domain", "avail",
        "weight_ppm", 10L, maxDomains = 5)
    }
  }

  test("interleaveOrder: feed_key order realizes the ratio pattern, " +
      "unlisted sources drop, ranks are contiguous per (source, shard)") {
    val d = (0L until 60L).map(i =>
        (i, Seq("sa", "sb", "sx")(((i % 3).toInt))))
      .toDF("seq_id", "src")
    val r = graft.operators.TrainPrep.interleaveOrder(d, "seq_id", "src",
      ratios = Seq(("sa", 2), ("sb", 1)), nShards = 2, seed = 9L)
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getInt(2), x.getLong(3),
        x.getInt(4), x.getLong(5)))
    assert(r.forall(_._2 != "sx"))                  // not in the mix
    assert(r.length == 40)                          // 20 sa + 20 sb
    // feed keys are unique and slots within a round respect k_s
    assert(r.map(_._6).distinct.length == r.length)
    assert(r.filter(_._2 == "sa").forall(_._5 < 2))
    assert(r.filter(_._2 == "sb").forall(_._5 == 0))
    // per (source, shard): rho = round*k + slot is 0..n-1 contiguous
    r.groupBy(x => (x._2, x._3)).foreach { case ((s, _), xs) =>
      val k = if (s == "sa") 2 else 1
      val rhos = xs.map(x => x._4 * k + x._5).sorted.toSeq
      assert(rhos == (0L until rhos.length.toLong).toSeq)
    }
  }

  test("bestOfN: winner by (score, id), candidate counts") {
    val d = Seq((1L, 10L, 5L), (1L, 11L, 5L), (1L, 12L, 3L),
      (2L, 20L, 1L)).toDF("p", "c", "sc")
    val r = graft.operators.TrainPrep.bestOfN(d, "p", "c", "sc")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getInt(3))).toSet
    assert(r == Set((1L, 11L, 5L, 3), (2L, 20L, 1L, 1)))
  }

  test("fewShot: label-balanced quotas, self-exclusion, deterministic " +
      "ranks, short labels yield fewer rows") {
    val pool = Seq((1L, "de"), (2L, "de"), (3L, "de"),
      (4L, "en"), (5L, "en"), (6L, "fr")).toDF("id", "lab")
    val test = Seq(Tuple1(4L), Tuple1(100L)).toDF("tid")
    val r = graft.operators.TrainPrep.fewShot(test, "tid", pool, "id",
      "lab", k = 5, seed = 2L).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getInt(2), x.getLong(3)))
    // quotas for k=5 over labels (de, en, fr): 2, 2, 1
    val by = r.groupBy(x => (x._1, x._2)).view.mapValues(_.length).toMap
    assert(by((100L, "de")) == 2 && by((100L, "en")) == 2 &&
      by((100L, "fr")) == 1)
    // test item 4 is itself in the pool (label en): excluded before
    // ranking, leaving only exemplar 5 for its en quota of 2
    assert(!r.exists(x => x._1 == 4L && x._4 == 4L))
    assert(by((4L, "en")) == 1)
    // ranks are 0-based within quota
    r.groupBy(x => (x._1, x._2)).foreach { case (_, xs) =>
      assert(xs.map(_._3).sorted.toSeq == (0 until xs.length)) }
    // k larger than a label's pool: fr has 1 exemplar, quota 2 under
    // k=6 -> only 1 row for fr
    val r6 = graft.operators.TrainPrep.fewShot(test, "tid", pool, "id",
      "lab", k = 6, seed = 2L).collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(r6.count(_ == ((100L, "fr"))) == 1)
    // pool-size refusal is loud
    intercept[IllegalArgumentException] {
      graft.operators.TrainPrep.fewShot(test, "tid", pool, "id", "lab",
        k = 2, maxPool = 3)
    }
    // requireFull: under k=6 every label needs quota 2 + 1 headroom;
    // en (2 rows) is the first shortfall in sorted order -> loud
    // refusal naming the label; a pool with headroom everywhere passes
    val eFull = intercept[IllegalArgumentException] {
      graft.operators.TrainPrep.fewShot(test, "tid", pool, "id", "lab",
        k = 6, seed = 2L, requireFull = true)
    }
    assert(eFull.getMessage.contains("'en'"))
    val big = Seq((1L, "de"), (2L, "de"), (3L, "en"), (4L, "en"))
      .toDF("id", "lab")
    val rf = graft.operators.TrainPrep.fewShot(test, "tid", big, "id",
      "lab", k = 2, seed = 2L, requireFull = true).collect()
    assert(rf.length == 4)   // 2 tests x 2 labels x quota 1
  }

  test("preferencePairs: best-vs-rest with id tie-break, margins") {
    val d = Seq((1L, 10L, 3.0), (1L, 11L, 5.0), (1L, 12L, 5.0),
      (2L, 20L, 1.0)).toDF("p", "c", "sc")
    val r = graft.operators.TrainPrep.preferencePairs(d, "p", "c", "sc")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3))).toSet
    // prompt 1: chosen = 12 (score tie 5.0, higher id); prompt 2: no pair
    assert(r == Set((1L, 12L, 10L, 2.0), (1L, 12L, 11L, 0.0)))
  }

  test("fimTransform: PSM layout reassembles the document, odd ids " +
      "pass through") {
    val words = (0 until 10).map(i => s"w$i")
    val d = Seq((2L, words.mkString(" ")), (3L, words.mkString(" ")))
      .toDF("doc_id", "text")
    val r = graft.operators.TrainPrep.fimTransform(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getBoolean(1), x.getString(2), x.getInt(3)))).toMap
    assert(r(3L) == ((false, words.mkString(" "), 0)))
    val (isFim, psm, nMid) = r(2L)
    assert(isFim)
    // id 2: i = (14 % 4) + 3 = 5, j = 5 + 2 + (26 % 3) = 9
    assert(psm == "<PRE> w0 w1 w2 w3 w4 <SUF> w9 <MID> w5 w6 w7 w8")
    assert(nMid == 4)
    // the three parts reassemble the source
    val pre = psm.drop("<PRE> ".length).takeWhile(_ != '<').trim
    val suf = psm.substring(psm.indexOf("<SUF> ") + 6,
      psm.indexOf(" <MID>")).trim
    val mid = psm.substring(psm.indexOf("<MID> ") + 6).trim
    assert(s"$pre $mid $suf" == words.mkString(" "))
  }

  test("lengthBatches: batches respect bucket and size, pad_waste " +
      "accounts max*count - sum") {
    val d = (1L to 10L).map(i => (i, if (i <= 6) 10 + i.toInt else 50))
      .toDF("id", "n_tok")
    val r = TrainPrep.lengthBatches(d, "id", "n_tok",
      bucketWidth = 8, batchSize = 4).collect()
    // ids 1..6 have n_tok 11..16 -> buckets 1 (11..15) and 2 (16);
    // ids 7..10 -> bucket 6, one full batch of 4, waste 0
    val b6 = r.filter(_.getInt(0) == 6)
    assert(b6.length == 1 && b6.head.getInt(2) == 4 &&
      b6.head.getLong(5) == 0L)
    // bucket 1 holds 5 seqs -> batches of 4 and 1
    val b1 = r.filter(_.getInt(0) == 1).sortBy(_.getInt(1))
    assert(b1.map(_.getInt(2)).toSeq == Seq(4, 1))
    // waste equals n*max-sum for every batch
    r.foreach { x =>
      assert(x.getLong(5) == x.getInt(2).toLong * x.getInt(3) - x.getLong(4))
    }
  }
}
