package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.operators.TrainPrep

/** Property laws for the trainer data-prep family over generated corpora
  * (same deterministic-sampler pattern as PropertySpec): the invariants a
  * trainer silently depends on — exact token coverage through block
  * packing, window coverage through epoch chunking, and the
  * inputs/targets partition law of span corruption.
  */
class TrainPrepPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val p = org.scalacheck.Gen.Parameters.default.withSize(40)
    (0 until n).flatMap(i => g.apply(p, org.scalacheck.rng.Seed(7L + i)))
  }

  private val corpusGen: Gen[List[(Long, List[Int])]] = for {
    nDocs <- Gen.choose(1, 12)
    lens <- Gen.listOfN(nDocs, Gen.choose(1, 90))
  } yield lens.zipWithIndex.map { case (n, i) =>
    (i.toLong, (0 until n).map(t => (i * 131 + t * 17) % 65536).toList)
  }

  test("blockPack law: token spans plus EOS slots tile each shard's " +
      "stream exactly — every token AND every EOS accounted once") {
    samples(corpusGen, 12).foreach { docs =>
      val df = docs.toDF("seq_id", "tokens")
      for (blockSize <- Seq(7, 16, 64)) {
        val rows = TrainPrep.blockPack(df, "seq_id", "tokens",
          blockSize, nShards = 3).collect()
          .map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
            x.getInt(3), x.getInt(4), x.getBoolean(5)))
        // total covered == total tokens (EOS-carrier rows add 0)
        val covered = rows.map(x => (x._5 - x._4).toLong).sum
        val total = docs.map(_._2.length.toLong).sum
        assert(covered == total, s"blockSize=$blockSize covered!=total")
        rows.foreach { case (_, _, _, s, e, eos) =>
          assert(s >= 0 && s <= e && e <= blockSize)
          // an empty span is only legal as the block-leading EOS
          // carrier (EOS landed exactly on a block boundary)
          assert(s < e || (s == 0 && e == 0 && eos),
            "empty span that is not a block-leading EOS carrier")
        }
        // exactly one EOS row per sequence — no unaccounted EOS token
        val eosBySeq = rows.filter(_._6).groupBy(_._3)
          .view.mapValues(_.length).toMap
        val seqs = docs.filter(_._2.nonEmpty).map(_._1).toSet
        assert(eosBySeq.keySet == seqs, "a sequence's EOS appears in " +
          "no composition row")
        assert(eosBySeq.values.forall(_ == 1))
        // per shard: token positions ∪ EOS positions (at in-block
        // offset e of each flagged row) tile [0, Σ(n+1)) exactly
        rows.groupBy(_._1).foreach { case (shard, xs) =>
          val tok = xs.flatMap(x =>
            (x._2 * blockSize + x._4) until (x._2 * blockSize + x._5))
          val eos = xs.filter(_._6).map(x => x._2 * blockSize + x._5)
          val all = tok ++ eos
          assert(all.size == all.toSet.size, s"shard $shard overlap")
          val want = docs.filter(d => d._1 % 3 == shard && d._2.nonEmpty)
            .map(_._2.length.toLong + 1L).sum
          assert(all.toSet == (0L until want).toSet,
            s"shard $shard stream not tiled (blockSize=$blockSize)")
        }
      }
    }
  }

  test("epochShards law: windows start at multiples of stride, cover " +
      "every token, checksums recompute; shard deal is a permutation " +
      "of the window set") {
    samples(corpusGen, 10).foreach { docs =>
      val df = docs.toDF("seq_id", "tokens")
      val byId = docs.toMap
      val rows = TrainPrep.epochShards(df, "seq_id", "tokens",
        width = 32, stride = 24, nShards = 4, seed = 11L).collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getInt(3),
          x.getInt(4), x.getInt(5), x.getLong(6)))
      rows.groupBy(_._1).foreach { case (id, xs) =>
        val toks = byId(id)
        val ws = xs.map(_._2).sorted
        assert(ws.toSeq == (0 until ws.length)) // dense window ixs
        // coverage: last window reaches the end
        val last = ws.max
        assert(last * 24 + xs.find(_._2 == last).get._5 == toks.length ||
          toks.length <= 32)
        xs.foreach { case (_, w, _, _, n, first, sum) =>
          val win = toks.slice(w * 24, w * 24 + 32)
          assert(n == win.length && first == win.head &&
            sum == win.map(_.toLong).sum)
        }
      }
      // dense positions per shard
      rows.groupBy(_._3).foreach { case (_, xs) =>
        assert(xs.map(_._4).sorted.toSeq == (0 until xs.length)) }
    }
  }

  test("spanCorrupt law: inputs and targets partition the words — " +
      "stripping sentinels and re-interleaving runs reconstructs the " +
      "document; n_masked matches the mask rule") {
    val docGen: Gen[(Long, Int)] =
      Gen.zip(Gen.choose(0L, 500L), Gen.choose(1, 60))
    samples(docGen, 40).foreach { case (docId, nWords) =>
      val words = (0 until nWords).map(i => s"t${(docId * 31 + i) % 97}")
      val df = Seq((docId, words.mkString(" "))).toDF("doc_id", "text")
      val r = TrainPrep.spanCorrupt(df, "doc_id", "text").collect().head
      val (inputs, targets, nMasked) =
        (r.getString(1), r.getString(2), r.getInt(3))
      val expectMasked =
        (0 until nWords).count(i => (docId * 31 + i * 7) % 10 == 0)
      assert(nMasked == expectMasked)
      // reconstruct: walk inputs; at sentinel k, splice targets' run k
      val tgtRuns = targets.split("<extra_id_\\d+>").map(_.trim)
        .filter(_.nonEmpty)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var runIx = 0
      inputs.split(" ").filter(_.nonEmpty).foreach { tok =>
        if (tok.matches("<extra_id_\\d+>")) {
          out ++= tgtRuns(runIx).split(" "); runIx += 1
        } else out += tok
      }
      assert(out.toSeq == words,
        s"doc $docId/$nWords words reconstruct failed")
    }
  }

  test("tokenWaterfill law: Σalloc == min(budget, Σavail), alloc never " +
      "exceeds avail, saturation is exactly alloc == avail, and " +
      "unsaturated allocations are within 1 of proportional") {
    val instGen: Gen[(List[(Long, Long)], Long)] = for {
      n <- Gen.choose(1, 8)
      avails <- Gen.listOfN(n, Gen.choose(0L, 5000L))
      weights <- Gen.listOfN(n, Gen.choose(1L, 1000000L))
      budget <- Gen.choose(0L, 12000L)
    } yield (avails.zip(weights), budget)
    samples(instGen, 30).foreach { case (doms, budget) =>
      val df = doms.zipWithIndex
        .map { case ((c, w), i) => (f"d$i%02d", c, w) }
        .toDF("domain", "avail", "weight_ppm")
      val r = TrainPrep.tokenWaterfill(df, "domain", "avail",
        "weight_ppm", budget).collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
          x.getLong(3), x.getBoolean(4)))
      val totalAvail = doms.map(_._1).sum
      assert(r.map(_._4).sum == math.min(budget, totalAvail),
        s"budget=$budget doms=$doms")
      r.foreach { case (d, c, _, a, sat) =>
        assert(a >= 0 && a <= c, s"$d alloc $a out of [0, $c]")
        // saturation implies the cap is fully allocated (an
        // unsaturated domain may still land on its cap when the
        // proportional floor + remainder reaches it exactly)
        if (sat) assert(a == c, s"$d saturated but alloc $a < $c")
      }
      // unsaturated domains sit within 1 token of the exact water
      // level share N*w/D (the +1 remainder hand-out)
      if (totalAvail > budget) {
        val sat = r.filter(_._5)
        val uns = r.filter(!_._5)
        if (uns.nonEmpty) {
          val nB = BigInt(budget) - sat.map(x => BigInt(x._2)).sum
          val dB = uns.map(x => BigInt(x._3)).sum
          uns.foreach { case (d, _, w, a, _) =>
            val base = (nB * w / dB).toLong
            assert(a == base || a == base + 1, s"$d alloc $a vs $base")
          }
        }
      }
    }
  }

  test("interleaveOrder law: every listed-source row appears exactly " +
      "once, feed keys are injective, and sort-by-feed_key realizes " +
      "round-major, source-minor order") {
    val instGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 120)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 100000L),
        Gen.oneOf("sa", "sb", "sc", "zz")))
    } yield rows.map { case (id, s) => (id, s) }.distinctBy(_._1)
    samples(instGen, 15).foreach { rows =>
      val df = rows.toDF("seq_id", "src")
      val r = TrainPrep.interleaveOrder(df, "seq_id", "src",
        ratios = Seq(("sa", 2), ("sb", 1), ("sc", 3)), nShards = 4,
        seed = 3L).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getInt(2),
          x.getLong(3), x.getInt(4), x.getLong(5)))
      val listed = rows.filter(x => Set("sa", "sb", "sc")(x._2))
      assert(r.map(_._1).sorted.toSeq == listed.map(_._1).sorted)
      assert(r.map(_._6).distinct.length == r.length, "feed_key clash")
      // decoding the packed key recovers (round, src, shard, slot)
      val srcIx = Map("sa" -> 0L, "sb" -> 1L, "sc" -> 2L)
      val kMax = 3L
      r.foreach { case (_, s, shard, round, slot, key) =>
        val want = ((round * 3 + srcIx(s)) * 4 + shard) * kMax + slot
        assert(key == want)
        assert(slot < Map("sa" -> 2, "sb" -> 1, "sc" -> 3)(s))
      }
    }
  }
}
