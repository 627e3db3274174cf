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
