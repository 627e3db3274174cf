package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SentAlign

class SentAlignSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def align(a: Seq[Long], b: Seq[Long], doc: Long = 1L) = {
    val da = a.zipWithIndex.map { case (l, i) => (doc, i, l) }
      .toDF("doc_id", "ix", "len")
    val db = b.zipWithIndex.map { case (l, i) => (doc, i, l) }
      .toDF("doc_id", "ix", "len")
    SentAlign.galeChurch(da, db, "doc_id", "ix", "len")
      .orderBy("bead_ix").collect()
      .map(x => (x.getInt(2), x.getInt(3), x.getInt(4), x.getInt(5),
        x.getString(6), x.getLong(7)))
      .toSeq
  }

  test("identity documents align 1:1 with zero cost") {
    val r = align(Seq(10L, 20L, 30L), Seq(10L, 20L, 30L))
    assert(r == Seq((0, 1, 0, 1, "1:1", 0L), (1, 1, 1, 1, "1:1", 0L),
      (2, 1, 2, 1, "1:1", 0L)))
  }

  test("a merged sentence is recovered as a 2:1 bead; deletions and " +
      "insertions pick the cheaper of skip vs merge") {
    // B merges sentences 1+2 (7+9 chars -> one 17-char sentence)
    val r = align(Seq(5L, 7L, 9L, 11L), Seq(5L, 17L, 11L))
    assert(r == Seq((0, 1, 0, 1, "1:1", 0L), (1, 2, 1, 1, "2:1", 240L),
      (3, 1, 2, 1, "1:1", 0L)))
    // deletion: 2:1 (230 + 10*|14-9| = 280) beats 1:0 + 1:1 (>= 450)
    assert(align(Seq(5L, 9L), Seq(9L))
      == Seq((0, 2, 0, 1, "2:1", 280L)))
    // insertion on the B side: 1:2 beats 0:1 + 1:1 (the linear length
    // term gives both the same mismatch mass, 1:2's type penalty is
    // lower — the brute-force law below checks the general case)
    assert(align(Seq(9L), Seq(9L, 4L))
      == Seq((0, 1, 0, 2, "1:2", 270L)))
  }

  test("DP total equals brute-force optimum on exhaustive small " +
      "instances, and emitted bead costs sum to it") {
    val moves = Seq((1, 1, 0L), (1, 0, 450L), (0, 1, 450L),
      (2, 1, 230L), (1, 2, 230L), (2, 2, 440L))
    def brute(a: List[Long], b: List[Long]): Long =
      if (a.isEmpty && b.isEmpty) 0L
      else moves.flatMap { case (di, dj, pen) =>
        if (a.length >= di && b.length >= dj)
          Some(pen + 10L * math.abs(a.take(di).sum - b.take(dj).sum) +
            brute(a.drop(di), b.drop(dj)))
        else None
      }.min
    val rng = new scala.util.Random(42)
    (0 until 12).foreach { _ =>
      val a = List.fill(1 + rng.nextInt(4))(3L + rng.nextInt(20))
      val b = List.fill(1 + rng.nextInt(4))(3L + rng.nextInt(20))
      val beads = align(a, b)
      val dpTotal = beads.map(_._6).sum
      assert(dpTotal == brute(a, b), s"a=$a b=$b")
      // beads partition both sides in order
      assert(beads.map(_._2).sum == a.length)
      assert(beads.map(_._4).sum == b.length)
    }
  }

  test("oversized documents are refused loudly") {
    val big = (0 until 10).map(i => (1L, i, 5L)).toDF("doc_id", "ix", "len")
    val e = intercept[org.apache.spark.SparkException] {
      SentAlign.galeChurch(big, big, "doc_id", "ix", "len", maxSents = 5)
        .collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null) t else root(t.getCause)
    assert(root(e).getMessage.contains("chunk upstream"))
  }
}
