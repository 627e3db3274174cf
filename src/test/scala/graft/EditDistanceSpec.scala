package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EditDistance

class EditDistanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Textbook DP Levenshtein for the in-test ground truth. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0)
      d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  private def brutePairs(keys: Seq[(Long, String)], tau: Int) =
    (for {
      (ia, ka) <- keys; (ib, kb) <- keys if ia < ib
      d = lev(ka, kb) if d <= tau
    } yield (ia, ib, d.toLong)).toSet

  private def run(keys: Seq[(Long, String)], tau: Int) = {
    val df = keys.toDF("id", "key")
    EditDistance.edSelfJoin(df, "id", col("key"), tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("planted near-pairs at tau=2 match brute force exactly") {
    val keys = Seq(
      1L -> "the quick brown fox",
      2L -> "the quick brown fix",      // 1 sub
      3L -> "the quick browne fox",     // 1 ins
      4L -> "a quick brown fox",        // 3 edits from id 1
      5L -> "completely different words here",
      6L -> "the quick brown",          // 4-char suffix delete
      7L -> "the quick brown f")        // 2-char suffix delete vs 1
    val got = run(keys, 2)
    assert(got == brutePairs(keys, 2))
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("completeness sweep: systematic edits of one base never missed") {
    val base = "abcdefghijklmnopqrst"
    // all single-char deletions, substitutions at 5 spots, and a couple
    // of insertions — every variant is within tau=2 of base
    val variants = base.indices.map(i => base.patch(i, "", 1)) ++
      Seq(0, 4, 9, 14, 19).map(i => base.updated(i, 'z')) ++
      Seq("xx" + base, base + "xx", base.patch(10, "qq", 0))
    val keys = (1L, base) +: variants.zipWithIndex
      .map { case (v, i) => (i + 2L, v) }
    for (tau <- 1 to 2) {
      assert(run(keys, tau) == brutePairs(keys, tau),
        s"mismatch at tau=$tau")
    }
  }

  test("short and empty keys handled; nulls dropped") {
    val df = Seq[(java.lang.Long, String)](
      (1L, ""), (2L, "a"), (3L, "ab"), (4L, "abcd"), (5L, null))
      .toDF("id", "key")
    val got = EditDistance.edSelfJoin(df, "id", col("key"), 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val keys = Seq(1L -> "", 2L -> "a", 3L -> "ab", 4L -> "abcd")
    assert(got == brutePairs(keys, 2))
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 2L)))
  }

  test("tau out of range rejected") {
    val df = Seq((1L, "x")).toDF("id", "key")
    intercept[IllegalArgumentException] {
      EditDistance.edSelfJoin(df, "id", col("key"), 0)
    }
  }

  test("maxPairsPerBucket valve: boilerplate-prefix keys stay exact at " +
      "the default and get capped when asked") {
    // adversarial: every key shares a long prefix, variation at the tail
    val keys = (0 until 40).map(i =>
      (i.toLong, s"record number entry ${i / 2}${if (i % 2 == 0) "a" else "b"}"))
    val df = keys.toDF("id", "key")
    val exact = run(keys, 2)
    assert(exact == brutePairs(keys, 2) && exact.nonEmpty)
    // capped: degenerate prefix buckets dropped → a subset survives
    val capped = EditDistance.edSelfJoin(df, "id", col("key"), 2,
      maxPairsPerBucket = 50L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped.subsetOf(exact), "cap must only DROP pairs, never add")
  }

  test("edJoin (two relations): equals brute force, keeps (left, right) " +
      "roles, emits equal-id cross pairs, null keys/ids dropped") {
    val left = Seq((1L, "kitten"), (2L, "sitting"), (3L, "flawn"),
      (4L, null.asInstanceOf[String])).toDF("id", "k")
    val right = Seq((1L, "mitten"), (10L, "sittin"), (11L, "lawn"),
      (12L, "unrelatedword")).toDF("id", "k")
    val got = EditDistance.edJoin(left, "id", col("k"),
        right, "id", col("k"), tau = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force
    val ls = Seq((1L, "kitten"), (2L, "sitting"), (3L, "flawn"))
    val rs = Seq((1L, "mitten"), (10L, "sittin"), (11L, "lawn"),
      (12L, "unrelatedword"))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for ((li, lk) <- ls; (ri, rk) <- rs;
        d = lev(lk, rk) if d <= 1) yield (li, ri, d.toLong)).toSet
    assert(got == want, s"got $got want $want")
    // roles: (1, kitten) matches (1, mitten) -- same id across relations
    assert(got.contains((1L, 1L, 1L)))
  }
}
