package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Anonymize

class AnonymizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, nation, segment)
  val recs = Seq(
    (1L, "DE", "auto"), (2L, "DE", "auto"), (3L, "DE", "auto"),
    (4L, "DE", "bank"), (5L, "FR", "auto"), (6L, "FR", "auto"),
    (7L, "FR", "bank"))

  test("kAnonymize keeps only rows in groups of >= k, attaches qi_n") {
    val got = Anonymize.kAnonymize(recs.toDF("id", "nation", "seg"),
        Seq("nation", "seg"), k = 2).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("qi_n")).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 5L -> 2L, 6L -> 2L))
    intercept[IllegalArgumentException] {
      Anonymize.kAnonymize(recs.toDF("id", "nation", "seg"),
        Seq("nation"), k = 1)
    }
    // null QI values form a GROUP (null-safe join): if enough rows
    // share the null, they release — exactly what the report says
    val withNull = recs ++ Seq((8L, null.asInstanceOf[String], "auto"),
      (9L, null.asInstanceOf[String], "auto"))
    val gotN = Anonymize.kAnonymize(withNull.toDF("id", "nation", "seg"),
        Seq("nation", "seg"), k = 2).collect()
      .map(r => r.getAs[Long]("id")).toSet
    assert(gotN.contains(8L) && gotN.contains(9L),
      s"null-QI group of 2 must release under k=2: $gotN")
  }

  test("kAnonymityReport flags exactly the failing groups") {
    val got = Anonymize.kAnonymityReport(recs.toDF("id", "nation", "seg"),
        Seq("nation", "seg"), k = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(("DE", "auto")) == ((3L, false)))
    assert(got(("DE", "bank")) == ((1L, true)))
    assert(got(("FR", "bank")) == ((1L, true)))
  }

  /** The operator's exact noise draw, replayed sequentially. */
  private def refNoise(key: Long, seed: Long): Long = {
    val M = 2147483647L
    def lehmer(x: Long): Long = {
      val m = ((x % M) + M) % M
      m * 48271L % M
    }
    val u = lehmer(lehmer(key + seed) + seed)
    val sign = 1L - 2L * (u % 2)
    var v = u / 2
    var mag = 0L
    while ((v & 1L) == 1L) { mag += 1; v >>= 1 }
    sign * mag
  }

  test("forgetUsers/forgetAudit: cascade removes every tombstoned " +
      "row; audit proves processing of no-match requests") {
    val evs = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
      .toDF("user_id", "x")
    val tomb = Seq(1L, 3L, 99L).toDF("uid")   // 99 matches nothing
    val scrubbed = Anonymize.forgetUsers(evs, "user_id", tomb, "uid")
    assert(scrubbed.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val audit = Anonymize.forgetAudit(evs, "user_id", tomb, "uid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(audit == Map(1L -> 2L, 3L -> 1L, 99L -> 0L))
    // conservation: removed + surviving = original
    assert(audit.values.sum + scrubbed.count() == evs.count())
    // apply and audit normalize the key IDENTICALLY (both cast long),
    // so a string-typed user column cannot make them disagree
    val sevs = Seq(("1", "a"), ("2", "b")).toDF("user_id", "x")
    val sscr = Anonymize.forgetUsers(sevs, "user_id", tomb, "uid")
    val saud = Anonymize.forgetAudit(sevs, "user_id", tomb, "uid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sscr.collect().map(_.getString(0)).toSeq == Seq("2"))
    assert(saud(1L) == 1L && saud(3L) == 0L)
  }

  test("noisyCounts: noise replays the seeded Lehmer draw exactly, " +
      "clamps at zero, and magnitudes look geometric(1/2)") {
    val rows = (0L until 2000L).map(i => (i % 400, "x"))
    val got = Anonymize.noisyCounts(rows.toDF("k", "pad"), "k", seed = 7L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 400)
    got.foreach { case (k, (n, noise, noisy)) =>
      assert(n == 5L)
      assert(noise == refNoise(k, 7L), s"key $k noise mismatch")
      assert(noisy == math.max(n + noise, 0L))
    }
    // distribution sanity over the 400 draws: about half zero,
    // magnitude >= 3 rare
    val mags = got.values.map(v => math.abs(v._2)).toSeq
    assert(mags.count(_ == 0) > 140 && mags.count(_ == 0) < 260)
    assert(mags.count(_ >= 3) < 60)
    // clamp: a key whose count is tiny can't go negative
    val tiny = Anonymize.noisyCounts(Seq((1L, "x")).toDF("k", "pad"), "k",
      seed = 7L).collect().head
    assert(tiny.getLong(3) >= 0L)
  }
}
