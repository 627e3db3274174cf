package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (user, type, ts)
  val evs = Seq(
    // u1 completes the whole funnel, with decoys interleaved
    (1L, "view", 10L), (1L, "click", 20L), (1L, "view", 25L),
    (1L, "purchase", 30L),
    // u2 clicks BEFORE viewing — that click can't count; the later
    // click does
    (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 15L),
    // u3: equal timestamps are NOT strictly after -> no progress
    (3L, "view", 10L), (3L, "click", 10L),
    // u4 never does step 0 -> absent
    (4L, "click", 1L), (4L, "purchase", 2L),
    // u5 views twice, min wins
    (5L, "view", 50L), (5L, "view", 40L))

  test("funnel: strict ordering, abandonment, min-ts per step, " +
      "step-0 gate") {
    val got = Funnel.funnel(evs.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getInt(4)))).toMap
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3)))
    assert(got(2L) == ((Some(10L), Some(15L), None, 2)))
    assert(got(3L) == ((Some(10L), None, None, 1)))
    assert(!got.contains(4L))
    assert(got(5L) == ((Some(40L), None, None, 1)))
  }

  test("funnelReport: reach counts are monotone and ppm is vs step 1") {
    val got = Funnel.funnelReport(evs.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // 4 users reach step 1 (u1,u2,u3,u5), 2 reach step 2, 1 reaches 3
    assert(got(1) == ((4L, 1000000L)))
    assert(got(2) == ((2L, 500000L)))
    assert(got(3) == ((1L, 250000L)))
  }

  test("attributeLastTouch: latest strictly-before touch wins, " +
      "equal-ts never attributes, organic conversions keep null") {
    val evs2 = Seq(
      (1L, "click", 10L, 100L), (1L, "click", 20L, 101L),
      (1L, "purchase", 30L, 102L),                  // -> click@20
      (1L, "purchase", 20L, 103L),                  // ts tie -> click@10
      (2L, "purchase", 5L, 200L),                   // organic
      (2L, "click", 9L, 201L))                      // after conv: no use
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Funnel.attributeLastTouch(evs2, "user_id", "event_type",
        "ts", "event_id", "purchase", "click").collect()
      .map(r => r.getLong(1) -> ((Option(r.get(3)), Option(r.get(4)))))
      .toMap
    assert(got(102L) == ((Some(20L), Some(10L))))
    assert(got(103L) == ((Some(10L), Some(10L))))
    assert(got(200L) == ((None, None)))
    intercept[IllegalArgumentException] {
      Funnel.attributeLastTouch(evs2, "user_id", "event_type", "ts",
        "event_id", "purchase", "purchase")
    }
  }

  test("funnelLatencyHistogram: per-step-pair bucketed latencies") {
    val got = Funnel.funnelLatencyHistogram(
        evs.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), bucketWidth = 7L)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // u1: click-view = 10 -> bucket 1; purchase-click = 10 -> bucket 1
    // u2: click-view = 5 -> bucket 0
    assert(got == Map((2, 1L) -> 1L, (2, 0L) -> 1L, (3, 1L) -> 1L),
      s"got $got")
  }

  test("transitionMatrix: lead pairs per user with deterministic " +
      "equal-ts order, row-normalized ppm") {
    val evs3 = Seq(
      (1L, "view", 1L, 10L), (1L, "click", 2L, 11L),
      (1L, "view", 3L, 12L), (1L, "click", 4L, 13L),
      // equal ts: id order decides view(20) -> click(21)
      (2L, "view", 5L, 20L), (2L, "click", 5L, 21L),
      (3L, "error", 9L, 30L))  // single event: no transition
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Funnel.transitionMatrix(evs3, "user_id", "event_type",
        "ts", "event_id").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // from view: 3 transitions, all to click; from click: 1 to view
    assert(got(("view", "click")) == ((3L, 1000000L)))
    assert(got(("click", "view")) == ((1L, 1000000L)))
    assert(got.size == 2)
  }

  test("funnel refuses empty and duplicate step lists") {
    val df = evs.toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      Funnel.funnel(df, "user_id", "event_type", "ts", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(df, "user_id", "event_type", "ts",
        Seq("view", "view"))
    }
  }
}
