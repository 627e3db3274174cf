package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

case class Ev2(ts: Timestamp, site: String, value: Double)

/** Stream-stream interval join: incremental matching with bounded state. */
class StreamingSpec2 extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("intervalJoin matches right events within the horizon, incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev2]
    val buys = MemoryStream[Ev2]
    val joined = EventStream.intervalJoin(clicks.toDF(), buys.toDF(),
      "site", "ts", horizon = "5 minutes", watermark = "10 minutes")
      .select($"l_ts".as("click_ts"), $"r_ts".as("buy_ts"), $"l_key".as("site"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Ev2(ts(0), "a", 1.0), Ev2(ts(2), "b", 1.0))
      buys.addData(Ev2(ts(3), "a", 9.0),  // within 5 min of a@0
        Ev2(ts(9), "b", 9.0))             // outside 5 min of b@2
      q.processAllAvailable()
      val got = spark.table("ssj_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getString(2))).toSet
      assert(got == Set(("2024-01-01 00:00:00.0", "2024-01-01 00:03:00.0", "a")))
      // a second click for b inside the horizon of the earlier buy does NOT
      // match (right must be at-or-after left), but a new buy does
      clicks.addData(Ev2(ts(8), "b", 1.0))
      buys.addData(Ev2(ts(10), "b", 9.0))
      q.processAllAvailable()
      val got2 = spark.table("ssj_out").collect().map(r =>
        (r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getString(2))).toSet
      assert(got2.contains(("2024-01-01 00:08:00.0", "2024-01-01 00:09:00.0", "b")))
      assert(got2.contains(("2024-01-01 00:08:00.0", "2024-01-01 00:10:00.0", "b")))
      assert(got2.size == 3)
    } finally q.stop()
  }

  test("intervalJoin batch mode agrees with the streaming semantics") {
    import spark.implicits._
    val clicks = Seq(Ev2(ts(0), "a", 1.0), Ev2(ts(2), "b", 1.0), Ev2(ts(8), "b", 1.0)).toDF()
    val buys = Seq(Ev2(ts(3), "a", 9.0), Ev2(ts(9), "b", 9.0), Ev2(ts(10), "b", 9.0)).toDF()
    val got = EventStream.intervalJoin(clicks, buys, "site", "ts", "5 minutes", "10 minutes")
      .select($"l_ts", $"r_ts", $"l_key").collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getString(2))).toSet
    assert(got == Set(
      ("2024-01-01 00:00:00.0", "2024-01-01 00:03:00.0", "a"),
      ("2024-01-01 00:08:00.0", "2024-01-01 00:09:00.0", "b"),
      ("2024-01-01 00:08:00.0", "2024-01-01 00:10:00.0", "b")))
  }

  test("intervalJoin: a side carrying only (key, ts) joins cleanly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val clicks = Seq(Ev2(ts(0), "a", 1.0), Ev2(ts(2), "b", 1.0)).toDF()
      .select(col("ts"), col("site")) // minimal event relation: no payload
    val buys = Seq(Ev2(ts(3), "a", 9.0), Ev2(ts(9), "b", 9.0)).toDF()
    val got = EventStream.intervalJoin(clicks, buys, "site", "ts",
      "5 minutes", "10 minutes")
      .select($"l_ts", $"r_ts", $"l_key").collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getString(2))).toSet
    assert(got == Set(("2024-01-01 00:00:00.0", "2024-01-01 00:03:00.0", "a")))
  }
}

/** Native session windows: gap merging, incremental state. */
class SessionWindowSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  def ts(min: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("sessionAgg merges gapped events into sessions incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val input = MemoryStream[Ev2]
    val agg = graft.streaming.EventStream.sessionAgg(input.toDF(), "ts", "site",
      "value", gap = "5 minutes", watermark = "30 minutes")
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete).start()
    try {
      // a: 0,3,6 chain into one session; 20 starts another. b: isolated
      input.addData(Ev2(ts(0), "a", 1.0), Ev2(ts(3), "a", 2.0),
        Ev2(ts(6), "a", 4.0), Ev2(ts(20), "a", 8.0), Ev2(ts(2), "b", 16.0))
      q.processAllAvailable()
      val got = spark.table("sess_out").collect().map(r =>
        (r.getString(2), r.getTimestamp(0).toString.substring(11, 16),
          r.getLong(3), r.getDouble(4))).toSet
      assert(got == Set(
        ("a", "00:00", 3L, 7.0),   // 0-3-6 merged (each gap < 5 min)
        ("a", "00:20", 1L, 8.0),
        ("b", "00:02", 1L, 16.0)))
      // an event bridging 6..20? No - but one at 9 extends the first session
      input.addData(Ev2(ts(9), "a", 32.0))
      q.processAllAvailable()
      val upd = spark.table("sess_out").collect().map(r =>
        (r.getString(2), r.getTimestamp(0).toString.substring(11, 16), r.getLong(3))).toSet
      assert(upd.contains(("a", "00:00", 4L))) // extended, still one session
    } finally q.stop()
  }

  test("sessionAgg batch mode matches the q30 lag-based sessionization shape") {
    import spark.implicits._
    val ev = Seq(Ev2(ts(0), "a", 1.0), Ev2(ts(3), "a", 2.0), Ev2(ts(20), "a", 4.0))
      .toDF()
    val got = graft.streaming.EventStream.sessionAgg(ev, "ts", "site", "value",
      "5 minutes", "30 minutes")
      .orderBy("session_start").collect()
      .map(r => (r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq((2L, 3.0), (1L, 4.0)))
  }
}
