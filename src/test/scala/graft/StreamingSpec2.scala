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
}
