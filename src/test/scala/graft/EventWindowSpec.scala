package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

class EventWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("hoppingAgg: every event lands in len/slide overlapping " +
      "windows, milli sums are exact, window starts align to slide") {
    val evs = Seq(
      (ts(2), "a", 1.25),   // windows starting 00:00 and -? (pre-hour)
      (ts(7), "a", 2.5),    // windows 00:00 and 00:05
      (ts(7), "b", 4.0),
      (ts(12), "a", 8.0))   // windows 00:05 and 00:10
      .toDF("ts", "k", "v")
    val got = EventStream.hoppingAgg(evs, "ts", "k", "v",
        "10 minutes", "5 minutes", "1 hour")
      .collect()
      .map(r => (r.getTimestamp(0).toString.substring(11, 16),
        r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // a@00:02 -> [23:55, 00:00]; a@00:07 -> [00:00, 00:05];
    // a@00:12 -> [00:05, 00:10]
    assert(got(("23:55", "a")) == ((1L, 1250L)))
    assert(got(("00:00", "a")) == ((2L, 3750L)))
    assert(got(("00:05", "a")) == ((2L, 10500L)))
    assert(got(("00:10", "a")) == ((1L, 8000L)))
    assert(got(("00:00", "b")) == ((1L, 4000L)))
    assert(got(("00:05", "b")) == ((1L, 4000L)))
    // each event contributes to exactly len/slide = 2 windows
    assert(got.values.map(_._1).sum == 4L * 2)
  }

  test("hoppingAgg streams: append-mode windows finalize once the " +
      "watermark passes and equal the batch aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventStream.hoppingAgg(
        input.toDF().toDF("ts", "k", "v"),
        "ts", "k", "v", "10 minutes", "5 minutes", "1 minute")
      .writeStream.format("memory").queryName("hop_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(2), "a", 1.25), (ts(7), "a", 2.5))
      q.processAllAvailable()
      // push the watermark far past the early windows
      input.addData((ts(59), "a", 0.0))
      q.processAllAvailable()
      val got = spark.table("hop_out").collect()
        .map(r => (r.getTimestamp(0).toString.substring(11, 16),
          r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
      assert(got(("23:55", "a")) == ((1L, 1250L)))
      assert(got(("00:00", "a")) == ((2L, 3750L)))
      assert(got(("00:05", "a")) == ((1L, 2500L)))
    } finally q.stop()
  }

  test("benfordStream: windowed digit counts with a visible zero " +
      "bucket, streaming equals the batch digit histogram") {
    // values 523 -> digit 5; -34 -> 3; 0 -> zero bucket (null digit)
    val evs = Seq((ts(2), "a", 523L), (ts(3), "a", -34L),
      (ts(4), "a", 0L), (ts(7), "a", 523L))
      .toDF("ts", "k", "v")
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).toString.substring(11, 16), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))
    val batch = EventStream.benfordStream(evs, "ts", "k", "v",
        "10 minutes", "10 minutes", "1 minute")
      .collect().map(r => key(r) -> r.getLong(3)).toMap
    assert(batch == Map(("00:00", "a", 5L) -> 2L,
      ("00:00", "a", 3L) -> 1L, ("00:00", "a", -1L) -> 1L),
      s"got $batch")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val q = EventStream.benfordStream(
        input.toDF().toDF("ts", "k", "v"),
        "ts", "k", "v", "10 minutes", "10 minutes", "1 minute")
      .writeStream.format("memory").queryName("benford_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(2), "a", 523L), (ts(3), "a", -34L),
        (ts(4), "a", 0L), (ts(7), "a", 523L))
      q.processAllAvailable()
      input.addData((ts(59), "a", 1L)) // advance the watermark
      q.processAllAvailable()
      val stream = spark.table("benford_out").collect()
        .map(r => key(r) -> r.getLong(3)).toMap
      assert(stream == batch, s"stream $stream vs batch $batch")
    } finally q.stop()
  }
}
