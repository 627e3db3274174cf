package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

// top-level: Spark cannot synthesize encoders for inner case classes
case class StreamVec(vec_id: Long, embedding: Array[Double])

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  case class Ev(ts: Timestamp, site: String, value: Double)
  def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("windowedAgg aggregates tumbling event-time windows incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = EventStream.windowedAgg(input.toDF(), "ts", "site", "value",
      "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(Ev(ts(0), "a", 1.0), Ev(ts(1), "a", 2.0), Ev(ts(6), "a", 5.0),
        Ev(ts(2), "b", 7.0))
      q.processAllAvailable()
      val got = spark.table("win_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == Set(
        ("2024-01-01 00:00:00.0", "a", 2L, 3.0),
        ("2024-01-01 00:05:00.0", "a", 1L, 5.0),
        ("2024-01-01 00:00:00.0", "b", 1L, 7.0)))
      // late-but-inside-watermark data updates its window
      input.addData(Ev(ts(3), "a", 10.0))
      q.processAllAvailable()
      val upd = spark.table("win_out").collect()
        .find(r => r.getString(1) == "a" && r.getTimestamp(0).toString.contains("00:00:00"))
        .get.getDouble(3)
      assert(upd == 13.0)
    } finally q.stop()
  }

  test("statefulGapFill carries last good value across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{Point, Filled}
    val input = MemoryStream[Point]
    val q = EventStream.statefulGapFill(input.toDS())
      .writeStream.format("memory").queryName("fill_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Point("a", ts(0), 5.0), Point("a", ts(1), 0.0))
      q.processAllAvailable()
      input.addData(Point("a", ts(2), 0.0), Point("a", ts(3), 9.0)) // state crosses batches
      q.processAllAvailable()
      val got = spark.table("fill_out").as[Filled].collect()
        .sortBy(_.ts.getTime).map(f => (f.value, f.filled)).toSeq
      assert(got == Seq((5.0, false), (5.0, true), (5.0, true), (9.0, false)))
    } finally q.stop()
  }

  test("recrawlStream: per-URL state crosses micro-batches and the " +
      "final verdict equals the batch operator's on the same history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{CrawlVerdict, Fetch}
    val input = MemoryStream[Fetch]
    val q = EventStream.recrawlStream(input.toDS(), hotPct = 60,
        warmPct = 20, hotEvery = 100L, warmEvery = 1000L,
        coldEvery = 10000L)
      .writeStream.format("memory").queryName("recrawl_out")
      .outputMode(OutputMode.Append).start()
    try {
      // wave 1: one observation each -> both cold (no signal yet)
      input.addData(Fetch("uH", 10L, 0L), Fetch("uF", 10L, 7L))
      q.processAllAvailable()
      val w1 = spark.table("recrawl_out").as[CrawlVerdict].collect()
        .map(v => v.url -> v.tier).toMap
      assert(w1 == Map("uH" -> "cold", "uF" -> "cold"))
      // wave 2: uH alternates (100% change), uF stays frozen — the
      // change count must have carried uH's batch-1 fingerprint
      input.addData(Fetch("uH", 20L, 1L), Fetch("uH", 30L, 0L),
        Fetch("uF", 20L, 7L), Fetch("uF", 30L, 7L))
      q.processAllAvailable()
      val last = spark.table("recrawl_out").as[CrawlVerdict].collect()
        .groupBy(_.url).map { case (u, vs) => u -> vs.maxBy(_.n_obs) }
      assert(last("uH").tier == "hot" && last("uH").n_changes == 2L &&
        last("uH").next_visit == 130L)
      assert(last("uF").tier == "cold" && last("uF").n_changes == 0L &&
        last("uF").next_visit == 10030L)
      // a LATE cross-batch observation (ts 15 < stored lastTs 30) is
      // dropped: the obs count stays at wave-1+2's 3 and the stale
      // fp 999 cannot register a spurious change
      input.addData(Fetch("uF", 15L, 999L))
      q.processAllAvailable()
      val afterLate = spark.table("recrawl_out").as[CrawlVerdict]
        .collect().filter(_.url == "uF").maxBy(_.n_obs)
      assert(afterLate.n_obs == 3L && afterLate.n_changes == 0L &&
        afterLate.last_ts == 30L && afterLate.tier == "cold",
        s"late event leaked into state: $afterLate")
      // parity with the batch operator over the concatenated history
      val batch = graft.operators.Crawl.recrawlSchedule(
        Seq(("uH", 10L, 0L), ("uH", 20L, 1L), ("uH", 30L, 0L),
          ("uF", 10L, 7L), ("uF", 20L, 7L), ("uF", 30L, 7L))
          .toDF("url", "ts", "fp"),
        "url", "ts", "fp", hotPct = 60, warmPct = 20, hotEvery = 100L,
        warmEvery = 1000L, coldEvery = 10000L).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(4), r.getLong(5))))
        .toMap
      last.foreach { case (u, v) =>
        assert(batch(u) == ((v.n_obs, v.n_changes, v.tier, v.next_visit)),
          s"stream/batch divergence for $u") }
    } finally q.stop()
  }

  test("funnelStream: state crosses micro-batches, strict ordering " +
      "holds, late events drop, final verdicts equal the batch funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{FunnelEvent, FunnelVerdict}
    val input = MemoryStream[FunnelEvent]
    val q = EventStream.funnelStream(input.toDS(),
        Seq("view", "click", "buy"))
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(FunnelEvent(1L, "view", 10L),
        FunnelEvent(1L, "click", 10L),   // equal ts: no progress
        FunnelEvent(2L, "click", 5L))    // click before any view
      q.processAllAvailable()
      input.addData(FunnelEvent(1L, "click", 20L),  // state carried
        FunnelEvent(1L, "buy", 30L),
        FunnelEvent(2L, "view", 8L),
        FunnelEvent(1L, "view", 1L))     // LATE: ts 1 < high water 30
      q.processAllAvailable()
      val last = spark.table("funnel_out").as[FunnelVerdict].collect()
        .groupBy(_.user)
        .map { case (u, vs) => u -> vs.maxBy(_.steps_completed) }
      assert(last(1L).steps_completed == 3 &&
        last(1L).step_ts == Seq(10L, 20L, 30L), s"got ${last(1L)}")
      assert(last(2L).steps_completed == 1 &&
        last(2L).step_ts == Seq(8L, -1L, -1L))
      // parity with the batch operator on the in-order history
      val batch = graft.operators.Funnel.funnel(
        Seq((1L, "view", 10L), (1L, "click", 10L), (2L, "click", 5L),
          (1L, "click", 20L), (1L, "buy", 30L), (2L, "view", 8L))
          .toDF("u", "t", "ts"),
        "u", "t", "ts", Seq("view", "click", "buy")).collect()
        .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3)), r.getInt(4)))).toMap
      last.foreach { case (u, v) =>
        val b = batch(u)
        val bTs = Seq(b._1, b._2, b._3).map(_.getOrElse(-1L))
        assert(bTs == v.step_ts && b._4 == v.steps_completed,
          s"stream/batch divergence for $u: $v vs $b") }
    } finally q.stop()
  }

  test("streamingDedup drops repeat keys within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val dedup = EventStream.streamingDedup(input.toDF(), "ts", Seq("site"), "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(ts(0), "a", 1.0), Ev(ts(1), "a", 2.0), Ev(ts(2), "b", 3.0))
      q.processAllAvailable()
      input.addData(Ev(ts(3), "a", 4.0))
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect().map(_.getString(1)).toSeq.sorted
      assert(got == Seq("a", "b"), s"got $got")
    } finally q.stop()
  }

  case class Doc(doc_id: Long, text: String)

  test("dedupStream: index-backed near-dup dedup across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_sdedup")
    val idx = base.resolve("idx").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "completely unrelated text about spark catalyst and tungsten"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeSignatureIndex(existing, "doc_id", "text", idx,
      shingleN = 2, k = 16, bands = 4, nBuckets = 8)
    val input = MemoryStream[Doc]
    val q = EventStream.dedupStream(input.toDF(), idx, "doc_id", "text",
      threshold = 0.6, out, ckpt)
    try {
      // batch 1: exact copy of existing 1 (dropped), fresh (kept)
      input.addData(
        Doc(10L, "the quick brown fox jumps over the lazy dog near the river"),
        Doc(11L, "entirely novel content nothing like the corpus at all today"))
      q.processAllAvailable()
      // batch 2: near-dup of batch-1's SURVIVOR (dropped — only the
      // between-batch append can know it), plus fresh (kept)
      input.addData(
        Doc(20L, "entirely novel content nothing like the corpus at all  TODAY"),
        Doc(21L, "genuinely brand new material for the second ingestion wave"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 21L), s"stream survivors: $got")
    // the index rolled with each batch: a batch-mode probe of a copy of the
    // LAST streamed survivor dedups against it
    val third = graft.operators.Dedup.dedupIncrementalIndexed(
      Seq((30L, "genuinely brand new material for the second ingestion wave"))
        .toDF("doc_id", "text"), idx, "doc_id", "text", threshold = 0.6)
      .count()
    assert(third == 0L, "streamed survivors must be probe-visible in the index")
  }

  test("hll/cms sketch streams: streamed registers equal the batch sketch " +
      "of everything ingested; redelivered batch no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.functions.Sketches
    val base = java.nio.file.Files.createTempDirectory("graft_sketch")
    val hllPath = base.resolve("hll").toString
    val cmsPath = base.resolve("cms").toString
    val all = (0 until 400).map(i => Doc(i.toLong, s"key${i % 137}"))
    val allT = (0 until 400).map(i => (i.toLong, s"key${i % 137}"))
    val input = MemoryStream[Doc]
    val q1 = EventStream.hllSketchStream(input.toDF(), hllPath, "text",
      p = 8, base.resolve("c1").toString)
    try {
      input.addData(all.take(150): _*); q1.processAllAvailable()
      input.addData(all.slice(150, 300): _*); q1.processAllAvailable()
      input.addData(all.drop(300): _*); q1.processAllAvailable()
    } finally q1.stop()
    val streamed = spark.read.parquet(s"$hllPath/registers").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val batch = Sketches.hllRegisters(allT.toDF("doc_id", "text"), "text")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(streamed == batch,
      "streamed HLL registers must equal the one-shot batch sketch")
    // redelivery of an already-applied batch id must not change anything
    EventStream.sketchBatch(hllPath, "text",
      b => Sketches.hllRegisters(b, "text"),
      (df, cells, v) => df.groupBy(cells.map(col): _*)
        .agg(max(col(v)).as(v)), Seq("bucket"), "rho_max")(
      allT.take(150).toDF("doc_id", "text"), 0L)
    assert(spark.read.parquet(s"$hllPath/registers").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap == batch,
      "replayed batch must no-op")
    // CMS: sum-merge across batches == one-shot counts (replay-guarded)
    val input2 = MemoryStream[Doc]
    val q2 = EventStream.cmsSketchStream(input2.toDF(), cmsPath, "text",
      depth = 4, width = 64, base.resolve("c2").toString)
    try {
      input2.addData(all.take(200): _*); q2.processAllAvailable()
      input2.addData(all.drop(200): _*); q2.processAllAvailable()
    } finally q2.stop()
    val streamedCms = spark.read.parquet(s"$cmsPath/registers").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val batchCms = Sketches.cmsRegisters(allT.toDF("doc_id", "text"),
      "text", depth = 4, width = 64).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamedCms == batchCms,
      "streamed CMS registers must equal the one-shot batch sketch")
    val est = Sketches.cmsEstimate(
      spark.read.parquet(s"$cmsPath/registers"), Seq("key5"), 4, 64)
      .collect()(0).getLong(1)
    assert(est >= 3, s"key5 appears 3 times, CMS must not undercount: $est")
  }

  test("logHistSketchStream: streamed sum-merged cells equal the " +
      "one-shot batch sketch; quantile readout works off the live relation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.Sketches
    val base = java.nio.file.Files.createTempDirectory("graft_lhstream")
    val path = base.resolve("lh").toString
    val all = (1 until 400).map(i => Doc(i.toLong, s"x$i"))
    val input = MemoryStream[Doc]
    val q = EventStream.logHistSketchStream(input.toDF(), path, "doc_id",
      base.resolve("c").toString)
    try {
      input.addData(all.take(150): _*); q.processAllAvailable()
      input.addData(all.drop(150): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$path/registers").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketches.logHistRegisters(
        all.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch,
      "streamed log-hist registers must equal the one-shot batch sketch")
    val p50 = Sketches.logHistQuantiles(
      spark.read.parquet(s"$path/registers"), Seq(0.5))
      .collect()(0).getLong(3)
    // true p50 of 1..399 is 200; cell lower bound within 12.5%
    assert(p50 <= 200 && 200 < p50 + math.max(1L, p50 >> 3), s"p50=$p50")
  }

  test("bloomSketchStream: streamed OR-merged bits equal the one-shot " +
      "batch filter; members stay positive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.functions.Sketches
    val base = java.nio.file.Files.createTempDirectory("graft_bloomstream")
    val path = base.resolve("bloom").toString
    val all = (0 until 300).map(i => Doc(i.toLong, s"url$i"))
    val input = MemoryStream[Doc]
    val q = EventStream.bloomSketchStream(input.toDF(), path, "text",
      mBits = 4096, kHashes = 4, base.resolve("c").toString)
    try {
      input.addData(all.take(120): _*); q.processAllAvailable()
      input.addData(all.drop(120): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$path/registers")
      .select("bit").collect().map(_.getInt(0)).toSet
    val batch = Sketches.bloomRegisters(
        all.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"), "text",
        mBits = 4096, kHashes = 4)
      .collect().map(_.getInt(0)).toSet
    assert(streamed == batch,
      "streamed Bloom bits must equal the one-shot batch filter")
    val flags = Sketches.bloomMightContain(
        all.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"), "text",
        spark.read.parquet(s"$path/registers").select("bit"),
        mBits = 4096, kHashes = 4)
      .collect().map(_.getBoolean(1))
    assert(flags.length == 300 && flags.forall(identity),
      "every streamed member must probe positive")
  }

  test("sketchBatch crash recovery: every swap window rolls forward or " +
      "back; CMS sums are never lost or double-counted") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Sketches
    val base = java.nio.file.Files.createTempDirectory("graft_sketch_crash")
    val path = base.resolve("cms").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$path/$s")
    def marker(id: Long): Unit = {
      val os = fs.create(p("_pending_sketch.json"), true)
      try os.write(s"""{"batchId":$id}""".getBytes("UTF-8")) finally os.close()
    }
    def apply(rows: Seq[(Long, String)], id: Long): Unit =
      EventStream.sketchBatch(path, "text",
        b => Sketches.cmsRegisters(b, "text", 4, 64),
        (df, cells, v) => df.groupBy(cells.map(col): _*)
          .agg(sum(col(v)).as(v)), Seq("row", "col"), "cnt")(
        rows.toDF("doc_id", "text"), id)
    def regs(): Map[(Int, Int), Long] =
      spark.read.parquet(s"$path/registers").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def oneShot(rows: Seq[(Long, String)]): Map[(Int, Int), Long] =
      Sketches.cmsRegisters(rows.toDF("doc_id", "text"), "text", 4, 64)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b0 = (0 until 50).map(i => (i.toLong, s"k${i % 7}"))
    val b1 = (50 until 90).map(i => (i.toLong, s"k${i % 11}"))
    val b2 = (90 until 130).map(i => (i.toLong, s"k${i % 5}"))
    apply(b0, 0L)
    // window A: died right after the marker write (nothing mutated yet)
    marker(1L)
    apply(b1, 1L)
    assert(regs() == oneShot(b0 ++ b1),
      "rollback of an untouched swap must lose nothing")
    // window B: died mid-swap — registers renamed aside, new not in place
    assert(fs.rename(p("registers"), p("_reg_old")))
    marker(2L)
    apply(b2, 2L)
    assert(regs() == oneShot(b0 ++ b1 ++ b2),
      "recovery must restore _reg_old and re-apply the batch exactly once")
    // window C: died after the meta commit, before cleanup — roll forward
    fs.mkdirs(p("_reg_old"))
    marker(2L)
    apply(b2, 2L) // replay of a committed id: recovery cleans, guard no-ops
    assert(regs() == oneShot(b0 ++ b1 ++ b2),
      "roll-forward + replay guard must not double-count")
    assert(!fs.exists(p("_reg_old")) && !fs.exists(p("_pending_sketch.json"))
      && !fs.exists(p("_reg_tmp")), "recovery must clean all staging state")
  }

  test("textIndexStream: streamed batches searchable, replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextIndex
    val base = java.nio.file.Files.createTempDirectory("graft_stix")
    val idx = base.resolve("idx").toString
    val ckpt = base.resolve("ckpt").toString
    TextIndex.write(Seq((1L, "spark joins today")).toDF("doc_id", "text"),
      "doc_id", "text", idx, nBuckets = 8)
    val input = MemoryStream[Doc]
    val q = EventStream.textIndexStream(input.toDF(), idx, "doc_id", "text", ckpt)
    try {
      input.addData(Doc(10L, "spark query planner"), Doc(11L, "unrelated words"))
      q.processAllAvailable()
      input.addData(Doc(20L, "more spark content arriving"))
      q.processAllAvailable()
    } finally q.stop()
    val hits = TextIndex.search(spark, idx, Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 10L, 20L), s"got $hits")
    // an exact replay of the LAST committed batch (same id range, the
    // at-least-once redelivery after a commit-then-crash) NO-OPS: the
    // index is unchanged, the stream is not wedged
    val before = spark.read.parquet(idx).count()
    TextIndex.append(
      Seq((20L, "more spark content arriving")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    assert(spark.read.parquet(idx).count() == before,
      "an exact replay must leave the index untouched")
    assert(TextIndex.search(spark, idx, Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSet == Set(1L, 10L, 20L))
    // an OVERLAPPING-BUT-UNEQUAL range is a numbering bug, not a replay —
    // still refuses loudly
    val e = intercept[IllegalArgumentException] {
      TextIndex.append(
        Seq((19L, "x"), (20L, "y")).toDF("doc_id", "text"),
        "doc_id", "text", idx)
    }
    assert(e.getMessage.contains("monotone"), e.getMessage)
  }

  test("vectorIndexStream: streamed batches searchable, replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft_svix")
    val idx = base.resolve("idx").toString
    val ckpt = base.resolve("ckpt").toString
    def vec(seed: Long): Array[Double] =
      Array.tabulate(16)(d => ((seed * (d + 3) + d) % 23).toDouble / 23.0)
    val existing = spark.createDataset(
      (0L until 8L).map(i => StreamVec(i, vec(i)))).toDF()
    Similarity.writeIvfPqIndex(existing, "vec_id", "embedding", idx,
      nLists = 4, m = 4, nCodes = 4)
    val input = MemoryStream[StreamVec]
    val q = EventStream.vectorIndexStream(input.toDF(), idx, "vec_id",
      "embedding", ckpt)
    try {
      input.addData(StreamVec(10L, vec(10)), StreamVec(11L, vec(11)))
      q.processAllAvailable()
      input.addData(StreamVec(20L, vec(20)))
      q.processAllAvailable()
    } finally q.stop()
    // all streamed vectors are probe-visible (probe every list so recall
    // is exact), ranked by ADC against the build-time codebooks
    val ids = Similarity.ivfPqTopKIndexed(spark, idx, "vec_id", vec(20).toSeq,
        k = 11, nProbe = 4).collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 8L).toSet ++ Set(10L, 11L, 20L), s"got $ids")
    // an exact replay of the LAST committed batch no-ops (index unchanged)
    val before = spark.read.parquet(s"$idx/codes").count()
    Similarity.appendToIvfPqIndex(
      spark.createDataset(Seq(StreamVec(20L, vec(20)))).toDF(),
      "vec_id", "embedding", idx)
    assert(spark.read.parquet(s"$idx/codes").count() == before,
      "an exact replay must leave the index untouched")
    // an overlapping-but-unequal range still refuses loudly
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIvfPqIndex(
        spark.createDataset(
          Seq(StreamVec(19L, vec(19)), StreamVec(20L, vec(20)))).toDF(),
        "vec_id", "embedding", idx)
    }
    assert(e.getMessage.contains("monotone"), e.getMessage)
  }

  test("dedupStream: exact replay no-ops, overlapping-unequal refuses") {
    // restart-safety claim of EventStream.dedupStream: foreachBatch is
    // at-least-once, so an EXACT redelivery of the last committed batch
    // (commit-then-crash before the streaming checkpoint advanced) must
    // be IDEMPOTENT — empty survivors, index unchanged, stream unwedged —
    // while an overlapping-but-UNEQUAL id range (a numbering bug, not a
    // replay) still refuses loudly before anything is written
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sreplay")
    val idx = base.resolve("idx").toString
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeSignatureIndex(existing, "doc_id", "text", idx,
      shingleN = 2, k = 16, bands = 4, nBuckets = 8)
    val batch = Seq(
      (10L, "entirely novel content nothing like the corpus at all today"),
      (11L, "genuinely brand new material for the second ingestion wave"))
      .toDF("doc_id", "text")
    // first delivery: survivors append, index meta advances
    EventStream.indexedDedupBatch(idx, "doc_id", "text", 0.6)(batch, 0L)
    def postingCount = spark.read.parquet(s"$idx/postings").count()
    val after1 = postingCount
    // exact replay of the SAME batch: empty survivor set, nothing written
    val replay = EventStream.indexedDedupBatch(idx, "doc_id", "text", 0.6)(batch, 1L)
    assert(replay.count() == 0L,
      "a replayed batch's docs all collide with their own indexed identity")
    assert(postingCount == after1,
      "an idempotent replay must leave the index untouched")
    // and no pending-append marker is left behind
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(idx, "_pending_append.json")))
    // an overlapping-but-unequal range refuses at the probe entry
    val skewed = Seq(
      (11L, "genuinely brand new material for the second ingestion wave"),
      (12L, "some other words entirely unrelated to anything prior here"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      EventStream.indexedDedupBatch(idx, "doc_id", "text", 0.6)(skewed, 2L)
    }
    assert(e.getMessage.contains("monotone"), e.getMessage)
    assert(postingCount == after1,
      "a refused replay must leave the index untouched")
    // the stream continues with properly advanced ids
    val next = Seq((20L, "fresh third wave content never seen anywhere before"))
      .toDF("doc_id", "text")
    val surv = EventStream.indexedDedupBatch(idx, "doc_id", "text", 0.6)(next, 3L)
    assert(surv.select("doc_id").as[Long].collect().toSeq == Seq(20L))
  }

  test("lmCountStream: streamed unified counts equal the one-shot tables " +
      "and the scorer sees no difference; replay no-ops") {
    import graft.functions.NgramLm
    import org.apache.spark.sql.functions.{col, sum}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_lmstream")
    val path = base.resolve("lm").toString
    val all = (0 until 120).map(i =>
      Doc(i.toLong, (0 until 25).map(j => s"t${(i * j + j) % 31}")
        .mkString(" ")))
    val input = MemoryStream[Doc]
    val q = EventStream.lmCountStream(input.toDF(), path, "doc_id", "text",
      base.resolve("c").toString)
    try {
      input.addData(all.take(50): _*); q.processAllAvailable()
      input.addData(all.slice(50, 90): _*); q.processAllAvailable()
      input.addData(all.drop(90): _*); q.processAllAvailable()
    } finally q.stop()
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getInt(0), Option(r.getString(1)), Option(r.getString(2)),
        r.getString(3)) -> r.getLong(4)).toMap
    val allDf = all.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val streamed = asMap(spark.read.parquet(s"$path/registers")
      .select("ord", "w2", "w1", "w0", "c"))
    val oneShot = asMap(NgramLm.countsUnified(allDf, "doc_id", "text"))
    assert(streamed == oneShot,
      "streamed unified counts must equal the one-shot tables")
    // replaying an applied batch id must not double-count the sums
    EventStream.sketchBatch(path, "text",
      b => NgramLm.countsUnified(b, "doc_id", "text"),
      (df, cells, v) => df.groupBy(cells.map(col): _*)
        .agg(sum(col(v)).as(v)), Seq("ord", "w2", "w1", "w0"), "c")(
      all.take(50).map(d => (d.doc_id, d.text)).toDF("doc_id", "text"), 0L)
    assert(asMap(spark.read.parquet(s"$path/registers")
      .select("ord", "w2", "w1", "w0", "c")) == oneShot,
      "replayed batch must no-op")
    // the scorer over the persisted relation == the direct two-corpus form
    val scored = (0 until 30).map(i =>
      Doc(10000L + i, (0 until 20).map(j => s"t${(i + j * j) % 37}")
        .mkString(" ")))
    val scoredDf = scored.map(d => (d.doc_id, d.text))
      .toDF("doc_id", "text")
    val viaCounts = NgramLm.backoffDocStatsFromCounts(scoredDf,
        spark.read.parquet(s"$path/registers"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val direct = NgramLm.backoffDocStats(scoredDf, allDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(viaCounts == direct,
      "scoring against streamed counts must equal the direct form")
  }

  test("textIndexStream maintenance wiring: many appends trip " +
      "fileTrigger and the verdict surfaces in the sink log") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextIndex
    val base = java.nio.file.Files.createTempDirectory("graft_stmx")
    val idx = base.resolve("idx").toString
    val ckpt = base.resolve("ckpt").toString
    val mlog = base.resolve("mlog").toString
    TextIndex.write(Seq((1L, "spark base doc")).toDF("doc_id", "text"),
      "doc_id", "text", idx, nBuckets = 4)
    val input = MemoryStream[Doc]
    // default maxFilesPerBucket = 16: the bucket holding 'spark' gains
    // one file per append, so ~17 streamed batches trip the compaction
    // verdict inside the stream itself
    val q = EventStream.textIndexStream(input.toDF(), idx, "doc_id",
      "text", ckpt, maintenanceEvery = 1, maintenanceLog = mlog)
    try {
      (0 until 17).foreach { i =>
        input.addData(Doc(10L + i, s"spark streamed doc number$i"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val log = spark.read.parquet(mlog)
      .select("batch_id", "action", "due")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    assert(log.size == 17, s"one verdict row per batch: ${log.size}")
    // early batches: healthy index, no action; by the last batch the
    // hot bucket has > 16 files -> compact, due
    assert(log(0L) == (("none", false)), log(0L).toString)
    assert(log(16L) == (("compact", true)), log(16L).toString)
    // the surfaced verdict must agree with a direct call
    val direct = TextIndex.maintenanceDue(spark, idx)
    assert(direct.fileTrigger && direct.action == "compact")
    // and the wiring must not have polluted the index directory itself
    assert(TextIndex.search(spark, idx, Seq("spark"), 30)
      .collect().length == 18)
  }

  test("dedupStream + vectorIndexStream maintenance wiring: verdicts " +
      "surface per cadence and agree with the direct calls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_smx2")
    // signature index path, cadence 2 -> batches 0 and 2 checked
    val idx = base.resolve("idx").toString
    val mlog = base.resolve("mlog").toString
    graft.operators.Dedup.writeSignatureIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text"),
      "doc_id", "text", idx, shingleN = 2, k = 16, bands = 4, nBuckets = 8)
    val input = MemoryStream[Doc]
    val q = EventStream.dedupStream(input.toDF(), idx, "doc_id", "text",
      threshold = 0.6, base.resolve("out").toString,
      base.resolve("ckpt").toString, maintenanceEvery = 2,
      maintenanceLog = mlog)
    try {
      (0 until 3).foreach { i =>
        input.addData(Doc(10L + i, s"fresh content wave number$i arriving"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.read.parquet(mlog)
      .select("batch_id", "action").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set(0L, 2L), s"cadence-2 batches: ${rows.keySet}")
    val direct = graft.operators.Dedup
      .signatureIndexMaintenanceDue(spark, idx)
    assert(rows(2L) == direct.action, s"${rows(2L)} vs ${direct.action}")

    // vector index path, cadence 1
    val vidx = base.resolve("vidx").toString
    val vlog = base.resolve("vlog").toString
    def vec(seed: Long): Array[Double] =
      Array.tabulate(16)(d => ((seed * (d + 3) + d) % 23).toDouble / 23.0)
    graft.operators.Similarity.writeIvfPqIndex(
      spark.createDataset((0L until 8L).map(i => StreamVec(i, vec(i))))
        .toDF(),
      "vec_id", "embedding", vidx, nLists = 4, m = 4, nCodes = 4)
    val vin = MemoryStream[StreamVec]
    val vq = EventStream.vectorIndexStream(vin.toDF(), vidx, "vec_id",
      "embedding", base.resolve("vckpt").toString, maintenanceEvery = 1,
      maintenanceLog = vlog)
    try {
      vin.addData(StreamVec(10L, vec(10)))
      vq.processAllAvailable()
    } finally vq.stop()
    val vrows = spark.read.parquet(vlog)
      .select("batch_id", "action").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vdirect = graft.operators.Similarity.maintenanceDue(spark, vidx)
    assert(vrows == Map(0L -> vdirect.action), s"$vrows vs $vdirect")
  }

  test("cusumStream: state crosses micro-batches, late rows drop, " +
      "emissions equal the batch cusum window factoring") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{CusumOut, CusumPoint}
    val input = MemoryStream[CusumPoint]
    val q = EventStream.cusumStream(input.toDS(), mu = 10L, kappa = 2L)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode(OutputMode.Append).start()
    try {
      // the DriftSpec hand fixture, split across two micro-batches
      input.addData(CusumPoint("a", 1L, 1L, 10L),
        CusumPoint("a", 2L, 2L, 10L), CusumPoint("a", 3L, 3L, 20L))
      q.processAllAvailable()
      input.addData(CusumPoint("a", 4L, 4L, 20L),
        CusumPoint("a", 5L, 5L, 5L), CusumPoint("a", 6L, 6L, 10L),
        CusumPoint("a", 2L, 9L, 999L), // LATE: ts 2 < high water 6
        CusumPoint("b", 1L, 1L, 100L))
      q.processAllAvailable()
      val got = spark.table("cusum_out").as[CusumOut].collect()
        .map(o => (o.key, o.ts) -> ((o.s_pos, o.s_neg))).toMap
      assert(got.size == 7, s"late row not dropped: $got")
      // parity with the batch operator over the in-order history
      val batch = graft.operators.Drift.cusum(
        Seq(("a", 1L, 1L, 10L), ("a", 2L, 2L, 10L), ("a", 3L, 3L, 20L),
          ("a", 4L, 4L, 20L), ("a", 5L, 5L, 5L), ("a", 6L, 6L, 10L),
          ("b", 1L, 1L, 100L)).toDF("k", "ts", "tie", "v"),
        "k", "ts", "tie", "v", mu = 10L, kappa = 2L).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      assert(got == batch, s"stream $got vs batch $batch")
    } finally q.stop()
  }

  test("sprtStream: decision fires mid-stream, later and late rows " +
      "absorbed, emissions equal the batch walk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{SprtOut, SprtPoint}
    val input = MemoryStream[SprtPoint]
    val q = EventStream.sprtStream(input.toDS(),
        p0Milli = 200L, p1Milli = 800L,
        alphaMilli = 50L, betaMilli = 50L)
      .writeStream.format("memory").queryName("sprt_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(SprtPoint("e", 1L, 1L, 1L),
        SprtPoint("e", 2L, 2L, 1L))
      q.processAllAvailable()
      input.addData(SprtPoint("e", 3L, 3L, 1L), // crosses ln19 here
        SprtPoint("e", 4L, 4L, 1L),             // post-decision
        SprtPoint("e", 1L, 9L, 0L))             // late: ts 1 < hwm 2
      q.processAllAvailable()
      val got = spark.table("sprt_out").as[SprtOut].collect()
        .sortBy(_.ts)
      assert(got.length == 3,
        s"post-decision/late rows not absorbed: ${got.toSeq}")
      assert(got.map(_.decision).toSeq ==
        Seq("continue", "continue", "reject_h0"))
      // parity with the batch operator's decision row
      val batch = graft.operators.Experiment.sprtBinary(
        Seq(("e", 1L, 1L, 1L), ("e", 2L, 2L, 1L), ("e", 3L, 3L, 1L),
          ("e", 4L, 4L, 1L)).toDF("e", "t", "i", "c"),
        "e", "t", "i", "c", 200L, 800L, 50L, 50L).collect()(0)
      assert(batch.getAs[Long]("n_at_decision") == 3L &&
        got(2).llr_micro == batch.getAs[Long]("llr_at_decision") &&
        got(2).n == 3L, s"stream ${got(2)} vs batch $batch")
    } finally q.stop()
  }

  test("eProcessStream: threshold fires mid-stream, later and late " +
      "rows absorbed, integer nano state equals the batch walk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{EProcOut, SprtPoint}
    val input = MemoryStream[SprtPoint]
    // p0 = 0.2, alpha = 0.05 -> threshold ln20 = 2995732273 nano;
    // three straight conversions cross it (cum ln terms
    // ln2.5 + ln3.75 + ln(25/6) ~ 3.665 nats)
    val q = EventStream.eProcessStream(input.toDS(),
        p0Milli = 200L, alphaMilli = 50L)
      .writeStream.format("memory").queryName("eproc_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(SprtPoint("e", 1L, 1L, 1L),
        SprtPoint("e", 2L, 2L, 1L))
      q.processAllAvailable()
      input.addData(SprtPoint("e", 3L, 3L, 1L), // crosses ln20 here
        SprtPoint("e", 4L, 4L, 1L),             // post-decision
        SprtPoint("e", 1L, 9L, 0L))             // late: ts 1 < hwm 2
      q.processAllAvailable()
      val got = spark.table("eproc_out").as[EProcOut].collect()
        .sortBy(_.ts)
      assert(got.length == 3,
        s"post-decision/late rows not absorbed: ${got.toSeq}")
      assert(got.map(_.decision).toSeq ==
        Seq("continue", "continue", "reject_h0"))
      val batch = graft.operators.Experiment.eProcessBinary(
        Seq(("e", 1L, 1L, 1L), ("e", 2L, 2L, 1L), ("e", 3L, 3L, 1L),
          ("e", 4L, 4L, 1L)).toDF("e", "t", "i", "c"),
        "e", "t", "i", "c", 200L, 50L).collect()(0)
      assert(batch.getAs[Long]("n_at_decision") == 3L &&
        got(2).e_nano == batch.getAs[Long]("e_at_decision") &&
        got(2).n == 3L, s"stream ${got(2)} vs batch $batch")
    } finally q.stop()
  }

  test("eProcessMeanStream: betting walk across micro-batches " +
      "equals the batch decision fields bit-for-bit; post-decision " +
      "and late rows absorbed; out-of-range value fails loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{EProcMeanOut, MeanPoint}
    val input = MemoryStream[MeanPoint]
    // m = 300 milli, alpha = 0.05: a steady 900-milli stream bets up
    // fast (lam caps at 1666) and crosses ln20 within a few rows
    val q = EventStream.eProcessMeanStream(input.toDS(),
        mMilli = 300L, alphaMilli = 50L)
      .writeStream.format("memory").queryName("eprocmean_out")
      .outputMode(OutputMode.Append).start()
    try {
      val vs = Seq(900L, 850L, 920L, 880L, 900L, 910L, 890L, 900L)
      input.addData(vs.take(3).zipWithIndex.map { case (v, i) =>
        MeanPoint("e", i + 1L, i + 1L, v) }: _*)
      q.processAllAvailable()
      input.addData((vs.drop(3).zipWithIndex.map { case (v, i) =>
        MeanPoint("e", i + 4L, i + 4L, v) } :+
        MeanPoint("e", 1L, 9L, 0L)): _*)   // late: ts 1 < high water
      q.processAllAvailable()
      val got = spark.table("eprocmean_out").as[EProcMeanOut]
        .collect().sortBy(_.ts)
      val batch = graft.operators.Experiment.eProcessMean(
        vs.zipWithIndex.map { case (v, i) =>
          ("e", i + 1L, i + 1L, v) }.toDF("e", "t", "i", "v"),
        "e", "t", "i", "v", 300L, 50L).collect()(0)
      assert(batch.getAs[String]("decision") == "reject_h0",
        s"fixture must cross: $batch")
      val nDec = batch.getAs[Long]("n_at_decision")
      // the stream stops emitting AT the decision row
      assert(got.length == nDec,
        s"post-decision/late rows not absorbed: ${got.toSeq}")
      assert(got.last.decision == "reject_h0" &&
        got.dropRight(1).forall(_.decision == "continue"))
      assert(got.last.n == nDec &&
        got.last.e_nano == batch.getAs[Long]("e_at_decision") &&
        got.last.ts == batch.getAs[Long]("decision_ts") &&
        got.last.tie == batch.getAs[Long]("decision_tie"),
        s"stream ${got.last} vs batch $batch")
      // every pre-decision stream row equals the batch walk's
      // running e at that n (in-order arrivals, decision scope)
      val walkRows = got.map(o => o.n -> o.e_nano).toMap
      assert(walkRows.size == got.length)
    } finally q.stop()
    // out-of-range value fails the job loudly
    val bad = MemoryStream[MeanPoint]
    val qb = EventStream.eProcessMeanStream(bad.toDS(), 300L, 50L)
      .writeStream.format("memory").queryName("eprocmean_bad")
      .outputMode(OutputMode.Append).start()
    try {
      bad.addData(MeanPoint("e", 1L, 1L, 1001L))
      val err = intercept[Exception] { qb.processAllAvailable() }
      def root(t: Throwable): Throwable =
        if (t.getCause == null) t else root(t.getCause)
      assert(err.toString.contains("outside [0, 1000]") ||
        root(err).getMessage.contains("outside [0, 1000]"))
    } finally qb.stop()
  }

  test("growthStream: per-user transitions across micro-batches " +
      "equal the batch statuses; late and duplicate periods drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{GrowthOut, GrowthPoint}
    val input = MemoryStream[GrowthPoint]
    val q = EventStream.growthStream(input.toDS())
      .writeStream.format("memory").queryName("growth_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(GrowthPoint(1L, 0L), GrowthPoint(1L, 1L),
        GrowthPoint(2L, 1L))
      q.processAllAvailable()
      input.addData(GrowthPoint(1L, 3L),  // gap -> resurrected
        GrowthPoint(1L, 1L),              // late: <= high water 1
        GrowthPoint(2L, 2L), GrowthPoint(2L, 2L), // dup in batch
        GrowthPoint(3L, 3L))
      q.processAllAvailable()
      val got = spark.table("growth_out").as[GrowthOut].collect()
        .map(o => (o.user, o.p) -> o.status).toMap
      assert(got == Map((1L, 0L) -> "new", (1L, 1L) -> "retained",
        (2L, 1L) -> "new", (1L, 3L) -> "resurrected",
        (2L, 2L) -> "retained", (3L, 3L) -> "new"), s"got $got")
      // parity: the batch operator's per-period counts over the
      // same in-order history
      val batch = graft.operators.Funnel.growthAccounting(
        Seq((1L, 0L), (1L, 1L), (2L, 1L), (1L, 3L), (2L, 2L),
          (3L, 3L)).toDF("u", "ts"), "u", "ts", periodNs = 1L)
        .collect().map(r => r.getAs[Long]("period") ->
          ((r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
            r.getAs[Long]("n_resurrected")))).toMap
      val stream = got.groupBy(_._1._2).map { case (p, g) =>
        p -> ((g.values.count(_ == "new").toLong,
          g.values.count(_ == "retained").toLong,
          g.values.count(_ == "resurrected").toLong)) }
      assert(stream == batch.view.filterKeys(stream.contains).toMap,
        s"stream $stream vs batch $batch")
    } finally q.stop()
  }

  test("bucketHistogramStream: windowed bucket counts equal the batch " +
      "histogram; null buckets refuse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class BEv(ts: Timestamp, k: String, b: Long)
    val rows = Seq((ts(2), "a", 1L), (ts(3), "a", 1L), (ts(4), "a", 2L),
      (ts(12), "a", 1L))
    val batch = EventStream.bucketHistogramStream(
        rows.toDF("ts", "k", "b"), "ts", "k", "b",
        "10 minutes", "10 minutes", "1 minute")
      .collect().map(r => (r.getTimestamp(0).toString.substring(14, 16),
        r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(batch == Map(("00", "a", 1L) -> 2L, ("00", "a", 2L) -> 1L,
      ("10", "a", 1L) -> 1L), s"got $batch")
    val input = MemoryStream[(Timestamp, String, Long)]
    val q = EventStream.bucketHistogramStream(
        input.toDF().toDF("ts", "k", "b"), "ts", "k", "b",
        "10 minutes", "10 minutes", "1 minute")
      .writeStream.format("memory").queryName("hist_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((ts(59), "a", 9L)) // advance the watermark
      q.processAllAvailable()
      val stream = spark.table("hist_out").collect()
        .map(r => (r.getTimestamp(0).toString.substring(14, 16),
          r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
      assert(stream == batch, s"stream $stream vs batch $batch")
    } finally q.stop()
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val bad = intercept[Exception] {
      EventStream.bucketHistogramStream(
        Seq((ts(1), "a", Option.empty[Long])).toDF("ts", "k", "b"),
        "ts", "k", "b", "10 minutes", "10 minutes", "1 minute")
        .collect()
    }
    assert(rc(bad).getMessage.contains("bucketHistogramStream bucket"))
  }
}
