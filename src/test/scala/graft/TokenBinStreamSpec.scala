package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream
import graft.sources.TokenBin

// top-level: Spark cannot synthesize encoders for inner case classes
case class TokSeq(seq_id: Long, tokens: List[Int])

class TokenBinStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tokenBinStream: batches land as committed token-bin shard " +
      "groups; the union read returns everything ingested; an " +
      "uncommitted batch dir is invisible") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_tbs")
    val out = base.resolve("bins").toString
    val ckpt = base.resolve("ckpt").toString
    val input = MemoryStream[TokSeq]
    val q = EventStream.tokenBinStream(input.toDF(), "seq_id", "tokens",
      out, ckpt)
    try {
      input.addData(TokSeq(1L, List(1, 2, 3)), TokSeq(2L, List(4)))
      q.processAllAvailable()
      input.addData(TokSeq(3L, List(5, 6)))
      q.processAllAvailable()
    } finally q.stop()
    val got = TokenBin.read(spark, out).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got == Map(1L -> Seq(1, 2, 3), 2L -> Seq(4), 3L -> Seq(5, 6)))
    // batch dirs carry the _SUCCESS commit markers
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty && dirs.forall(d =>
      new java.io.File(d, "_SUCCESS").exists()))
    // a crashed (uncommitted) batch: shards but no marker -> skipped
    val fake = Seq((99L, List(9, 9))).toDF("seq_id", "tokens")
    TokenBin.write(fake, "seq_id", "tokens",
      new java.io.File(out, "batch-000099").toString)
    val after = TokenBin.read(spark, out).collect().map(_.getLong(0)).toSet
    assert(after == Set(1L, 2L, 3L),
      "uncommitted batch dir must stay invisible to readers")
  }
}
