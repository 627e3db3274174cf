package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TokenBin

class TokenBinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("tokbin").resolve("d").toString

  test("round trip is value-identical: boundary ids, empty sequence, " +
      "empty partitions, multi-shard") {
    val seqs = Seq(
      (1L, Seq(0, 65535, 42)),          // uint16 boundaries
      (2L, Seq.empty[Int]),             // zero-token sequence
      (3L, (0 until 1000).map(_ * 7 % 65536)),
      (4L, Seq(1, 2, 3)))
      .toDF("seq_id", "tokens")
    val dir = tmp()
    // 8 partitions > 4 rows -> some shards are empty pairs
    TokenBin.write(seqs.repartition(8), "seq_id", "tokens", dir)
    val back = TokenBin.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val want = seqs.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(back == want)
    // shard files come in (bin, idx) pairs
    val fs = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(fs.count(_.endsWith(".bin")) == fs.count(_.endsWith(".idx")))
  }

  test("sliced read returns exactly the id range, empty slice is empty") {
    val seqs = (1L to 20L).map(i => (i, List(i.toInt, i.toInt + 1)))
      .toDF("seq_id", "tokens")
    val dir = tmp()
    TokenBin.write(seqs.repartition(3), "seq_id", "tokens", dir)
    val sl = TokenBin.read(spark, dir, idRange = Some((5L, 9L)))
      .collect().map(_.getLong(0)).sorted
    assert(sl.toSeq == (5L to 9L))
    assert(TokenBin.read(spark, dir, idRange = Some((100L, 200L)))
      .count() == 0)
  }

  test("token id outside uint16 fails the write loudly") {
    val bad = Seq((1L, Seq(70000))).toDF("seq_id", "tokens")
    val e = intercept[org.apache.spark.SparkException] {
      TokenBin.write(bad, "seq_id", "tokens", tmp())
    }
    assert(e.getMessage.contains("uint16") ||
      Option(e.getCause).exists(_.getMessage.contains("uint16")))
  }

  test("null token array / null element fail the write loudly, " +
      "naming the sequence") {
    def rootMsg(e: Throwable): String = {
      var t = e; while (t.getCause != null) t = t.getCause
      Option(t.getMessage).getOrElse("")
    }
    val nullArr = Seq((7L, null.asInstanceOf[Seq[Int]]))
      .toDF("seq_id", "tokens")
    val e1 = intercept[org.apache.spark.SparkException] {
      TokenBin.write(nullArr, "seq_id", "tokens", tmp())
    }
    assert(rootMsg(e1).contains("null token array in sequence 7"))
    val nullElem = Seq((9L, Seq[Integer](1, null, 3)))
      .toDF("seq_id", "tokens")
    val e2 = intercept[org.apache.spark.SparkException] {
      TokenBin.write(nullElem, "seq_id", "tokens", tmp())
    }
    assert(rootMsg(e2).contains("null token in sequence 9"))
  }

  test("idx with a bad magic is refused") {
    val seqs = Seq((1L, Seq(5))).toDF("seq_id", "tokens")
    val dir = tmp()
    TokenBin.write(seqs, "seq_id", "tokens", dir)
    val idx = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".idx")).head
    val raw = java.nio.file.Files.readAllBytes(idx.toPath)
    raw(0) = 'X'.toByte
    java.nio.file.Files.write(idx.toPath, raw)
    // drop hadoop's local-FS checksum sidecar so OUR magic check is
    // what fires, not the transport-level CRC
    new java.io.File(idx.getParentFile, "." + idx.getName + ".crc").delete()
    val e = intercept[org.apache.spark.SparkException] {
      TokenBin.read(spark, dir).collect()
    }
    assert(e.getMessage.contains("magic") ||
      Option(e.getCause).exists(_.getMessage.contains("magic")))
  }
}
