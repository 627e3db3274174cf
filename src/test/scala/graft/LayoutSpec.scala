package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton key straight from the definition. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 31).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zorder2 magic-number spread equals the per-bit definition") {
    val pts = for (x <- Seq(0L, 1L, 2L, 3L, 255L, 256L, 12345L, (1L << 31) - 1);
                   y <- Seq(0L, 1L, 7L, 100L, 65535L, (1L << 31) - 1)) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder2(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // top bits of 2^31-1 inputs land at positions 60/61: key stays >= 0
    assert(got.forall(_.getLong(2) >= 0L))
  }

  test("curve self-similarity: dropping 2k key bits = bucketing both " +
      "dims by 2^k (each key prefix IS an axis-aligned square)") {
    val pts = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val bad = pts.select(
        shiftright(Layout.zorder2(col("x"), col("y")), 4).as("a"),
        Layout.zorder2(shiftright(col("x"), 2), shiftright(col("y"), 2)).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("equiWidthBucket: exact floors at bucket boundaries, full range " +
      "covered, bounds enforced") {
    val vals = Seq(0L, 1L, 127L, 128L, 129L, 16383L, 16384L, 32767L)
    val got = vals.toDF("v")
      .select(Layout.equiWidthBucket(col("v"), 0L, 32767L, 8).as("b"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == vals.map(v => v * 256L / 32768L))
    // shifted domain
    val g2 = Seq(10L, 109L, 110L).toDF("v")
      .select(Layout.equiWidthBucket(col("v"), 10L, 109L, 1).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(g2 == Seq(0L, 1L, 2L)) // 110 is out of the declared domain
    intercept[IllegalArgumentException] {
      Layout.equiWidthBucket(col("v"), 0L, 10L, 21)
    }
    intercept[IllegalArgumentException] {
      Layout.equiWidthBucket(col("v"), 5L, 4L, 4)
    }
  }

  test("clusterByZorder: range partitions carry disjoint key ranges and " +
      "cell envelopes are tight on both dimensions at once") {
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val c = Layout.clusterByZorder(grid, "x", "y", nParts = 8, bits = 6)
    // contiguous non-overlapping partition key ranges (range shuffle)
    val ranges = c.select(spark_partition_id().as("p"), col("__zkey"))
      .groupBy("p").agg(min("__zkey").as("lo"), max("__zkey").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
    // every 16-cell: x-span and y-span both <= 16 (the pruning envelope;
    // a single-column sort would leave the other dimension's span at 64)
    val spans = c.groupBy(shiftright(col("__zkey"), 8).as("cell"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .agg(max("sx"), max("sy")).head()
    assert(spans.getLong(0) <= 16L && spans.getLong(1) <= 16L)
  }
}
