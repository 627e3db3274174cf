package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pruning evidence for the Z-order layout (`operators/Layout`): write
  * the SAME 4M-row relation under (a) a single-column sort on `x` and
  * (b) `clusterByZorder(x, y)`, then — deterministically, from the
  * written files' actual per-file min/max envelopes (what a manifest-
  * based engine prunes on, and what parquet row-group stats prune on
  * at the next granularity down) — count how many files a range
  * predicate on EACH dimension must touch. Also reports measured scan
  * times for the same filters (row-group pushdown pruning).
  *
  * The claim: the x-sorted layout prunes x-predicates perfectly and
  * y-predicates not at all (every file spans the full y domain); the
  * Z-ordered layout prunes BOTH to ~√-fraction — multi-dimensional
  * pruning for the price of one range shuffle.
  *
  * Usage: sbt "runMain graft.ZorderPruneProbe" → one JSON line.
  */
object ZorderPruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Layout

    val n = 4000000L
    val xMax = 1L << 20
    val yMax = 1L << 14
    val base = java.nio.file.Files.createTempDirectory("zprune").toString
    val df = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(xMax)).as("x"),
      pmod(col("id") * 40503L, lit(yMax)).as("y"),
      col("id").as("payload"))

    val sortedDir = s"$base/sorted_x"
    df.repartitionByRange(32, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(sortedDir)
    val zDir = s"$base/zorder"
    Layout.clusterByZorder(df, "x", "y", nParts = 32, bits = 10)
      .drop("__zkey").write.mode("overwrite").parquet(zDir)

    // file-level envelopes from the data actually written
    def envelopes(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
    // a mid-domain 1/16 range on each dimension
    val (xa, xb) = (xMax * 7 / 16, xMax * 8 / 16 - 1)
    val (ya, yb) = (yMax * 7 / 16, yMax * 8 / 16 - 1)
    def touched(env: Array[org.apache.spark.sql.Row],
        lo: Long, hi: Long, c0: Int): Int =
      env.count(r => r.getLong(c0) <= hi && r.getLong(c0 + 1) >= lo)
    val es = envelopes(sortedDir)
    val ez = envelopes(zDir)
    val sortedFiles = es.length
    val zFiles = ez.length
    val sX = touched(es, xa, xb, 1); val sY = touched(es, ya, yb, 3)
    val zX = touched(ez, xa, xb, 1); val zY = touched(ez, ya, yb, 3)

    def scanTime(dir: String, cond: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(dir).filter(cond).agg(sum("payload")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once, then measure
    scanTime(sortedDir, col("x") === -1); scanTime(zDir, col("x") === -1)
    val tSortedY = scanTime(sortedDir, col("y").between(ya, yb))
    val tZy = scanTime(zDir, col("y").between(ya, yb))
    val tSortedX = scanTime(sortedDir, col("x").between(xa, xb))
    val tZx = scanTime(zDir, col("x").between(xa, xb))

    println(f"""{"n":$n,"files_sorted":$sortedFiles,"files_z":$zFiles,""" +
      f""""touched_x_sorted":$sX,"touched_x_z":$zX,""" +
      f""""touched_y_sorted":$sY,"touched_y_z":$zY,""" +
      f""""scan_y_sorted_s":$tSortedY%.2f,"scan_y_z_s":$tZy%.2f,""" +
      f""""scan_x_sorted_s":$tSortedX%.2f,"scan_x_z_s":$tZx%.2f}""")

    try {
      val root = java.nio.file.Paths.get(base)
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    } catch { case _: Exception => () }
    spark.stop()
  }
}
