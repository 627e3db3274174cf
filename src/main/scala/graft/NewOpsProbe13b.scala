package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-13 crawl-layer family at 10k / 100k / 1M
  * rows. Claims under test:
  *
  *   - sources.Warc write→read: Content-Length-walked parse is
  *     O(bytes) per file with parallelism = shard count — per-record
  *     cost flat as the corpus grows (shards grow in count, not size).
  *   - TextFns.htmlToText/htmlAnchors: codegen'd regexp scans — linear
  *     in html bytes.
  *   - Layout.zorder2/clusterByZorder: key is builtin shift/mask ops
  *     (scan-speed); the cluster step is exactly one range shuffle.
  *   - Crawl.crawlDelta: one full-outer shuffle join + two uniqueness
  *     count aggs — linear.
  *
  * Usage: sbt "runMain graft.NewOpsProbe13b" → one JSON line per scale.
  */
object NewOpsProbe13b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFns
    import graft.operators.{Crawl, Layout}
    import graft.sources.Warc

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(10000, 100000, 1000000)) {
      val shards = math.max(4, n / 25000) // ~25k records/shard, like real dumps
      val pages = spark.range(n.toLong).select(
        concat(lit("<urn:p:"), col("id"), lit(">")).as("record_id"),
        concat(lit("http://h"), pmod(col("id"), lit(1000)),
          lit(".example.com/p/"), col("id")).as("target_uri"),
        lit("2026-08-15T00:00:00Z").as("warc_date"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        lit(200).as("http_status"),
        concat(lit("<html><head><title>p"), col("id"),
          lit("</title></head><body><p>"),
          expr("array_join(transform(sequence(0, 39), " +
            "j -> concat('w', pmod(id * 37 + j * 13, 4096))), ' ')"),
          lit("</p><a href=\"http://t"), pmod(col("id") * 3 + 7, lit(997)),
          lit(".example.net/\">w1 w2</a></body></html>")).as("body"))
        .localCheckpoint()
      val dir = java.nio.file.Files.createTempDirectory("probe_warc").toString
      val tWrite = time { Warc.write(pages.repartition(shards), dir) }
      var parsed = 0L
      val tRead = time { parsed = Warc.read(spark, dir).count() }
      val read = Warc.read(spark, dir).localCheckpoint()
      val tExtract = time {
        read.select(TextFns.htmlToText(col("body")).as("t"),
            TextFns.htmlAnchors(col("body")).as("a"))
          .selectExpr("sum(length(t))", "sum(size(a))").collect()
      }
      val xy = spark.range(n.toLong).select(
        pmod(col("id") * 2654435761L, lit(1 << 20)).as("x"),
        pmod(col("id") * 40503L, lit(1 << 14)).as("y")).localCheckpoint()
      val tZkey = time {
        xy.select(Layout.zorder2(col("x"), col("y")).as("z"))
          .agg(sum(col("z"))).collect()
      }
      val tCluster = time {
        Layout.clusterByZorder(xy, "x", "y", nParts = 32, bits = 10)
          .foreach { _ => () }
      }
      val oldSnap = spark.range(n.toLong)
        .filter(pmod(col("id"), lit(11)) =!= 3)
        .select(concat(lit("u"), col("id")).as("url"),
          pmod(col("id") * 7L, lit(1000)).as("fp"))
      val newSnap = spark.range(n.toLong)
        .filter(pmod(col("id"), lit(7)) =!= 0)
        .select(concat(lit("u"), col("id")).as("url"),
          pmod(col("id") * 7L + when(pmod(col("id"), lit(5)) === 0, 1L)
            .otherwise(0L), lit(1000)).as("fp"))
      var deltaRows = 0L
      val tDelta = time {
        deltaRows = Crawl.crawlDelta(oldSnap, newSnap, "url", "fp")
          .groupBy(col("status")).count().collect().map(_.getLong(1)).sum
      }
      // clean up scratch
      try {
        val root = java.nio.file.Paths.get(dir)
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally walk.close()
      } catch { case _: Exception => () }
      println(f"""{"n":$n,"shards":$shards,"parsed":$parsed,""" +
        f""""delta_rows":$deltaRows,"warc_write_s":$tWrite%.2f,""" +
        f""""warc_read_s":$tRead%.2f,"html_extract_s":$tExtract%.2f,""" +
        f""""zkey_s":$tZkey%.2f,"zcluster_s":$tCluster%.2f,""" +
        f""""crawl_delta_s":$tDelta%.2f}""")
    }
    spark.stop()
  }
}
