package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-12 operator family at 10k / 100k / 1M rows.
  * Claims under test:
  *
  *   - Curation.lineDedup: one line explode + a vocabulary-sized
  *     distinct-doc count + anti-join + per-doc ordered rebuild —
  *     linear in corpus lines.
  *   - ContentChunks.winnowDupRemove: the q165 sampled span chain plus
  *     one (doc_id)-keyed token⋈span join — linear when shared-window
  *     density is bounded.
  *   - TextFns.urlCanonicalize + urlHost: pure codegen'd regexp chain,
  *     map-side only — linear, no shuffle at all.
  *   - QualityModel.tokenMulticlassScore: token explode × broadcast
  *     (vocab × classes) + map-side-combined (doc, class) sums —
  *     scan-bound.
  *   - Sketches.logHistRegistersBy: one map-side-combined aggregation
  *     into ≤ 513 cells per group — scan-bound, output saturates.
  *   - Dedup.pairSourceMatrix over planted pairs: two id joins + one
  *     count — linear in pairs.
  *
  * Usage: sbt "runMain graft.NewOpsProbe12" → one JSON line per scale.
  */
object NewOpsProbe12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{ContentChunks, Curation, Dedup, QualityModel}
    import graft.functions.{Sketches, TextFns}
    import spark.implicits._
    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(10000, 100000, 1000000)) {
      // 6 lines of 10 tokens per doc; 10% of docs share a boilerplate
      // first line (the CCNet shape), constant 4k vocabulary
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        concat(
          when(col("id") % 10 === 0, lit("shared cookie banner line\n"))
            .otherwise(lit("")),
          expr("array_join(transform(sequence(0, 5), " +
            "i -> array_join(transform(sequence(0, 9), " +
            "j -> concat('w', pmod(id * 37 + (i * 10 + j) * 13 + j, " +
            "4096))), ' ')), '\n')")).as("text"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
        .localCheckpoint()
      val urls = spark.range(n.toLong).select(col("id").as("doc_id"),
        expr("concat('HTTP://WWW.Site', pmod(id, 50000), " +
          "'.Com:80/P/', pmod(id, 7), '?utm_source=x&id=', id, '#f')")
          .as("url")).localCheckpoint()
      val pairs = spark.range(n.toLong / 2).select(
        (col("id") * 2).as("id1"), (col("id") * 2 + 1).as("id2"))
        .localCheckpoint()

      val tLine = time {
        Curation.lineDedup(docs, "doc_id", "text").select("dup_lines")
          .agg(sum("dup_lines")).head()
      }
      val tWinnow = time {
        ContentChunks.winnowDupRemove(docs, "doc_id", "text", 5, 8)
          .agg(sum("dup_tokens")).head()
      }
      val tUrl = time {
        urls.select(TextFns.urlCanonicalize(col("url")).as("c"),
          TextFns.urlHost(col("url")).as("h"))
          .agg(count(col("c")), count(col("h"))).head()
      }
      val w = Seq(("w1", "en", 3L), ("w2", "en", 2L), ("w3", "de", 2L),
        ("w5", "fr", 2L)).toDF("token", "c", "wt")
      val b = Seq(("en", -1L), ("de", 0L), ("fr", 1L)).toDF("c", "bias")
      val tMc = time {
        QualityModel.tokenMulticlassScore(docs, "doc_id", "text",
          w, "token", "c", "wt", b, "c", "bias")
          .filter(col("is_pred") === 1).count()
      }
      val tLh = time {
        Sketches.logHistRegistersBy(
          docs.select(col("source"), length(col("text")).as("len")),
          Seq("source"), "len").count()
      }
      val tMat = time {
        Dedup.pairSourceMatrix(pairs, docs, "doc_id", "source").count()
      }
      println(s"""{"probe":"newops12","n":$n,""" +
        f""""line_dedup_sec":$tLine%.2f,"winnow_remove_sec":$tWinnow%.2f,""" +
        f""""url_canon_sec":$tUrl%.2f,"multiclass_sec":$tMc%.2f,""" +
        f""""loghist_by_sec":$tLh%.2f,"pair_matrix_sec":$tMat%.2f}""")
    }
    spark.stop()
  }
}
