package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-13 trainer data-prep family at 10k /
  * 100k / 1M documents. Claims under test:
  *
  *   - Sft.renderChatML + tokenLossMask: one conv-partitioned window
  *     chain + HOF exists — linear in turns/tokens, no joins.
  *   - TokenBin write→read: one shard pair per partition, O(bytes);
  *     the sliced read's bytes scale with the SLICE, not the corpus.
  *   - TrainPrep.blockPack: shard-local prefix sum + arithmetic block
  *     fan-out — linear, no global order.
  *   - TrainPrep.epochShards: lateral chunk explode + per-shard rank —
  *     linear; reseeding costs the same pass.
  *   - TrainPrep.spanCorrupt: two doc-partitioned window passes + one
  *     ordered collect — linear in words.
  *
  * Usage: sbt "runMain graft.NewOpsProbe13c" → one JSON line per scale.
  */
object NewOpsProbe13c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Sft, TrainPrep}
    import graft.sources.TokenBin

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(10000, 100000, 1000000)) {
      // ~40-word synthetic docs, deterministic content
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 39), " +
          "j -> concat('w', pmod(id * 37 + j * 13, 4096))), ' ')")
          .as("text")).localCheckpoint()

      // SFT render + loss mask (5-turn convs from each doc's words)
      val turns = docs.select(col("doc_id").as("conv"),
          split(col("text"), " ").as("w"))
        .select(col("conv"), expr(
          "explode(array(" +
            "struct(0 AS ix, 'system' AS role, 'be helpful' AS c), " +
            "struct(1 AS ix, 'user' AS role, concat_ws(' ', slice(w, 1, 8)) AS c), " +
            "struct(2 AS ix, 'assistant' AS role, concat_ws(' ', slice(w, 9, 12)) AS c), " +
            "struct(3 AS ix, 'user' AS role, concat_ws(' ', slice(w, 21, 6)) AS c), " +
            "struct(4 AS ix, 'assistant' AS role, concat_ws(' ', slice(w, 27, 14)) AS c)))")
          .as("t"))
        .select(col("conv"), col("t.ix").as("ix"), col("t.role").as("role"),
          col("t.c").as("c"))
      var maskedToks = 0L
      val tSft = time {
        maskedToks = Sft.tokenLossMask(
            Sft.renderChatML(turns, "conv", "ix", "role", "c"))
          .filter(col("masked")).count()
      }

      // token-bin round trip + sliced read
      val seqs = docs.select(col("doc_id").as("seq_id"),
        expr("transform(split(text, ' '), " +
          "w -> CAST((length(w) * 257 + ascii(substring(w, 1, 1))) % " +
          "65536 AS INT))").as("tokens")).localCheckpoint()
      val dir = java.nio.file.Files.createTempDirectory("probe_tokbin")
        .resolve("bin").toString
      val shards = math.max(4, n / 25000)
      val tBinWrite = time {
        TokenBin.write(seqs.repartition(shards), "seq_id", "tokens", dir) }
      var readBack = 0L
      val tBinRead = time { readBack = TokenBin.read(spark, dir).count() }
      // slice = 1% of the id space — cost should not follow n
      var sliceRows = 0L
      val tBinSlice = time {
        sliceRows = TokenBin.read(spark, dir,
          idRange = Some((0L, n / 100L))).count() }

      var packRows = 0L
      val tPack = time {
        packRows = TrainPrep.blockPack(seqs, "seq_id", "tokens",
          blockSize = 2048, nShards = 32)
          .agg(sum(col("e_in_block") - col("s_in_block"))).collect()
          .head.getLong(0)
      }
      var shardRows = 0L
      val tShards = time {
        shardRows = TrainPrep.epochShards(seqs, "seq_id", "tokens",
          width = 32, stride = 24, nShards = 32, seed = 3L)
          .groupBy(col("shard")).count().collect().map(_.getLong(1)).sum
      }
      var corrupted = 0L
      val tCorrupt = time {
        corrupted = TrainPrep.spanCorrupt(docs, "doc_id", "text")
          .agg(sum(col("n_masked"))).collect().head.getLong(0)
      }
      try {
        val root = java.nio.file.Paths.get(dir).getParent
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally walk.close()
      } catch { case _: Exception => () }
      println(f"""{"n":$n,"shards":$shards,"masked_toks":$maskedToks,""" +
        f""""read_back":$readBack,"slice_rows":$sliceRows,""" +
        f""""packed_toks":$packRows,"shard_windows":$shardRows,""" +
        f""""corrupted_toks":$corrupted,"sft_mask_s":$tSft%.2f,""" +
        f""""bin_write_s":$tBinWrite%.2f,"bin_read_s":$tBinRead%.2f,""" +
        f""""bin_slice_s":$tBinSlice%.2f,"block_pack_s":$tPack%.2f,""" +
        f""""epoch_shards_s":$tShards%.2f,"span_corrupt_s":$tCorrupt%.2f}""")
    }
    spark.stop()
  }
}
