package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B measurement for SHIFT-RESISTANT near-dup detection — the question
  * the round-10 chunk/fingerprint primitives exist to answer: a crawl
  * re-serves a page with a new header (k tokens prepended) and a few
  * in-place edits; which detector still pairs it with the original?
  *
  *   A. whole-doc exact hash (`Dedup.exact`)  — baseline, shift-fragile
  *   B. MinHash-LSH candidate pairs           — set-similarity, robust to
  *      position but diluted by edits at small shingle overlap
  *   C. CDC shared chunks (`ContentChunks`)   — boundary re-sync after the
  *      insertion, shared tail chunks
  *   D. winnowing shared fingerprints         — local-window minima,
  *      positionally robust by construction
  *
  * Corpus: nPairs base docs of `docLen` tokens from a Zipf-ish vocab;
  * each partner gets `prefixLen` prepended tokens and `nEdits` token
  * substitutions at deterministic positions. Ground truth = (i, i+N).
  * Reported per method: recall over true pairs, spurious pair count
  * (candidate precision proxy — exactness differs by design across
  * methods, so this is a detection-stage comparison, not an end-to-end
  * dedup quality score), and wall seconds.
  *
  * Usage: sbt "runMain graft.ShiftDedupAb" → one JSON line per config.
  */
object ShiftDedupAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{ContentChunks, Dedup}

    val nPairs = 2000
    val docLen = 120
    def corpus(prefixLen: Int, nEdits: Int): DataFrame = {
      // base doc i: tokens b{(i*37+j*j*13+j) % 4096}; partner i+nPairs:
      // prefixLen tokens p{i}_{j} prepended, nEdits substitutions at
      // deterministic positions j*17 % docLen
      val base = spark.range(nPairs).select(col("id").as("doc_id"),
        expr(s"array_join(transform(sequence(0, ${docLen - 1}), " +
          s"j -> concat('b', pmod(id * 37 + j * j * 13 + j, 4096))), ' ')")
          .as("text"))
      val editPos = (0 until nEdits).map(e => (e * 17 + 3) % docLen).toSet
      val posList = editPos.mkString("(", ",", ")")
      val body =
        if (nEdits == 0)
          s"transform(sequence(0, ${docLen - 1}), " +
            s"j -> concat('b', pmod(id * 37 + j * j * 13 + j, 4096)))"
        else
          s"transform(sequence(0, ${docLen - 1}), j -> CASE WHEN j IN " +
            s"$posList THEN concat('e', id, 'x', j) ELSE " +
            s"concat('b', pmod(id * 37 + j * j * 13 + j, 4096)) END)"
      val shifted = spark.range(nPairs).select(
        (col("id") + nPairs).as("doc_id"),
        expr(s"array_join(concat(transform(sequence(1, $prefixLen), " +
          s"j -> concat('p', id, '_', j)), $body), ' ')").as("text"))
      base.unionByName(shifted).localCheckpoint()
    }

    def evalPairs(pairs: DataFrame): (Long, Long) = {
      val p = pairs.select(least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b")).distinct()
      val hits = p.filter(col("b") === col("a") + nPairs &&
        col("a") < nPairs).count()
      val spurious = p.count() - hits
      (hits, spurious)
    }
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for ((prefixLen, nEdits) <- Seq((8, 0), (8, 4), (24, 8))) {
      val docs = corpus(prefixLen, nEdits)
      // A: whole-doc content hash (Dedup.exact's normalization) → pairs
      val (aRes, aT) = time {
        val h = docs.select(col("doc_id"),
          md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
            .as("h"))
        val g = h.groupBy("h").agg(sort_array(collect_set("doc_id"))
          .as("ids")).filter(size(col("ids")) >= 2)
        evalPairs(g.select(element_at(col("ids"), 1).as("id1"),
          element_at(col("ids"), 2).as("id2")))
      }
      // B: MinHash-LSH candidates
      val (bRes, bT) = time {
        evalPairs(Dedup.minhashCandidatePairs(docs, "doc_id", "text"))
      }
      // C: CDC shared chunks (>= 2 shared chunk hashes pairs the docs)
      val (cRes, cT) = time {
        val ch = ContentChunks.cdcChunks(docs, "doc_id", "text", 3, 32)
          .select(col("chash"), col("doc_id")).distinct()
        val pairs = ch.groupBy("chash")
          .agg(sort_array(collect_set("doc_id")).as("ids"))
          .filter(size(col("ids")) === 2)
          .select(element_at(col("ids"), 1).as("id1"),
            element_at(col("ids"), 2).as("id2"))
          .groupBy("id1", "id2").agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2)
        evalPairs(pairs)
      }
      // D: winnowing shared fingerprints (>= 4 shared hashes)
      val (dRes, dT) = time {
        val fp = ContentChunks.winnowFingerprints(docs, "doc_id", "text",
            5, 8)
          .select(col("fhash"), col("doc_id")).distinct()
        val pairs = fp.groupBy("fhash")
          .agg(sort_array(collect_set("doc_id")).as("ids"))
          .filter(size(col("ids")) === 2)
          .select(element_at(col("ids"), 1).as("id1"),
            element_at(col("ids"), 2).as("id2"))
          .groupBy("id1", "id2").agg(count(lit(1)).as("n"))
          .filter(col("n") >= 4)
        evalPairs(pairs)
      }
      // E: simhash Hamming-ball pairs (global token vote — a short
      // prefix perturbs few bits; scattered edits drift the vote)
      val (eRes, eT) = time {
        evalPairs(Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3))
      }
      // F: OPH >= 4-of-16 matching entries (k× cheaper minhash)
      val (fRes, fT) = time {
        evalPairs(Dedup.ophMatchPairs(
          Dedup.ophSignatures(docs, "doc_id", "text"), minMatch = 4L))
      }
      def line(m: String, r: (Long, Long), t: Double) =
        f""""${m}":{"recall":${r._1.toDouble / nPairs}%.4f,""" +
          f""""spurious":${r._2},"sec":$t%.2f}"""
      println(s"""{"probe":"shiftdedup","pairs":$nPairs,""" +
        s""""prefix":$prefixLen,"edits":$nEdits,""" +
        line("exact", aRes, aT) + "," + line("minhash", bRes, bT) + "," +
        line("cdc", cRes, cT) + "," + line("winnow", dRes, dT) + "," +
        line("simhash_ball", eRes, eT) + "," + line("oph", fRes, fT) + "}")
    }
    spark.stop()
  }
}
