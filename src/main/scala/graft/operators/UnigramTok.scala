package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training step (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram model), on an exact
  * integer cost lattice so one EM round is bit-replayable under the
  * oracle:
  *
  *  - piece cost = `K − ⌊log2(count)⌋` (an integer surrogate for
  *    −log p; `⌊log2⌋` via binary-digit count, never a float log);
  *  - Viterbi segmentation minimizes the summed piece cost with a
  *    deterministic tie-break (the LONGEST piece wins at each end
  *    position), so the argmin segmentation — not just its cost — is
  *    unique and both engines reproduce it;
  *  - the EM re-estimation counts pieces over the Viterbi
  *    segmentations weighted by word frequency and re-derives costs on
  *    the same lattice.
  *
  * The 100 TB shape: everything heavy runs over the DISTINCT-WORD
  * relation (vocabulary-sized, not corpus-sized — the standard
  * SentencePiece trick), word counting and piece counting are
  * map-side-combined aggregations, and the DP is a per-word UDF over a
  * broadcast piece table whose size is bounded by `minCount` (and a
  * loud `maxVocab` guard at collect time).
  */
object UnigramTok {

  /** Default cost offset: positive costs for any count < 2^40. */
  val CostK = 40

  private def floorLog2(cnt: org.apache.spark.sql.Column) =
    (length(conv(cnt, 10, 2)) - 1).cast("int")

  /** Corpus → distinct words with frequencies. Words longer than
    * `maxWordLen` are dropped (they would only pad the DP; real
    * tokenizers pre-split such blobs), as are empty strings.
    */
  def wordCounts(docs: DataFrame, textCol: String,
      maxWordLen: Int = 32): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(split(trim(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("n_occ"))

  /** Seed vocabulary: every substring of length ≤ `maxPieceLen` of the
    * distinct words, counted PER OCCURRENCE weighted by word
    * frequency; pieces below `minCount` drop UNLESS single characters
    * (those are always kept so Viterbi can segment anything). Cost on
    * the `K − ⌊log2⌋` lattice.
    */
  def seedVocab(words: DataFrame, maxPieceLen: Int,
      minCount: Long): DataFrame = {
    require(maxPieceLen >= 1 && minCount >= 1)
    val subs = words
      .select(col("n_occ"), explode(flatten(transform(
        sequence(lit(1), length(col("word"))),
        p => transform(
          sequence(lit(1), least(lit(maxPieceLen),
            length(col("word")) - p + 1)),
          l => substring(col("word"), p, l))))).as("piece"))
    subs.groupBy(col("piece")).agg(sum(col("n_occ")).as("cnt"))
      .filter(col("cnt") >= minCount || length(col("piece")) === 1)
      .withColumn("cost", (lit(CostK) - floorLog2(col("cnt"))).cast("long"))
  }

  /** Viterbi segmentation of every distinct word under a piece-cost
    * table. DP over end positions: `D(i) = min_j D(i−j) + cost(w[i−j..
    * i))`, missing pieces cost 10^9 (chosen only if unavoidable —
    * never, since single chars are always in the vocab); among equal-
    * cost `j` the LARGEST (longest piece) wins. Returns `(word, n_occ,
    * seg, cost, n_pieces)` with `seg` the pieces joined by single
    * spaces.
    */
  def viterbiSegments(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int, maxVocab: Int = 1 << 20): DataFrame = {
    val spark = words.sparkSession
    val entries = vocab.select(col("piece"), col("cost").cast("long"))
      .limit(maxVocab + 1).collect()
    require(entries.length <= maxVocab,
      s"vocabulary > $maxVocab pieces — raise minCount upstream")
    val pieceCost = entries.map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = spark.sparkContext.broadcast(pieceCost)
    val L = maxPieceLen
    val segUdf = udf { (w: String) =>
      val n = w.length
      val Inf = 1000000000L
      val d = new Array[Long](n + 1)
      val back = new Array[Int](n + 1)
      var i = 1
      while (i <= n) {
        var best = Long.MaxValue
        var bj = 0
        var j = 1
        val jm = math.min(L, i)
        while (j <= jm) {
          val c = d(i - j) + bc.value.getOrElse(w.substring(i - j, i), Inf)
          if (c < best || (c == best && j > bj)) { best = c; bj = j }
          j += 1
        }
        d(i) = best; back(i) = bj
        i += 1
      }
      var k = n
      var pieces = List.empty[String]
      while (k > 0) { pieces = w.substring(k - back(k), k) :: pieces
        k -= back(k) }
      (pieces.mkString(" "), d(n), pieces.length)
    }
    words.withColumn("__s", segUdf(col("word")))
      .select(col("word"), col("n_occ"), col("__s._1").as("seg"),
        col("__s._2").as("cost"), col("__s._3").as("n_pieces"))
  }

  /** One EM re-estimation over the Viterbi segmentations: piece counts
    * weighted by word frequency, costs re-derived on the same integer
    * lattice. Feeding this back into [[viterbiSegments]] is the next
    * EM round.
    */
  def emPieceCounts(segs: DataFrame): DataFrame =
    segs.select(col("n_occ"), explode(split(col("seg"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n_occ")).as("em_count"))
      .withColumn("new_cost",
        (lit(CostK) - floorLog2(col("em_count"))).cast("long"))

  /** Vocabulary pruning between EM rounds (SentencePiece keeps the
    * useful pieces and always the character alphabet): pieces whose EM
    * count clears `minCount` survive at their EM cost; every
    * single-char piece of the SEED vocab not already kept re-enters at
    * its seed cost, so segmentation stays total. Output is a
    * `(piece, cost)` relation ready for the next [[viterbiSegments]].
    */
  def pruneVocab(em: DataFrame, seed: DataFrame,
      minCount: Long): DataFrame = {
    val kept = em.filter(col("em_count") >= minCount)
      .select(col("piece"), col("new_cost").as("cost"))
    val singles = seed.filter(length(col("piece")) === 1)
      .select(col("piece"), col("cost"))
      .join(kept.select(col("piece")), Seq("piece"), "left_anti")
    kept.unionByName(singles)
  }
}
