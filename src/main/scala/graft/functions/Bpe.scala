package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and segmentation (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"). Upgrades the heuristic `TextFns.subwordCount` ("BPE-ish
  * regex") into the real algorithm: learn the merge table from the corpus,
  * then segment words with it.
  *
  * Spark-first shape, built for 100 TB:
  *   - ONE corpus-wide shuffle total: the word-frequency aggregation
  *     (map-side combined). Everything after runs on the DISTINCT-WORD
  *     relation — vocabulary-sized (~10⁷ rows at web scale), orders of
  *     magnitude smaller than the corpus. This is the standard BPE trick
  *     (learn from word counts, not word occurrences).
  *   - Each merge iteration is one aggregation over the vocabulary (pair
  *     counts, weighted by word frequency) + one TakeOrdered(1) argmax
  *     (a single driver row — bounded) + one narrow `replace` projection.
  *     `nMerges` is contract-bounded, and the working relation is
  *     localCheckpoint'ed per iteration so the plan stays flat instead of
  *     accreting `nMerges` nested replaces.
  *   - All arithmetic is integer and all strings exact, so a DuckDB oracle
  *     replays training bit-for-bit (ties broken by (count DESC, left ASC,
  *     right ASC) — deterministic in both engines).
  *
  * Symbol encoding: a word's symbol sequence is bracket-framed,
  * `hello → <h><e><l><l><o>`. Brackets make pair replacement unambiguous —
  * adjacent pair patterns `<x><y>` never share characters, so left-to-right
  * non-overlapping `replace` (identical semantics in Spark and DuckDB)
  * implements exactly the greedy merge application of the published
  * algorithm.
  *
  * Alphabet contract: the vocabulary is restricted to `^[a-z0-9]+$` words
  * (post-lowercase). This keeps the bracket encoding collision-free and —
  * deliberately — sidesteps regex code-point semantics that differ between
  * JVM UTF-16 and DuckDB UTF-8 on non-BMP text. Callers with non-Latin
  * corpora transliterate or byte-encode upstream (real byte-level BPE does
  * the same: it operates on a fixed 256-symbol base alphabet).
  */
object Bpe {

  final case class Merge(step: Int, left: String, right: String,
      pairCount: Long)

  /** `hello` → `<h><e><l><l><o>` (one codegen'd regexp pass). */
  def encodeChars(word: Column): Column =
    regexp_replace(word, "(.)", "<$1>")

  /** Bracket encoding → symbol array. */
  def symbolsOf(enc: Column): Column =
    split(regexp_replace(enc, "^<|>$", ""), "><")

  /** The one corpus-wide pass: lowercase whitespace tokens filtered to the
    * symbol-safe alphabet, counted. Map-side combined; output is
    * vocabulary-sized.
    */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(TextFns.tokens(lower(col(textCol)))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  private def applyOne(enc: Column, left: String, right: String): Column =
    replace(enc, lit(s"<$left><$right>"), lit(s"<$left$right>"))

  /** Apply a learned merge table, in order, to a bracket-encoded column.
    * `nMerges` chained literal replaces — codegen'd, no UDF.
    */
  def applyMerges(enc: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.step).foldLeft(enc) { (c, m) =>
      applyOne(c, m.left, m.right)
    }

  /** Segment a raw word column with a learned merge table → symbol array. */
  def segment(word: Column, merges: Seq[Merge]): Column =
    symbolsOf(applyMerges(encodeChars(word), merges))

  /** Learn `nMerges` BPE merges from the corpus. Deterministic: ties on
    * pair count break by (left ASC, right ASC). Fails loudly if the
    * vocabulary exhausts mergeable pairs before `nMerges` (tiny corpora) —
    * a silent short table would desynchronize any replayed oracle.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1 && nMerges <= 64,
      s"nMerges $nMerges out of the driver-side contract bound [1, 64]")
    var cur = wordFrequencies(docs, textCol)
      .select(col("freq"), encodeChars(col("word")).as("enc"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var step = 1
    while (step <= nMerges) {
      val s = symbolsOf(col("enc"))
      val top = cur.filter(size(s) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(0), size(s) - 2), i =>
            struct(element_at(s, i + 1).as("l"),
              element_at(s, i + 2).as("r")))).as("p"))
        .select(col("freq"), col("p.l").as("l"), col("p.r").as("r"))
        .groupBy("l", "r")
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect() // argmax: exactly one row crosses to the driver
      require(top.nonEmpty,
        s"vocabulary exhausted mergeable pairs at step $step of $nMerges")
      val m = Merge(step, top(0).getString(0), top(0).getString(1),
        top(0).getLong(2))
      out += m
      cur = cur
        .withColumn("enc", applyOne(col("enc"), m.left, m.right))
        .localCheckpoint()
      step += 1
    }
    out.result()
  }

  /** The learned subword vocabulary after applying `merges`: symbols of
    * every word weighted by word frequency. Recomputes the word-count
    * scan (one corpus pass) and aggregates over the vocabulary relation —
    * callers who already hold `wordFrequencies` output should segment
    * that instead of paying the scan twice.
    */
  def vocabAfter(docs: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame =
    wordFrequencies(docs, textCol)
      .select(col("freq"),
        explode(segment(col("word"), merges)).as("symbol"))
      .groupBy("symbol").agg(sum(col("freq")).as("freq"))

  /** Subword token count per document under a learned merge table — the
    * exact-BPE replacement for [[TextFns.subwordCount]]'s regex
    * approximation. Out-of-alphabet tokens count 1 symbol each (the
    * unk-word convention); null text propagates null (the suite's
    * null-in/null-out convention), blank text counts 0. Codegen'd end
    * to end.
    */
  def subwordCountBpe(text: Column, merges: Seq[Merge]): Column = {
    val toks = TextFns.tokens(lower(text))
    val perTok = transform(toks, w =>
      when(w.rlike("^[a-z0-9]+$"), size(segment(w, merges)))
        .otherwise(lit(1)))
    when(text.isNotNull,
      coalesce(aggregate(perTok, lit(0), (acc, n) => acc + n), lit(0)))
  }
}
