package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed n-gram language model in the stupid-backoff family
  * (Brants, Popat, Xu, Och & Dean 2007, "Large Language Models in Machine
  * Translation" — the algorithm designed FOR this execution model: plain
  * count tables, no normalization pass, backoff at query time).
  *
  * Count side: one positioned-token relation feeding three map-side-
  * combined aggregations (trigram / bigram / unigram). Scoring side: each
  * scored position left-joins the count tables on its gram keys — shuffle
  * hash joins on string keys, the same shape as the surprisal operators,
  * linear in corpus size with no driver state.
  *
  * The GATE is exact-integer by design: instead of hashing a float
  * log-probability (whose merge order is engine-dependent — the q146
  * lesson), the operator exposes the chosen backoff ORDER and the count
  * ratio numerator/denominator per position, aggregated per document.
  * Those pin the entire join/backoff logic bit-for-bit; turning
  * (num, den, order) into S(w) = (0.4^backoffs)·num/den is a trivial
  * client-side fold the gate does not need.
  *
  * Backoff rule per position i (0-based, context truncated at doc start):
  *   i ≥ 2 and c(w_{i−2} w_{i−1} w_i) > 0 → order 3,
  *       num = c(trigram), den = c(w_{i−2} w_{i−1})
  *   else i ≥ 1 and c(w_{i−1} w_i) > 0 → order 2,
  *       num = c(bigram), den = c(w_{i−1})
  *   else → order 1, num = c(w_i) (0 if OOV), den = N (LM token count)
  */
object NgramLm {

  /** (doc_id, pos, w0, w1, w2) with w1/w2 null where the context is
    * truncated by the document start. Null/blank docs contribute nothing.
    * 0-based pos; element_at is 1-based, hence the off-by-one reads.
    */
  def positionedWithContext(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = TextFns.tokens(lower(col(textCol)))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), toks.as("__w"))
      .select(col("doc_id"), col("__w"),
        posexplode(col("__w")).as(Seq("pos", "w0")))
      .withColumn("w1",
        when(col("pos") >= 1, element_at(col("__w"), col("pos"))))
      .withColumn("w2",
        when(col("pos") >= 2, element_at(col("__w"), col("pos") - 1)))
      .drop("__w")
  }

  /** LM count tables from `lmDocs`: returns (tri, bi, uni, n) where n is
    * the total token count. Three aggregations over the positioned
    * relation, all map-side combined; n folds the VOCABULARY-sized
    * unigram table (Σc1 ≡ total positions) rather than paying a fourth
    * corpus scan.
    */
  def counts(lmDocs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame, Long) = {
    val p = positionedWithContext(lmDocs, idCol, textCol)
    val tri = p.filter(col("w2").isNotNull)
      .groupBy("w2", "w1", "w0").agg(count(lit(1)).as("c3"))
    val bi = p.filter(col("w1").isNotNull)
      .groupBy("w1", "w0").agg(count(lit(1)).as("c2"))
    val uni = p.groupBy("w0").agg(count(lit(1)).as("c1"))
    val n = uni.agg(coalesce(sum(col("c1")), lit(0L))).head().getLong(0)
    (tri, bi, uni, n)
  }

  /** The three count tables as ONE sum-mergeable relation
    * (ord, w2, w1, w0, c) — ord 3/2/1 rows with null context columns
    * where the order doesn't use them. This is the persistable /
    * streamable form: merging two corpora's relations is
    * `groupBy(ord, w2, w1, w0).sum(c)` (associative, commutative,
    * replay-safe under an exactly-once batch guard), and the total
    * token count folds out of the ord=1 slice. The streaming side
    * (`EventStream.lmCountStream`) maintains exactly this relation.
    */
  def countsUnified(lmDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val (tri, bi, uni, _) = counts(lmDocs, idCol, textCol)
    tri.select(lit(3).as("ord"), col("w2"), col("w1"), col("w0"),
        col("c3").as("c"))
      .unionByName(bi.select(lit(2).as("ord"),
        lit(null).cast("string").as("w2"), col("w1"), col("w0"),
        col("c2").as("c")))
      .unionByName(uni.select(lit(1).as("ord"),
        lit(null).cast("string").as("w2"),
        lit(null).cast("string").as("w1"), col("w0"),
        col("c1").as("c")))
  }

  /** Split a unified count relation back into (tri, bi, uni, n). */
  def splitUnified(unified: DataFrame)
      : (DataFrame, DataFrame, DataFrame, Long) = {
    val tri = unified.filter(col("ord") === 3)
      .select(col("w2"), col("w1"), col("w0"), col("c").as("c3"))
    val bi = unified.filter(col("ord") === 2)
      .select(col("w1"), col("w0"), col("c").as("c2"))
    val uni = unified.filter(col("ord") === 1)
      .select(col("w0"), col("c").as("c1"))
    val n = uni.agg(coalesce(sum(col("c1")), lit(0L))).head().getLong(0)
    (tri, bi, uni, n)
  }

  /** [[backoffDocStats]] against an EXISTING (e.g. stream-maintained)
    * unified count relation instead of re-counting an LM corpus.
    */
  def backoffDocStatsFromCounts(docs: DataFrame, unified: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val (tri, bi, uni, n) = splitUnified(unified)
    docStatsOf(positionsWith(
      positionedWithContext(docs, idCol, textCol), tri, bi, uni, n))
  }

  /** Score every position of `docs` against LM counts from `lmDocs`,
    * returning per-position (doc_id, pos, ord, num, den) — all integers.
    */
  def backoffPositions(docs: DataFrame, lmDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val (tri, bi, uni, n) = counts(lmDocs, idCol, textCol)
    positionsWith(positionedWithContext(docs, idCol, textCol),
      tri, bi, uni, n)
  }

  private def positionsWith(p: DataFrame, tri: DataFrame, bi: DataFrame,
      uni: DataFrame, n: Long): DataFrame = {
    // context denominators reuse the same tables under renamed keys
    val biCtx = bi.select(col("w1").as("x2"), col("w0").as("x1"),
      col("c2").as("cctx3"))
    val uniCtx = uni.select(col("w0").as("x1b"), col("c1").as("cctx2"))
    p.join(tri, Seq("w2", "w1", "w0"), "left")
      .join(bi, Seq("w1", "w0"), "left")
      .join(uni, Seq("w0"), "left")
      .join(biCtx, col("w2") === col("x2") && col("w1") === col("x1"),
        "left")
      .join(uniCtx, col("w1") === col("x1b"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("pos") >= 2 && col("c3").isNotNull, 3L)
          .when(col("pos") >= 1 && col("c2").isNotNull, 2L)
          .otherwise(1L).as("ord"),
        when(col("pos") >= 2 && col("c3").isNotNull, col("c3"))
          .when(col("pos") >= 1 && col("c2").isNotNull, col("c2"))
          .otherwise(coalesce(col("c1"), lit(0L))).as("num"),
        when(col("pos") >= 2 && col("c3").isNotNull, col("cctx3"))
          .when(col("pos") >= 1 && col("c2").isNotNull, col("cctx2"))
          .otherwise(lit(n)).as("den"))
  }

  /** Per-document backoff statistics: position count, per-order counts,
    * and the exact integer sums of numerators/denominators — the gateable
    * fingerprint of the whole scoring join.
    */
  def backoffDocStats(docs: DataFrame, lmDocs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docStatsOf(backoffPositions(docs, lmDocs, idCol, textCol))

  private def docStatsOf(positions: DataFrame): DataFrame =
    positions
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"),
        sum(when(col("ord") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("ord") === 2, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("ord") === 1, 1L).otherwise(0L)).as("n_uni"),
        sum(col("num")).as("sum_num"),
        sum(col("den")).as("sum_den"))

  /** LM-fit score for CCNet-style "keep what the reference LM finds
    * fluent" filtering: the trigram hit-rate as an INTEGER lattice value
    * `lm_fit_ppm = ⌊10⁶ · n_tri / n_pos⌋` (one IEEE division of exact
    * integers + floor — deterministic in every engine; the true ratio is
    * ≥ 1/n_pos away from any integer it could straddle, so the floor is
    * exact). A float perplexity would need order-pinned ln sums; the
    * hit-rate ranks fluency monotonically for a fixed LM and keeps the
    * gate exact. The ppm lattice (≤ 10⁶ + 1 values) is precisely the
    * bounded-cardinality contract `Curation.topQualityPerGroupAtScale`
    * wants for a corpus-scale percentile cut.
    */
  def lmFitScores(docs: DataFrame, lmDocs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    backoffDocStats(docs, lmDocs, idCol, textCol)
      .withColumn("lm_fit_ppm",
        floor(col("n_tri").cast("double") * 1000000.0d / col("n_pos"))
          .cast("long"))

  /** PMI-style collocation detection over the [[counts]] tables: bigrams
    * (w1, w0) with c_pair ≥ `minCount` whose lift
    * c_pair·N / (c_left·c_right) ≥ liftNum/liftDen — i.e. the pair
    * co-occurs ≥ lift× more than independent unigram frequencies
    * predict (PMI ≥ log lift, division-free). The comparison is integer
    * cross-multiplication and the reported lift is an exact-integer ppm
    * floor, so the row set and every value hash across engines.
    *
    * Scale: two map-side-combined count aggregations over the corpus
    * (bigram + unigram — the same tables the backoff LM shares), then
    * vocabulary-sized joins. Overflow bound (ANSI throws if crossed):
    * c_pair · N · max(liftDen, 10^6) < 2^63 — fine to ~10^9-token
    * corpora with hot pairs; beyond that, downscale both counts by a
    * common factor on both engines.
    */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 3L, liftNum: Long = 2L,
      liftDen: Long = 1L): DataFrame = {
    val (_, bi, uni, n) = counts(docs, idCol, textCol)
    collocationsCore(bi, uni, n, minCount, liftNum, liftDen)
  }

  /** [[collocations]] against an EXISTING unified count relation —
    * e.g. the stream-maintained table from `EventStream.lmCountStream` —
    * so collocation monitoring rides live counts without re-scanning
    * any corpus. Identical integer lattice, identical output schema.
    */
  def collocationsFromCounts(unified: DataFrame, minCount: Long = 3L,
      liftNum: Long = 2L, liftDen: Long = 1L): DataFrame = {
    val (_, bi, uni, n) = splitUnified(unified)
    collocationsCore(bi, uni, n, minCount, liftNum, liftDen)
  }

  private def collocationsCore(bi: DataFrame, uni: DataFrame, n: Long,
      minCount: Long, liftNum: Long, liftDen: Long): DataFrame = {
    require(minCount >= 1 && liftNum > 0 && liftDen > 0,
      "minCount and lift ratio must be positive")
    val left = uni.select(col("w0").as("w1"), col("c1").as("c_left"))
    val right = uni.select(col("w0"), col("c1").as("c_right"))
    bi.filter(col("c2") >= minCount)
      .join(left, Seq("w1"))
      .join(right, Seq("w0"))
      .filter(lit(liftDen) * col("c2") * lit(n) >=
        lit(liftNum) * col("c_left") * col("c_right"))
      .select(col("w1"), col("w0"), col("c2").as("c_pair"),
        col("c_left"), col("c_right"))
      .withColumn("lift_ppm",
        expr(s"(1000000 * c_pair * ${n}L) div (c_left * c_right)"))
  }
}
