package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation metrics over model outputs — the scoring half of an eval
  * harness ([[TrainPrep.fewShot]] assembles the prompts, this grades
  * the answers), at corpus scale and integer-exact under the oracle:
  *
  *  - SQuAD-style answer normalization + exact match + token F1
  *    (Rajpurkar et al. 2016's official scorer semantics: lowercase,
  *    ASCII punctuation REMOVED (so "don't" → "dont", exactly the
  *    official `remove_punc` over `string.punctuation` — non-ASCII
  *    letters pass through), article removal, whitespace collapse;
  *    F1 = 2·overlap/(|p|+|r|) on token MULTISETS, reported on a ppm
  *    lattice — one IEEE division + floor, exact away from lattice
  *    boundaries);
  *  - the unbiased pass@k estimator (Chen et al. 2021, Codex paper):
  *    `1 − C(n−c, k)/C(n, k)` per problem, evaluated as an exact
  *    integer product ratio on the same ppm lattice.
  *
  * Scale shape: EM/F1 is ROW-LOCAL (higher-order functions over the
  * two token arrays — answers are short by construction; no explode,
  * no join, no shuffle); pass@k is one map-side-combined aggregation
  * per problem plus constant-fold arithmetic.
  */
object EvalMetrics {

  /** The SQuAD normalizer: lowercase, REMOVE ASCII punctuation
    * (`string.punctuation` = the ranges !–/ :–@ [–` {–~, deleted, not
    * blanked — "don't" → "dont"), drop articles (a, an, the), collapse
    * whitespace. Non-ASCII letters survive, as in the official scorer
    * (Python `str.lower` + per-char punctuation strip).
    */
  def normalizeAnswer(s: Column): Column =
    array_join(
      filter(split(regexp_replace(lower(s), "[!-/:-@\\[-`{-~]", ""),
          "\\s+"),
        t => t =!= "" && t =!= lit("a") && t =!= lit("an") &&
          t =!= lit("the")),
      " ")

  /** Exact match + token F1 per (prediction, reference) row. Output
    * adds `em` (boolean) and `f1_ppm` (long): both-empty normalized
    * answers score 10^6, one-empty scores 0. The multiset overlap is
    * `Σ_t min(cnt_p(t), cnt_r(t))` over distinct prediction tokens —
    * an O(len²) row-local HOF, fine because answers are short (the
    * caller's contract; truncate upstream for free-form generations).
    */
  def emF1(pairs: DataFrame, predCol: String, refCol: String): DataFrame = {
    val np = normalizeAnswer(col(predCol))
    val nr = normalizeAnswer(col(refCol))
    val tp = filter(split(np, " "), t => t =!= "")
    val tr = filter(split(nr, " "), t => t =!= "")
    val overlap = aggregate(array_distinct(tp), lit(0),
      (acc, t) => acc + least(
        size(filter(tp, x => x === t)), size(filter(tr, x => x === t))))
    val denom = size(tp) + size(tr)
    pairs
      .withColumn("em", np === nr)
      .withColumn("f1_ppm",
        when(denom === 0, lit(1000000L))
          .otherwise(floor(overlap.cast("double") * 2000000 / denom)
            .cast("long")))
  }

  /** Unbiased pass@k over per-problem sample relations `(problem, ok)`:
    * `pass@k = 1 − Π_{i=0..k−1} (n−c−i)/(n−i)`, exact on the ppm
    * lattice (`10^6 − ⌊10^6·N/D⌋` with N/D the integer products; when
    * `n − c < k` the product hits a zero factor and pass@k is exactly
    * 10^6). Requires `k ≤ n` for every problem — enforce upstream by
    * sampling a fixed n per problem (the estimator is undefined
    * otherwise, so this refuses loudly via a null-free contract check).
    */
  def passAtK(samples: DataFrame, problemCol: String, okCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val agg = samples.groupBy(col(problemCol).as("problem"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(okCol), 1L).otherwise(0L)).as("c"))
    val num = (0 until k).map(i => greatest(col("n") - col("c") - i, lit(0L)))
      .reduce(_ * _)
    val den = (0 until k).map(i => col("n") - i).reduce(_ * _)
    agg.select(col("problem"), col("n"), col("c"),
      when(col("n") >= k,
          lit(1000000L) - floor(num.cast("double") * 1000000 / den)
            .cast("long"))
        .otherwise(raise_error(concat(lit(
          s"pass@$k needs >= $k samples, problem "),
          col("problem").cast("string"), lit(" has "),
          col("n").cast("string"))).cast("long"))
        .as("pass_at_k_ppm"))
  }
}
