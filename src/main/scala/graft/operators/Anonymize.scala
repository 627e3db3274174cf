package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving release primitives — the redaction-adjacent
  * half of corpus governance ([[Curation]] removes PII from text;
  * this file guards what AGGREGATES and RECORDS may leave the
  * enclave):
  *
  *  - k-anonymity suppression (Sweeney 2002): a record may be
  *    released only if at least k records share its quasi-identifier
  *    combination;
  *  - deterministic noisy counts: the geometric mechanism's shape
  *    (two-sided geometric(1/2) noise) driven by a seeded Lehmer
  *    stream so runs are reproducible and oracle-checkable.
  */
object Anonymize {

  /** Row-level k-anonymity APPLY: keep exactly the rows whose
    * quasi-identifier group (`qiCols`) has ≥ k members, with the
    * group size attached as `qi_n`; rows in smaller groups are
    * SUPPRESSED (dropped — the release-safe default; see
    * [[kAnonymityReport]] for the audit view of what was cut).
    * Generalize coarse columns upstream (bucket ages, truncate zip
    * codes) — this operator only enforces the threshold.
    *
    * Scale shape: one map-side-combined count per QI group + one
    * equi join of the group sizes back onto the rows, both on the
    * same key (one shuffle, reused by AQE). No window over the whole
    * relation.
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k=$k must be >= 2 (k=1 releases everything)")
    val sizes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("qi_n"))
      .filter(col("qi_n") >= k)
    // NULL-SAFE join keys: groupBy treats null as a group (and the
    // report counts it), so the apply must release it when it passes k
    // — a null-unsafe equi join would silently drop every null-QI row
    val s2 = qiCols.foldLeft(sizes) { (d, c) =>
      d.withColumnRenamed(c, s"__q_$c") }
    val cond = qiCols.map(c => df(c) <=> s2(s"__q_$c")).reduce(_ && _)
    df.join(s2, cond).drop(qiCols.map(c => s"__q_$c"): _*)
  }

  /** The audit view: one row per quasi-identifier group with its size
    * and the suppression verdict — what a release reviewer reads
    * before signing off (groups failing k, i.e. `suppressed = true`,
    * are exactly the rows [[kAnonymize]] drops).
    */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String],
      k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k=$k must be >= 2")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("qi_n"))
      .withColumn("suppressed", col("qi_n") < k)
  }

  /** Right-to-be-forgotten cascade, the APPLY: every row whose
    * `userCol` appears in the tombstone relation is removed (one
    * anti-join — at scale the tombstone side is a broadcast or a
    * bloom-pushed semi-join, Catalyst's choice). Pair with
    * [[forgetAudit]] for the processing proof a DSR workflow files.
    */
  def forgetUsers(df: DataFrame, userCol: String, tombstones: DataFrame,
      tombCol: String): DataFrame = {
    // cast BOTH sides to long, exactly like forgetAudit — asymmetric
    // normalization would let the apply and its audit disagree
    val tomb = tombstones.select(col(tombCol).cast("long").as("__tu"))
      .distinct()
    df.join(tomb, df(userCol).cast("long") === tomb("__tu"), "left_anti")
  }

  /** The audit relation for [[forgetUsers]]: ONE ROW PER TOMBSTONE —
    * including requests matching nothing (n_removed = 0), because a
    * deletion request must be provably PROCESSED, not silently
    * skipped — with the number of rows the cascade removes. One
    * map-side-combined count + a tombstone-sized outer join.
    */
  def forgetAudit(df: DataFrame, userCol: String, tombstones: DataFrame,
      tombCol: String): DataFrame = {
    val tomb = tombstones.select(col(tombCol).cast("long").as("user"))
      .distinct()
    val counts = df.select(col(userCol).cast("long").as("user"))
      .join(tomb, Seq("user"), "left_semi")
      .groupBy(col("user")).agg(count(lit(1)).as("__n"))
    tomb.join(counts, Seq("user"), "left")
      .select(col("user"),
        coalesce(col("__n"), lit(0L)).as("n_removed"))
  }

  private val M = 2147483647L // Lehmer/MINSTD modulus, 2^31 - 1
  private def lehmer(x: Column): Column =
    pmod(pmod(x, lit(M)) * lit(48271L), lit(M))

  /** Noisy group counts in the geometric mechanism's SHAPE: per key,
    * the true count plus two-sided noise with geometric(1/2)
    * magnitude (`P(|noise| = j) ≈ 2^{-(j+1)}`) and a fair sign,
    * clamped at zero. Under ideal uniformity that is an ε = 2·ln 2
    * differentially-private release; here the noise is DERIVED from a
    * seeded Lehmer stream over the key — deterministic by design, so
    * runs reproduce and the oracle can replay every draw. That
    * determinism is the right default for pipeline testing and for
    * CONSISTENT noise (the same key must not average out over
    * repeated queries — the standard sticky-noise practice); swap the
    * stream for true randomness only with a privacy review.
    *
    * Noise draw, exact integer arithmetic end to end: two Lehmer
    * steps mix `key + seed`; bit 0 is the sign, and the magnitude is
    * the count of trailing one-bits of the remaining 30 bits (a
    * geometric(1/2) variable, computed via the binary string — no
    * float anywhere, identical in both engines).
    *
    * One map-side-combined count + row-local arithmetic; no second
    * shuffle.
    */
  def noisyCounts(df: DataFrame, keyCol: String,
      seed: Long = 1L): DataFrame = {
    val u = lehmer(lehmer(col("key") + lit(seed)) + lit(seed))
    val bits = u.cast("long")
    val magBits = expr("conv(cast(__u div 2 as string), 10, 2)")
    val mag = (length(magBits) - length(rtrim(magBits, "1")))
      .cast("long")
    df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__u", bits)
      .withColumn("noise",
        (lit(1L) - lit(2L) * pmod(col("__u"), lit(2L))) * mag)
      .withColumn("noisy_n", greatest(col("n") + col("noise"), lit(0L)))
      .drop("__u")
  }
}
