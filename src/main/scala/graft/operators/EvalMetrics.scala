package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  // n-gram joiner: a control char no whitespace-tokenized text can
  // contain, so "a b"+"c" can't collide with "a"+"b c"
  private val GramSep = "\u001f"

  /** BLEU sufficient statistics (Papineni et al. 2002) per
    * (candidate, reference) row: for each n = 1..maxN the CLIPPED
    * n-gram match count `m{n}` (Σ_g min(cnt_cand(g), cnt_ref(g)))
    * and the candidate n-gram total `t{n}`, plus both token lengths
    * (the brevity-penalty inputs), plus `prec_geo_ppm` — the exact
    * geometric precision product `floor(10^6 · Π m_n / Π t_n)` (null
    * when any `t_n` = 0, i.e. the candidate is shorter than maxN
    * tokens; 0 when any `m_n` = 0, as in unsmoothed BLEU). The float
    * brevity penalty `exp(min(0, 1 − r/c))` is deliberately NOT baked
    * in: `exp` is not bit-reproducible across engines, and corpus
    * BLEU needs the raw counts summed over segments first anyway —
    * callers fold `Σm/Σt` and BP driver-side from these columns.
    *
    * Tokenization is bare whitespace split (BLEU is case-sensitive
    * and scores pre-tokenized text — normalize upstream if desired).
    * Row-local HOF arithmetic, no shuffle; segments are short by the
    * caller's contract (ANSI overflow on the Π products throws loudly
    * past ~10^4-token segments at maxN=4).
    */
  def bleuStats(pairs: DataFrame, candCol: String, refCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN=$maxN out of range 1..6")
    // null text scores like empty text (the oracle's COALESCE(…, ''))
    def toks(c: Column) =
      filter(split(trim(coalesce(c, lit(""))), "\\s+"), t => t =!= "")
    val wc = toks(col(candCol))
    val wr = toks(col(refCol))
    def ngrams(w: Column, n: Int): Column =
      if (n == 1) w
      else when(size(w) >= n,
          transform(sequence(lit(0), size(w) - lit(n)),
            i => array_join(slice(w, i + 1, lit(n)), GramSep)))
        .otherwise(expr("array()").cast("array<string>"))
    val withCounts = (1 to maxN).foldLeft(
        pairs.withColumn("cand_len", size(wc).cast("long"))
          .withColumn("ref_len", size(wr).cast("long"))) { (df, n) =>
      val gc = ngrams(wc, n)
      val gr = ngrams(wr, n)
      val clipped = aggregate(array_distinct(gc), lit(0L),
        (acc, g) => acc + least(
          size(filter(gc, x => x === g)),
          size(filter(gr, x => x === g))).cast("long"))
      df.withColumn(s"m$n", clipped)
        .withColumn(s"t$n", greatest(size(gc), lit(0)).cast("long"))
    }
    val mProd = (1 to maxN).map(n => col(s"m$n")).reduce(_ * _)
    val tProd = (1 to maxN).map(n => col(s"t$n")).reduce(_ * _)
    withCounts.withColumn("prec_geo_ppm",
      when((1 to maxN).map(n => col(s"t$n") > 0).reduce(_ && _),
        floor(mProd.cast("double") * 1000000 / tProd).cast("long")))
  }

  /** Corpus-level BLEU fold over [[bleuStats]] output: per group the
    * segment statistics are SUMMED FIRST — `m{n}`/`t{n}` clipped
    * match and total counts, candidate/reference lengths — and the
    * geometric precision product is taken on the SUMS
    * (`floor(10^6 · Π Σm_n / Π Σt_n)`), which is what corpus BLEU
    * means (Papineni et al. 2002): a corpus score is NOT the mean of
    * segment scores. `prec_geo_ppm` is null when any `Σt_n` = 0 (the
    * whole corpus shorter than maxN tokens per segment) and 0 when
    * any `Σm_n` = 0, mirroring the per-segment convention. As in
    * [[bleuStats]] — and documented only here, once — the float
    * brevity penalty `exp(min(0, 1 − Σref_len/Σcand_len))` stays
    * caller-side: `exp` is not bit-reproducible across engines, and
    * every BP input (`cand_len_sum`, `ref_len_sum`) is in the output.
    *
    * Unlike the per-segment product (segments are short, so int64
    * holds), the corpus Π of sums overflows int64 past ~55k n-grams
    * per order, so the geometric product runs in IEEE double with a
    * FIXED multiplication order (m1·m2·m3·m4, mirrored verbatim by
    * the oracle): engine-exact always, and value-exact while each
    * partial product fits 2^53. One map-side-combined aggregation
    * over the per-pair stats.
    */
  def corpusBleu(stats: DataFrame, groupCols: Seq[String],
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN=$maxN out of range 1..6")
    val sums =
      (1 to maxN).flatMap(n => Seq(
        sum(col(s"m$n")).as(s"m$n"), sum(col(s"t$n")).as(s"t$n"))) ++
      Seq(sum(col("cand_len")).as("cand_len_sum"),
        sum(col("ref_len")).as("ref_len_sum"),
        count(lit(1)).as("n_segments"))
    val agged =
      if (groupCols.isEmpty) stats.agg(sums.head, sums.tail: _*)
      else stats.groupBy(groupCols.map(col): _*)
        .agg(sums.head, sums.tail: _*)
    val mProd = (1 to maxN).map(n => col(s"m$n").cast("double"))
      .reduce(_ * _)
    val tProd = (1 to maxN).map(n => col(s"t$n").cast("double"))
      .reduce(_ * _)
    agged.withColumn("prec_geo_ppm",
      when((1 to maxN).map(n => col(s"t$n") > 0).reduce(_ && _),
        floor(mProd * 1000000 / tProd).cast("long")))
  }

  /** ROUGE-L (Lin 2004) per (candidate, reference) row: the LCS
    * length over whitespace tokens plus precision / recall / F1
    * (β = 1) on the ppm lattice. Both-empty scores 10^6 (the emF1
    * convention), one-empty scores 0. Sequences are required ≤
    * `maxTokens` (loud refusal — the DP is O(m·n) row-local work;
    * summaries and instructions are short by contract, truncate
    * upstream for free-form text). No shuffle; the DP runs as a
    * Scala UDF because Catalyst HOFs cannot express the
    * two-dimensional recurrence without O(n³) interpreted copies.
    */
  def rougeL(pairs: DataFrame, candCol: String, refCol: String,
      maxTokens: Int = 256): DataFrame = {
    val lcsUdf = udf { (p: Seq[String], r: Seq[String]) =>
      require(p.length <= maxTokens && r.length <= maxTokens,
        s"rougeL sequences must be <= $maxTokens tokens " +
          s"(got ${p.length}/${r.length}) — truncate upstream")
      val prev = Array.fill(r.length + 1)(0)
      for (i <- 1 to p.length) {
        var diag = 0 // prev[j-1] before this row overwrote it
        for (j <- 1 to r.length) {
          val up = prev(j)
          prev(j) =
            if (p(i - 1) == r(j - 1)) diag + 1
            else math.max(up, prev(j - 1))
          diag = up
        }
      }
      prev(r.length)
    }
    // null text scores like empty text (and never NPEs the UDF)
    def toks(c: Column) =
      filter(split(trim(coalesce(c, lit(""))), "\\s+"), t => t =!= "")
    val wc = toks(col(candCol))
    val wr = toks(col(refCol))
    val base = pairs
      .withColumn("cand_len", size(wc).cast("long"))
      .withColumn("ref_len", size(wr).cast("long"))
      .withColumn("lcs_len", lcsUdf(wc, wr).cast("long"))
    def ppm(num: Column, den: Column) =
      when(col("cand_len") + col("ref_len") === 0, lit(1000000L))
        .when(den === 0, lit(0L))
        .otherwise(floor(num.cast("double") * 1000000 / den)
          .cast("long"))
    base
      .withColumn("rouge_p_ppm", ppm(col("lcs_len"), col("cand_len")))
      .withColumn("rouge_r_ppm", ppm(col("lcs_len"), col("ref_len")))
      .withColumn("rouge_f_ppm",
        when(col("cand_len") + col("ref_len") === 0, lit(1000000L))
          .otherwise(floor(col("lcs_len").cast("double") * 2000000
            / (col("cand_len") + col("ref_len"))).cast("long")))
  }

  /** Self-Instruct-style instruction dedup (Wang et al. 2022 filter a
    * candidate instruction when its ROUGE-L against ANY kept
    * instruction exceeds 0.7): every candidate row gets its maximum
    * [[rougeL]] F against the SEED pool, the arg-max seed (ties → the
    * smaller seed id), and the keep verdict `best_f_ppm <
    * thresholdPpm`. A candidate also present in the pool scores 10^6
    * against itself and is dropped — the correct answer, not leakage.
    *
    * Scale shape: the pool is REQUIRED ≤ `maxSeeds` rows and
    * broadcast — a |candidates|·|pool| fan-out with per-pair row-local
    * LCS work, the fewShot/decontaminate shape (seed pools are
    * curated and small by construction; for corpus×corpus near-dup
    * use the MinHash family instead). One map-side-combined struct-max
    * per candidate; no windows.
    */
  def rougeDedup(cands: DataFrame, idCol: String, textCol: String,
      pool: DataFrame, poolIdCol: String, poolTextCol: String,
      thresholdPpm: Long = 700000L, maxSeeds: Int = 4096,
      maxTokens: Int = 256): DataFrame = {
    require(thresholdPpm > 0 && thresholdPpm <= 1000000L,
      s"thresholdPpm=$thresholdPpm out of (0, 10^6]")
    val p0 = pool.select(col(poolIdCol).cast("long").as("__sid"),
      col(poolTextCol).as("__stext"))
    val nPool = p0.limit(maxSeeds + 1).count()
    require(nPool >= 1 && nPool <= maxSeeds,
      s"seed pool has $nPool rows — need 1..$maxSeeds (this is a " +
        "broadcast fan-out; for corpus-scale pools use MinHash dedup)")
    val pairs = cands
      .select(col(idCol).cast("long").as("cand_id"),
        col(textCol).as("__ctext"))
      .crossJoin(broadcast(p0))
    rougeL(pairs, "__ctext", "__stext", maxTokens)
      .groupBy(col("cand_id"))
      .agg(max(struct(col("rouge_f_ppm").as("f"),
        (-col("__sid")).as("ns"))).as("__m"))
      .select(col("cand_id"), col("__m.f").as("best_f_ppm"),
        (-col("__m.ns")).as("best_seed"),
        (col("__m.f") < thresholdPpm).as("keep"))
  }

  /** Cohen's κ inter-annotator agreement (Cohen 1960) between two
    * label columns — the number a labeling pipeline reports before
    * trusting its raters (or its model-vs-model judge agreement).
    * Exact on the ppm lattice:
    *
    *   κ = (p_o − p_e)/(1 − p_e)
    *     = (N·agree − Σ_k n1k·n2k) / (N² − Σ_k n1k·n2k)
    *
    * — every term an integer, one IEEE division + floor (toward −∞,
    * so negative κ floors consistently in both engines). Rows where
    * EITHER label is null are excluded up front (unrated items are
    * not disagreement — counting them in N but nowhere else would
    * silently deflate κ). Output is one row `(n, agree, sum_rc,
    * kappa_ppm)` over the rated rows, with `kappa_ppm` null when
    * p_e = 1 (both raters constant and equal — κ undefined).
    * Overflow bound under ANSI (loud): N < ~3·10⁹ items.
    *
    * Two map-side-combined label-count aggregations + a |labels|-sized
    * join; nothing item-sized leaves the first pass.
    */
  /** Fleiss' κ (Fleiss 1971) — [[cohensKappa]] generalized to n ≥ 2
    * raters in LONG form `(item, label)`, one row per rating: the
    * agreement number for crowdsourced labeling rounds and k-model
    * judge ensembles. Exact on the ppm lattice: with N items, n
    * ratings per item, `n_ik` = ratings of label k on item i,
    * `S2 = Σ n_ik²`, `C2 = Σ_k (Σ_i n_ik)²`,
    *
    *   κ = [ (S2 − N·n)·N·n − C2·(n−1) ] / [ (n−1)·((N·n)² − C2) ]
    *
    * — every term an integer (algebra from P̄_o = (S2−Nn)/(Nn(n−1)),
    * P̄_e = C2/(Nn)²), one IEEE division + floor toward −∞. Null
    * labels are excluded first (unrated is not disagreement — the
    * [[cohensKappa]] convention); after that every item must carry
    * the SAME number of ratings (Fleiss' estimator is undefined on
    * ragged panels — refused loudly per item, not silently
    * reweighted). κ is null when every rating is one label
    * (P̄_e = 1). Overflow bound under ANSI (loud): ~10⁷ items at
    * n ≤ 5 (terms peak at N²·n³).
    *
    * Two map-side-combined aggregations ((item,label) then label) + a
    * 1-row cross join; nothing item-sized leaves the first shuffle.
    */
  def fleissKappa(ratings: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val base = ratings.select(col(itemCol).as("__i"),
        col(labelCol).cast("string").as("__l"))
      .filter(col("__l").isNotNull)
    val cells = base.groupBy(col("__i"), col("__l"))
      .agg(count(lit(1)).as("__nik"))
    val perItem = cells.groupBy(col("__i"))
      .agg(sum(col("__nik")).as("__tot"),
        sum(col("__nik") * col("__nik")).as("__s2i"))
    val nRow = perItem.agg(max(col("__tot")).as("__n"))
    val checked = perItem.crossJoin(broadcast(nRow))
      .select(col("__s2i"), col("__n"),
        when(col("__tot") === col("__n"), lit(true))
          .otherwise(raise_error(concat(lit("fleissKappa: item "),
            col("__i").cast("string"), lit(" has "),
            col("__tot").cast("string"), lit(" ratings, others have "),
            col("__n").cast("string"),
            lit(" — the estimator is undefined on ragged panels")))
            .cast("boolean")).as("__ok"))
      .filter(col("__ok"))
    val tot = checked.agg(count(lit(1)).as("n_items"),
      max(col("__n")).as("n_raters"), sum(col("__s2i")).as("s2"))
    val c2 = cells.groupBy(col("__l"))
      .agg(sum(col("__nik")).as("__ck"))
      .agg(coalesce(sum(col("__ck") * col("__ck")), lit(0L)).as("sum_c2"))
    tot.crossJoin(c2)
      .withColumn("kappa_ppm", {
        val nn = col("n_items") * col("n_raters")
        when(col("n_raters") < 2,
          raise_error(lit("fleissKappa needs >= 2 ratings per item"))
            .cast("long"))
          .when(nn * nn === col("sum_c2"), lit(null).cast("long"))
          .otherwise(floor(
            ((col("s2") - nn) * nn
              - col("sum_c2") * (col("n_raters") - 1L)).cast("double")
              * 1000000
              / ((col("n_raters") - 1L) * (nn * nn - col("sum_c2"))))
            .cast("long"))
      })
  }

  def cohensKappa(ratings: DataFrame, r1Col: String,
      r2Col: String): DataFrame = {
    // UNRATED rows (either label null) are excluded up front: counting
    // them in n but not in agree/marginals would silently deflate κ
    val base = ratings.select(col(r1Col).cast("string").as("__r1"),
        col(r2Col).cast("string").as("__r2"))
      .filter(col("__r1").isNotNull && col("__r2").isNotNull)
    val tot = base.agg(count(lit(1)).as("n"),
      sum(when(col("__r1") === col("__r2"), 1L).otherwise(0L))
        .as("agree"))
    val m1 = base.groupBy(col("__r1").as("__k"))
      .agg(count(lit(1)).as("n1"))
    val m2 = base.groupBy(col("__r2").as("__k"))
      .agg(count(lit(1)).as("n2"))
    val rc = m1.join(m2, Seq("__k"))
      .agg(coalesce(sum(col("n1") * col("n2")), lit(0L)).as("sum_rc"))
    tot.crossJoin(rc)
      .withColumn("kappa_ppm",
        when(col("n") * col("n") === col("sum_rc"),
          lit(null).cast("long"))
          .otherwise(floor(
            (col("n") * col("agree") - col("sum_rc")).cast("double")
              * 1000000
              / (col("n") * col("n") - col("sum_rc"))).cast("long")))
  }

  /** Mean reciprocal rank at k — the retrieval-eval staple, exact on
    * the ppm lattice (reciprocals of small integers floor cleanly:
    * `10⁶ div rank`). Input: one row per (query, ranked item) with a
    * 1-based rank and a 0/1 relevance flag (both refused loudly
    * otherwise — a rank of 0 or a graded relevance silently folded
    * as binary would corrupt the mean). Per query: `first_rank` = the
    * smallest relevant rank ≤ k (null if none) and
    * `rr_ppm = 10⁶ div first_rank` (0 if none — the standard MRR
    * convention counts misses as zero). Every row also carries
    * `mrr_ppm = (Σ rr_ppm) div n_queries`, the corpus mean on the
    * same lattice. One (query) aggregation + one 1-row fold broadcast
    * back.
    */
  def mrrAtK(ranked: DataFrame, queryCol: String, rankCol: String,
      relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val rank = coalesce(col(rankCol).try_cast("long"),
      raise_error(concat(lit("mrrAtK: rank '"),
        coalesce(col(rankCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val rel = coalesce(col(relCol).try_cast("long"),
      raise_error(concat(lit("mrrAtK: relevance '"),
        coalesce(col(relCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val rows = ranked.select(col(queryCol).as("query"),
      when(rank >= 1, rank).otherwise(
        raise_error(concat(lit("mrrAtK: rank "), rank.cast("string"),
          lit(" must be >= 1 (1-based ranks)"))).cast("long"))
        .as("__rank"),
      when(rel.isin(0L, 1L), rel).otherwise(
        raise_error(concat(lit("mrrAtK: relevance "),
          rel.cast("string"),
          lit(" outside {0,1} — binarize graded judgments upstream")))
          .cast("long")).as("__rel"))
    val perQ = rows.groupBy(col("query"))
      .agg(min(when(col("__rel") === 1 && col("__rank") <= k,
        col("__rank"))).as("first_rank"))
      .withColumn("rr_ppm",
        when(col("first_rank").isNull, lit(0L))
          .otherwise(expr("1000000L div first_rank")))
    val fold = perQ.agg(sum(col("rr_ppm")).as("__s"),
      count(lit(1)).as("__nq"))
    perQ.crossJoin(broadcast(fold))
      .select(col("query"), col("first_rank"), col("rr_ppm"),
        expr("__s div __nq").as("mrr_ppm"))
  }

  /** nDCG@k per query (Järvelin–Kekäläinen 2002) — the GRADED-
    * relevance ranking metric ([[mrrAtK]] only sees the first binary
    * hit; nDCG credits the whole ordering):
    *
    *   DCG@k  = Σ_{r ≤ k} rel_r / log2(r+1)
    *   IDCG@k = the same sum over the query's relevances sorted
    *            descending (the ideal ordering)
    *   nDCG   = DCG/IDCG
    *
    * on the micro lattice: each position term is ONE fixed-order IEEE
    * chain — floor(rel·10⁶·ln2 / ln(r+1)) (log2 spelled as ln/ln2 so
    * both engines run the identical op sequence; position 1's term is
    * exactly rel·10⁶) — integer-summed, and the final ratio ONE
    * integer division `(10⁶·dcg_micro) div idcg_micro`. Input: one
    * row per (query, rank) with a 1-based rank (dense per query —
    * duplicate ranks refuse loudly, a double-booked position corrupts
    * both sums) and a NON-NEGATIVE long relevance grade. Output per
    * query: `query, n, dcg_micro, idcg_micro, ndcg_ppm` (null when
    * IDCG = 0 — a query with no relevant document has no ideal
    * ordering, the standard convention is to EXCLUDE it from the
    * mean, so the null must stay visible rather than average as 0).
    *
    * One query-partitioned rank window for the ideal ordering + one
    * (query) fold — the [[graft.operators.Experiment.mannWhitneyU]]
    * shape, never a global window.
    */
  def ndcgAtK(ranked: DataFrame, queryCol: String, rankCol: String,
      relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 65536, s"k=$k out of [1, 65536]")
    val rank = coalesce(col(rankCol).try_cast("long"),
      raise_error(concat(lit("ndcgAtK: rank '"),
        coalesce(col(rankCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val rel = coalesce(col(relCol).try_cast("long"),
      raise_error(concat(lit("ndcgAtK: relevance '"),
        coalesce(col(relCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val rows = ranked.select(col(queryCol).as("query"),
      when(rank >= 1, rank).otherwise(
        raise_error(concat(lit("ndcgAtK: rank "), rank.cast("string"),
          lit(" must be >= 1 (1-based ranks)"))).cast("long"))
        .as("__rank"),
      when(rel >= 0, rel).otherwise(
        raise_error(concat(lit("ndcgAtK: relevance "),
          rel.cast("string"), lit(" is negative — grades are >= 0")))
          .cast("long")).as("__rel"))
    // duplicate ranks within a query double-book a position — refuse
    // with the offending (query, rank); the check rides the same
    // window shuffle as the ideal ordering
    val dupW = Window.partitionBy(col("query"), col("__rank"))
    val idealW = Window.partitionBy(col("query"))
      .orderBy(col("__rel").desc, col("__rank"))
    // the term: rel * 1e6 * ln(2) / ln(pos+1), floored — ONE op order
    def term(relC: Column, posC: Column): Column =
      floor(relC.cast("double") * lit(1000000.0) * log(lit(2.0))
        / log((posC + 1L).cast("double"))).cast("long")
    val perRow = rows
      .withColumn("__dup", count(lit(1)).over(dupW))
      .filter(when(col("__dup") > 1,
        raise_error(concat(lit("ndcgAtK: duplicate rank "),
          col("__rank").cast("string"), lit(" in query '"),
          coalesce(col("query").cast("string"), lit("NULL")),
          lit("' — ranks must be unique per query"))).cast("boolean"))
        .otherwise(lit(true)))
      .withColumn("__ipos", row_number().over(idealW).cast("long"))
      .withColumn("__dterm",
        when(col("__rank") <= k, term(col("__rel"), col("__rank")))
          .otherwise(lit(0L)))
      .withColumn("__iterm",
        when(col("__ipos") <= k, term(col("__rel"), col("__ipos")))
          .otherwise(lit(0L)))
    perRow.groupBy(col("query"))
      .agg(count(lit(1)).as("n"), sum(col("__dterm")).as("dcg_micro"),
        sum(col("__iterm")).as("idcg_micro"))
      .withColumn("ndcg_ppm",
        when(col("idcg_micro") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000L * dcg_micro) div idcg_micro")))
  }

  /** Pairwise win rates — the model-comparison ledger behind every
    * "arena"-style eval: judge verdicts over (model A, model B) pairs
    * folded into one row per unordered pair. `winner` must be 0
    * (tie), 1 (A wins) or 2 (B wins), refused loudly otherwise; a
    * self-comparison (A = B) also refuses — it would inflate both
    * sides of its own ledger. Pairs are CANONICALIZED to `m_lo <
    * m_hi` ON THE COLUMN'S OWN TYPE — string model names (the normal
    * case for arena-style judge verdicts), numeric ids, anything
    * orderable; both model columns must share one type (checked
    * loudly driver-side) and the verdict flips with the swap, so
    * (x,y) and (y,x) judgments aggregate together. Per pair: `n,
    * wins_lo, wins_hi, ties` and the tie-splitting win rate on the
    * half-count lattice,
    *
    *   winrate_lo_ppm = 10⁶·(2·wins_lo + ties) div (2·n)
    *
    * — exact, no float. ONE aggregation keyed on the pair.
    */
  def winRate(prefs: DataFrame, modelACol: String, modelBCol: String,
      winnerCol: String): DataFrame = {
    val ta = prefs.schema(modelACol).dataType
    val tb = prefs.schema(modelBCol).dataType
    require(ta == tb,
      s"winRate: model columns must share one type to canonicalize " +
        s"pairs — $modelACol is ${ta.simpleString}, $modelBCol is " +
        s"${tb.simpleString}")
    val w = coalesce(col(winnerCol).try_cast("long"),
      raise_error(concat(lit("winRate: winner '"),
        coalesce(col(winnerCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    // Spark's least/greatest SKIP nulls — a null model id would
    // silently fold into the other side's ledger, so refuse first;
    // canonicalization stays on the NATIVE type (no long cast — a
    // string model name must not die in a cast)
    def model(c: String) = coalesce(col(c),
      raise_error(lit(s"winRate: null $c model id"))
        .cast(ta.simpleString))
    val a = model(modelACol)
    val b = model(modelBCol)
    val rows = prefs.select(
      when(a === b, raise_error(concat(lit("winRate: self-comparison "),
        a.cast("string"), lit(" vs itself"))).cast(ta.simpleString))
        .otherwise(least(a, b)).as("m_lo"),
      greatest(a, b).as("m_hi"),
      when(!w.isin(0L, 1L, 2L),
        raise_error(concat(lit("winRate: winner "), w.cast("string"),
          lit(" outside {0=tie, 1=A, 2=B}"))).cast("long"))
        // flip the verdict when canonicalization swapped the pair
        .when(a <= b, w)
        .otherwise(when(w === 0L, 0L).when(w === 1L, 2L).otherwise(1L))
        .as("__w"))
    rows.groupBy(col("m_lo"), col("m_hi"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__w") === 1, 1L).otherwise(0L)).as("wins_lo"),
        sum(when(col("__w") === 2, 1L).otherwise(0L)).as("wins_hi"),
        sum(when(col("__w") === 0, 1L).otherwise(0L)).as("ties"))
      .withColumn("winrate_lo_ppm",
        expr("(1000000L * (2L * wins_lo + ties)) div (2L * n)"))
  }

  /** Bradley–Terry strength fit over a [[winRate]] ledger — the arena
    * READOUT: per-pair win rates don't order k models; the BT model
    * (Bradley–Terry 1952) fits one strength pᵢ per model with
    * P(i beats j) = pᵢ/(pᵢ+pⱼ), via Hunter's MM updates (Hunter 2004,
    * "MM algorithms for generalized Bradley–Terry models"):
    *
    *   pᵢ ← Wᵢ / Σⱼ nᵢⱼ/(pᵢ+pⱼ),   then normalize Σp = 1
    *
    * run for EXACTLY `iters` rounds on an integer lattice — ties
    * half-credited on the doubled count (the [[winRate]] convention:
    * W2ᵢ = 2·winsᵢ + tiesᵢ, n2ᵢⱼ = 2·nᵢⱼ), every division an
    * integer `div`:
    *
    *   tᵢⱼ = (10⁹·n2ᵢⱼ) div (pᵢ+pⱼ)       (p on the ppm lattice)
    *   rawᵢ = (10⁹·W2ᵢ) div Σⱼ tᵢⱼ
    *   pᵢ  = max(1, (10⁶·rawᵢ) div Σ raw)
    *
    * — NO float anywhere, so the fit is bit-identical on any cluster
    * and replayable in ANSI SQL; fixed iteration count (not a
    * convergence test) for the same reason. The max(1, ·) floor keeps
    * a never-winning model's pseudo-strength at one ppm instead of a
    * zero that would divide later rounds by 0 — visibly the lattice
    * floor, not a fitted value (its `w2 = 0` rides along). Output one
    * row per model: `model, w2, n2, p_ppm` (n2 = doubled comparisons
    * played). Requires every ledger pair to have n ≥ 1 (winRate
    * guarantees it) and the comparison GRAPH to be connected for a
    * meaningful joint scale — disconnected components still converge
    * within themselves (the standard BT caveat, documented not
    * policed: connectivity is a [[graft.operators.Graph]] question).
    *
    * Overflow (loud under ANSI): 10⁹·n2ᵢⱼ < 2⁶³ bounds any single
    * pair at ~4.6·10⁹ comparisons; Σt over a model's pairs stays
    * < 2⁶² while its total comparisons stay < 9·10⁹. Scale shape:
    * the ledger is pair-sized (k models → ≤ k² rows, k ≤ 65536
    * enforced); each round is one broadcast-join of the p relation
    * onto the edges + one model-keyed aggregation + one 1-row fold,
    * lineage cut per round (the kCoreInt discipline) so `iters`
    * rounds cost `iters` plans, not one exponential one.
    */
  def bradleyTerry(ledger: DataFrame, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters=$iters out of [1, 64]")
    val spark = ledger.sparkSession
    // both directions of every pair: (model, opponent, w2 = model's
    // doubled wins incl. tie halves, n2 = doubled comparisons)
    val fwd = ledger.select(col("m_lo").as("i"), col("m_hi").as("j"),
      (lit(2L) * col("wins_lo") + col("ties")).as("w2"),
      (lit(2L) * col("n")).as("n2"))
    val rev = ledger.select(col("m_hi").as("i"), col("m_lo").as("j"),
      (lit(2L) * col("wins_hi") + col("ties")).as("w2"),
      (lit(2L) * col("n")).as("n2"))
    val edges = fwd.unionByName(rev).localCheckpoint()
    val models = edges.groupBy(col("i").as("model"))
      .agg(sum(col("w2")).as("w2"), sum(col("n2")).as("n2"))
      .localCheckpoint()
    val nModels = models.count()
    require(nModels >= 2 && nModels <= 65536,
      s"bradleyTerry: $nModels models out of [2, 65536] — a one-model " +
        "ledger has nothing to rank; shard a larger arena")
    var p = models.select(col("model"), lit(1000000L).as("p_ppm"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val pi = p.select(col("model").as("__mi"), col("p_ppm").as("__pi"))
      val pj = p.select(col("model").as("__mj"), col("p_ppm").as("__pj"))
      val denom = edges
        .join(broadcast(pi), col("i") === col("__mi"))
        .join(broadcast(pj), col("j") === col("__mj"))
        .select(col("i"),
          expr("(1000000000L * n2) div (__pi + __pj)").as("__t"))
        .groupBy(col("i"))
        .agg(sum(col("__t")).as("__d"))
      val raw = models.join(denom, col("model") === col("i"))
        .select(col("model"),
          expr("(1000000000L * w2) div __d").as("__raw"))
      val tot = raw.agg(sum(col("__raw")).as("__s"))
      p = raw.crossJoin(broadcast(tot))
        .select(col("model"),
          greatest(lit(1L), expr("(1000000L * __raw) div __s"))
            .as("p_ppm"))
        .localCheckpoint()
    }
    models.join(p, Seq("model"))
      .select(col("model"), col("w2"), col("n2"), col("p_ppm"))
  }

  /** Expected calibration error (Naeini 2015 / Guo 2017), FULLY
    * integer-exact: confidences arrive on the ppm lattice (the house
    * convention for classifier scores), bin b = min(bins−1,
    * conf·bins div 10⁶), and per bin the gap term needs no float at
    * all —
    *
    *   n_b·|acc_b − conf̄_b| = |10⁶·pos_b − Σconf_b| / 10⁶
    *   ece_micro = (Σ_b |10⁶·pos_b − Σconf_b|) div N
    *
    * (the 10⁶ in the divisor and the micro scaling cancel). Output one
    * row per OCCUPIED bin — `bin, n, pos, conf_sum`, the exact-ppm
    * `acc_ppm`/`conf_mean_ppm` — with `ece_micro` and `n_total`
    * attached to every row. Confidence outside [0, 10⁶] and non-0/1
    * labels refuse loudly. One (bin) aggregation + one 1-row fold.
    */
  def ece(df: DataFrame, confPpmCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 10000, s"bins=$bins out of [2, 10000]")
    val c = coalesce(col(confPpmCol).try_cast("long"),
      raise_error(concat(lit("ece: confidence '"),
        coalesce(col(confPpmCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long — quantize to the ppm " +
          "lattice upstream"))).cast("long"))
    val y = coalesce(col(labelCol).try_cast("long"),
      raise_error(concat(lit("ece: label '"),
        coalesce(col(labelCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val rows = df.select(
      when(c >= 0 && c <= 1000000L, c).otherwise(
        raise_error(concat(lit("ece: confidence "), c.cast("string"),
          lit(" outside [0, 1000000] ppm"))).cast("long")).as("__c"),
      when(y.isin(0L, 1L), y).otherwise(
        raise_error(concat(lit("ece: label "), y.cast("string"),
          lit(" outside {0,1}"))).cast("long")).as("__y"))
    val perBin = rows
      .withColumn("bin",
        least(lit(bins - 1L), expr(s"(__c * ${bins}L) div 1000000L")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"),
        sum(col("__c")).as("conf_sum"))
      .withColumn("acc_ppm", expr("(1000000L * pos) div n"))
      .withColumn("conf_mean_ppm", expr("conf_sum div n"))
      .withColumn("__gap", abs(lit(1000000L) * col("pos")
        - col("conf_sum")))
    val fold = perBin.agg(sum(col("__gap")).as("__g"),
      sum(col("n")).as("n_total"))
    perBin.crossJoin(broadcast(fold))
      .select(col("bin"), col("n"), col("pos"), col("conf_sum"),
        col("acc_ppm"), col("conf_mean_ppm"), col("n_total"),
        expr("__g div n_total").as("ece_micro"))
  }

  /** Brier score per key, fully integer-exact on the ppm lattice:
    *
    *   brier_micro = Σ (conf − 10⁶·y)² div (n · 10⁶)
    *
    * — each residual is an exact integer in [−10⁶, 10⁶], its square
    * ≤ 10¹², and the final integer division lands the mean squared
    * error in micro units (ANSI overflow is the loud guard past ~10⁶
    * rows per key; shard and re-fold the sums). The [[ece]] refusal
    * family applies (confidence in [0, 10⁶], labels 0/1). Calibration
    * (ECE) answers "are the probabilities honest"; Brier adds the
    * resolution term — both in one agg pass each, no float anywhere.
    */
  def brierScore(df: DataFrame, keyCol: String, confPpmCol: String,
      labelCol: String): DataFrame = {
    val c = coalesce(col(confPpmCol).try_cast("long"),
      raise_error(concat(lit("brierScore: confidence '"),
        coalesce(col(confPpmCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val y = coalesce(col(labelCol).try_cast("long"),
      raise_error(concat(lit("brierScore: label '"),
        coalesce(col(labelCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    df.select(col(keyCol).as("key"),
        when(c >= 0 && c <= 1000000L, c).otherwise(
          raise_error(concat(lit("brierScore: confidence "),
            c.cast("string"), lit(" outside [0, 1000000] ppm")))
            .cast("long")).as("__c"),
        when(y.isin(0L, 1L), y).otherwise(
          raise_error(concat(lit("brierScore: label "),
            y.cast("string"), lit(" outside {0,1}"))).cast("long"))
          .as("__y"))
      .withColumn("__d", col("__c") - lit(1000000L) * col("__y"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("__d") * col("__d")).as("__sq"))
      .select(col("key"), col("n"),
        expr("__sq div (n * 1000000L)").as("brier_micro"))
  }

  /** ROC AUC per key, exact on the midrank lattice — AUC is the
    * probability a random positive outscores a random negative (ties
    * half-credited), which is exactly the Mann–Whitney statistic:
    * [[graft.operators.Experiment.mannWhitneyU]] with the label as
    * the group yields the doubled U for the positive side, and
    *
    *   auc_ppm = (10⁶ · u1_x2) div (2 · n_neg · n_pos)
    *
    * — integer-exact end to end (the U machinery keeps midranks on a
    * doubled integer lattice; one integer division lands ppm). Null
    * when a class is absent (AUC undefined). Scores must be on an
    * integer lattice and labels 0/1, refused loudly by the shared
    * machinery. Same scale shape as the U test: one (key, score)
    * count + one key-partitioned window over DISTINCT score values.
    */
  def aucPpm(df: DataFrame, keyCol: String, scoreCol: String,
      labelCol: String): DataFrame =
    Experiment.mannWhitneyU(df, keyCol, labelCol, scoreCol)
      .select(col("exp").as("key"), col("n0").as("n_neg"),
        col("n1").as("n_pos"),
        when(col("n0") * col("n1") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000L * u1_x2) div (2L * n0 * n1)"))
          .as("auc_ppm"))

  /** Average precision per query — the area under the precision–
    * recall curve at the ranked positions, the retrieval companion to
    * [[aucPpm]] (ROC AUC is insensitive to class imbalance; AP is the
    * metric a retrieval eval actually reports when positives are
    * rare). Over a ranked list with binary relevance,
    *
    *   AP = (1/P) · Σ_{k : rel_k = 1} precision@k
    *
    * computed on the documented floored-ppm lattice: each relevant
    * position contributes `term_k = (10⁶ · relcnt_k) div k` (relcnt_k
    * = relevant results in the top k), and
    * `ap_ppm = (Σ term_k) div P` — every step an exact integer, so
    * both engines agree bit-for-bit; the floor costs < 1 ppm per
    * relevant row, stated here rather than hidden. Ranks are 1-based
    * and UNIQUE per query (duplicates double-book a position —
    * refused loudly, the [[ndcgAtK]] contract); relevance must be
    * 0/1. Null `ap_ppm` when the query has no relevant rows (AP
    * undefined, not zero).
    *
    * Scale shape: one query-partitioned ordered window (running
    * relevant count) + one aggregation — the same single shuffle as
    * nDCG; nothing global.
    */
  def averagePrecision(ranked: DataFrame, queryCol: String,
      rankCol: String, relCol: String): DataFrame = {
    val rank = coalesce(col(rankCol).try_cast("long"),
      raise_error(concat(lit("averagePrecision: rank '"),
        coalesce(col(rankCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val rel = coalesce(col(relCol).try_cast("long"),
      raise_error(concat(lit("averagePrecision: relevance '"),
        coalesce(col(relCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val rows = ranked.select(col(queryCol).as("query"),
      when(rank >= 1, rank).otherwise(
        raise_error(concat(lit("averagePrecision: rank "),
          rank.cast("string"), lit(" must be >= 1 (1-based ranks)")))
          .cast("long")).as("__rank"),
      when(rel.isin(0L, 1L), rel).otherwise(
        raise_error(concat(lit("averagePrecision: relevance "),
          rel.cast("string"), lit(" outside {0,1} — binary labels " +
            "only; grade-aware retrieval belongs in ndcgAtK")))
          .cast("long")).as("__rel"))
    val dupW = Window.partitionBy(col("query"), col("__rank"))
    val cumW = Window.partitionBy(col("query"))
      .orderBy(col("__rank"))
    rows
      .withColumn("__dup", count(lit(1)).over(dupW))
      .filter(when(col("__dup") > 1,
        raise_error(concat(lit("averagePrecision: duplicate rank "),
          col("__rank").cast("string"), lit(" in query '"),
          coalesce(col("query").cast("string"), lit("NULL")),
          lit("' — ranks must be unique per query"))).cast("boolean"))
        .otherwise(lit(true)))
      .withColumn("__relcnt", sum(col("__rel")).over(cumW))
      .withColumn("__term",
        when(col("__rel") === 1L,
          expr("(1000000L * __relcnt) div __rank")).otherwise(lit(0L)))
      .groupBy(col("query"))
      .agg(count(lit(1)).as("n"), sum(col("__rel")).as("n_pos"),
        sum(col("__term")).as("__tsum"))
      .select(col("query"), col("n"), col("n_pos"),
        when(col("n_pos") === 0, lit(null).cast("long"))
          .otherwise(expr("__tsum div n_pos")).as("ap_ppm"))
  }

  /** Krippendorff's alpha (nominal data) per group — the
    * reliability coefficient that, unlike [[fleissKappa]], needs no
    * fixed rater panel: units may carry any number of ratings ≥ 2
    * (missing ratings simply shrink the unit), which is the normal
    * shape of crowdsourced annotation ledgers. From per-(unit,
    * category) counts n_uc with unit sizes m_u (units with m_u < 2
    * are UNPAIRABLE and excluded by definition — visibly: the output
    * carries `n_dropped_units`), pairable total N = Σ m_u and
    * category totals n_c (Krippendorff 2004):
    *
    *   D_o ∝ Σ_u [ Σ_c n_uc·(m_u − n_uc) ] / (m_u − 1)
    *   D_e ∝ Σ_c n_c·(N − n_c) / (N − 1)
    *   α = 1 − D_o/D_e
    *
    * Lattice: the per-unit quotient is floored to micro units,
    * `du_micro = (10⁶ · Σ_c n_uc(m_u − n_uc)) div (m_u − 1)` — exact
    * up to 1 micro PER UNIT (±U micro overall, stated honestly, not
    * claimed exact); the final fold is
    * `alpha_ppm = 10⁶ − ((N−1) · Σ du_micro) div Σ_c n_c(N − n_c)`
    * (the 10⁶ scale rides in du_micro) on DECIMAL(38) — the
    * (N−1)·Σdu product overflows int64 near N ≈ 10⁷, ANSI-loud past
    * 10³⁸ — with both engines' integral division truncating. Null
    * `alpha_ppm` when N < 2 or every rating is one category (D_e = 0,
    * α undefined). Rating values may be any type; they are compared
    * as-is (nominal).
    *
    * Scale shape: one (group, unit, value) aggregation, one
    * (group, unit) fold, one (group, value) fold, one group fold —
    * all map-side-combined; nothing pairwise ever materializes (the
    * pair counts are closed-form in n_uc).
    */
  def krippendorffAlpha(ratings: DataFrame, groupCol: String,
      unitCol: String, valueCol: String): DataFrame = {
    val v = coalesce(col(valueCol).cast("string"),
      raise_error(lit("krippendorffAlpha: null rating value — drop " +
        "or impute upstream; a silent null category would be " +
        "counted as agreement")).cast("string"))
    val cells = ratings
      .select(col(groupCol).as("grp"), col(unitCol).as("unit"),
        v.as("__v"))
      .groupBy(col("grp"), col("unit"), col("__v"))
      .agg(count(lit(1)).as("n_uc"))
    val units = cells.groupBy(col("grp"), col("unit"))
      .agg(sum(col("n_uc")).as("m_u"))
    val paired = cells.join(units.select(col("grp").as("__g"),
        col("unit").as("__u"), col("m_u")),
      col("grp") <=> col("__g") && col("unit") <=> col("__u"))
      .filter(col("m_u") >= 2)
    // observed disagreement, unit-quotient floored to micro
    val doPerUnit = paired.groupBy(col("grp"), col("unit"))
      .agg(max(col("m_u")).as("m_u"),
        sum(col("n_uc") * (col("m_u") - col("n_uc"))).as("__dis"))
      .select(col("grp"),
        expr("(1000000L * __dis) div (m_u - 1L)").as("__du"))
    val doFold = doPerUnit.groupBy(col("grp").as("__g1"))
      .agg(sum(col("__du").cast("decimal(38,0)")).as("__do_micro"))
    // expected disagreement from category totals over pairable rows
    val cats = paired.groupBy(col("grp"), col("__v"))
      .agg(sum(col("n_uc")).as("n_c"))
    val catFold = cats.groupBy(col("grp").as("__g2"))
      .agg(sum(col("n_c")).as("__N"),
        count(lit(1)).as("n_categories"))
    val deFold = cats.join(catFold, col("grp") <=> col("__g2"))
      .groupBy(col("grp").as("__g3"))
      .agg(sum((col("n_c") * (col("__N") - col("n_c")))
          .cast("decimal(38,0)")).as("__de"),
        max(col("__N")).as("__N"),
        max(col("n_categories")).as("n_categories"))
    val unitStats = units.groupBy(col("grp").as("__g4"))
      .agg(sum(when(col("m_u") >= 2, 1L).otherwise(0L))
          .as("n_units"),
        sum(when(col("m_u") < 2, 1L).otherwise(0L))
          .as("n_dropped_units"))
    unitStats
      .join(doFold, col("__g4") <=> col("__g1"), "left")
      .join(deFold, col("__g4") <=> col("__g3"), "left")
      .select(col("__g4").as("grp"), col("n_units"),
        col("n_dropped_units"),
        coalesce(col("__N"), lit(0L)).as("n_pairable"),
        coalesce(col("n_categories"), lit(0L)).as("n_categories"),
        when(col("__N").isNull || col("__N") < 2 || col("__de") <= 0,
          lit(null).cast("long"))
          .otherwise(lit(1000000L) -
            expr("CAST((CAST(__N - 1L AS DECIMAL(38,0)) " +
              "* __do_micro) div __de AS BIGINT)"))
          .as("alpha_ppm"))
  }

  /** Seasonal-naive forecast backtest per series — the floor any
    * forecasting model must beat, and the denominators MASE is
    * defined against (Hyndman & Koehler 2006): over the `(ts, tie)`
    * order, every position past the first `m` is an eval row with
    * forecast `v_{t−m}` (seasonal naive) and scale reference
    * `v_{t−1}` (lag-1 naive). Per key:
    *
    *   mae_micro  = (10⁶·Σ|v_t − v_{t−m}|) div n_eval
    *   smape_ppm  = (Σ_t (2·10⁶·|e_t|) div (|v_t|+|v_{t−m}|)) div n_eval
    *   mase_ppm   = (10⁶·Σ|v_t − v_{t−m}|) div Σ|v_t − v_{t−1}|
    *
    * — all integral divisions on the input lattice; the sMAPE term
    * floors once per row (≤ 1 ppm each, stated) with the 0/0 row
    * (both sides zero) defined as 0, the standard convention; MASE
    * uses the lag-1 MAE over the SAME eval rows (n_eval cancels, one
    * cross-multiplied division — the in-sample/out-sample split is
    * the caller's windowing decision, stated, not hidden), null when
    * the series never moves (Σ|Δ₁| = 0 — MASE is undefined on a
    * constant reference). mase_ppm < 10⁶ = the seasonal pattern is
    * real; ≥ 10⁶ = yesterday's value beats last season's. Keys with
    * no eval rows (n ≤ m) are absent — there is nothing to score.
    * Values long-castable non-null, refused loudly; duplicate
    * `(ts, tie)` positions refuse (tied positions would make both
    * lags nondeterministic — the
    * [[graft.operators.Ops.mannKendallTrend]] contract); 2·10⁶·|e| is
    * int64-loud past |e| ≈ 4.6·10¹². One key-partitioned window
    * (two lags) + one map-side-combined fold.
    */
  def seasonalNaiveBacktest(df: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, valCol: String,
      m: Int): DataFrame = {
    require(m >= 1 && m <= 1000000, s"m=$m out of [1, 1000000]")
    val v = coalesce(col(valCol).try_cast("long"),
      raise_error(concat(lit("seasonalNaiveBacktest value '"),
        coalesce(col(valCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long — a dropped row " +
          "would shift every lag"))).cast("long"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("tie"))
    Ops.refuseDupPositions("seasonalNaiveBacktest",
        df.select(col(keyCol).as("key"),
          col(tsCol).cast("long").as("ts"),
          col(tieCol).cast("long").as("tie"), v.as("__v")),
        "key", "ts", "tie")
      .withColumn("__f", lag(col("__v"), m).over(w))
      .withColumn("__p", lag(col("__v"), 1).over(w))
      .filter(col("__f").isNotNull)
      .select(col("key"),
        abs(col("__v") - col("__f")).as("__em"),
        abs(col("__v") - col("__p")).as("__e1"),
        (abs(col("__v")) + abs(col("__f"))).as("__den"))
      .withColumn("__sm", when(col("__den") === 0, lit(0L))
        .otherwise(expr("(2000000L * __em) div __den")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_eval"),
        sum(col("__em")).as("__sem"), sum(col("__e1")).as("__se1"),
        sum(col("__sm")).as("__ssm"))
      .select(col("key"), col("n_eval"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __sem) " +
          "div n_eval AS BIGINT)").as("mae_micro"),
        expr("CAST(__ssm div n_eval AS BIGINT)").as("smape_ppm"),
        when(col("__se1") <= 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * __sem) " +
              "div __se1 AS BIGINT)")).as("mase_ppm"))
  }

  /** MASE of an EXTERNAL forecast column per series — the metric
    * that completes the forecast-eval trio ([[seasonalNaiveBacktest]]
    * scores the naive floor itself; this scores YOUR model against
    * that floor, Hyndman & Koehler 2006): over the `(ts, tie)` order,
    * rows past the first `m` are eval rows, and
    *
    *   mae_f_micro = (10⁶·Σ|y_t − f_t|) div n_eval
    *   mase_ppm    = (10⁶·Σ|y_t − f_t|) div Σ|y_t − y_{t−m}|
    *
    * — the scale reference is the SEASONAL-NAIVE error over the SAME
    * eval rows (n_eval cancels, one cross-multiplied integral
    * division; the in-sample/out-sample split is the caller's
    * windowing decision, the [[seasonalNaiveBacktest]] statement).
    * mase_ppm < 10⁶ = the model beats last season's value; null when
    * the naive reference never errs (a perfectly seasonal series —
    * MASE is undefined, visibly). Keys with no eval rows are absent.
    * Values AND forecasts long-castable non-null, refused loudly
    * (a null forecast is a missing prediction — score it upstream
    * or drop the row visibly); duplicate positions refuse. One
    * key-partitioned window (one lag) + one map-side-combined fold.
    */
  def maseForecast(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, actualCol: String, forecastCol: String,
      m: Int): DataFrame = {
    require(m >= 1 && m <= 1000000, s"m=$m out of [1, 1000000]")
    def lng(c: String, what: String) =
      coalesce(col(c).try_cast("long"),
        raise_error(concat(lit(s"maseForecast $what '"),
          coalesce(col(c).cast("string"), lit("NULL")),
          lit("' is null or not castable to long"))).cast("long"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("tie"))
    Ops.refuseDupPositions("maseForecast",
        df.select(col(keyCol).as("key"),
          col(tsCol).cast("long").as("ts"),
          col(tieCol).cast("long").as("tie"),
          lng(actualCol, "actual").as("__y"),
          lng(forecastCol, "forecast").as("__f")),
        "key", "ts", "tie")
      .withColumn("__nv", lag(col("__y"), m).over(w))
      .filter(col("__nv").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("__y") - col("__f"))).as("__ef"),
        sum(abs(col("__y") - col("__nv"))).as("__en"))
      .select(col("key"), col("n_eval"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __ef) " +
          "div n_eval AS BIGINT)").as("mae_f_micro"),
        when(col("__en") <= 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * __ef) " +
              "div __en AS BIGINT)")).as("mase_ppm"))
  }

  /** Token-level word error rate per (hypothesis, reference) pair —
    * the ASR/transcription metric [[emF1]]'s bag-of-tokens F1 cannot
    * give (WER charges ORDER errors: a transposition is two edits to
    * WER and invisible to F1): whitespace tokens, exact Levenshtein
    * distance, `wer_ppm = (10⁶·dist) div n_ref` (null with n_ref = 0
    * visible — against an empty reference the rate is unbounded).
    *
    * The distance runs CODEGEN'D: the pair's token vocabulary is
    * mapped to single ASCII codepoints (any bijection preserves edit
    * distance) and the built-in `levenshtein` does the DP — which is
    * why the pair vocabulary is a LOUD ≤ 94 contract (the printable
    * ASCII range; sentence/utterance pairs live well under it, and a
    * document-sized WER wants a banded-DP operator, not a bigger
    * alphabet). Null texts refuse; empty texts are legitimate (zero
    * tokens). One row-local pass — no shuffle at all.
    */
  def wordErrorRate(pairs: DataFrame, idCol: String, hypCol: String,
      refCol: String, maxVocab: Int = 94): DataFrame = {
    require(maxVocab >= 1 && maxVocab <= 94,
      s"maxVocab=$maxVocab out of [1, 94] (printable ASCII)")
    def toks(c: String, what: String) = {
      val t = coalesce(col(c).cast("string"),
        raise_error(lit(s"wordErrorRate: null $what text — score " +
          "or drop the row visibly upstream")).cast("string"))
      filter(split(trim(t), "\\s+"), x => x =!= "")
    }
    pairs.select(col(idCol).as("id"),
        toks(hypCol, "hypothesis").as("__h"),
        toks(refCol, "reference").as("__r"))
      .withColumn("__vocab",
        array_sort(array_distinct(concat(col("__h"), col("__r")))))
      .filter(when(size(col("__vocab")) > maxVocab,
        raise_error(concat(lit("wordErrorRate: pair '"),
          col("id").cast("string"), lit("' has "),
          size(col("__vocab")).cast("string"),
          lit(s" distinct tokens > maxVocab=$maxVocab — " +
            "chunk to utterances upstream"))).cast("boolean"))
        .otherwise(lit(true)))
      .withColumn("__eh", expr("concat_ws('', transform(__h, " +
        "x -> chr(array_position(__vocab, x) + 32)))"))
      .withColumn("__er", expr("concat_ws('', transform(__r, " +
        "x -> chr(array_position(__vocab, x) + 32)))"))
      .select(col("id"), size(col("__h")).cast("long").as("n_hyp"),
        size(col("__r")).cast("long").as("n_ref"),
        levenshtein(col("__eh"), col("__er")).cast("long")
          .as("dist"),
        when(size(col("__r")) === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000L * CAST(levenshtein(__eh, __er)" +
            " AS BIGINT)) div CAST(size(__r) AS BIGINT)"))
          .as("wer_ppm"))
  }

  /** Pinball (quantile) loss per key — the scoring rule for a
    * QUANTILE forecast ([[seasonalNaiveBacktest]] grades the median
    * view; a capacity planner's P90 forecast is graded by pinball at
    * q = 0.9, which penalizes under-prediction q/(1−q) times harder):
    *
    *   loss(a, f) = qPpm·(a−f)        if a ≥ f
    *              = (10⁶−qPpm)·(f−a)  otherwise
    *
    * exact int64 per row in ppm·lattice units (loud past |a−f| ≈
    * 9·10¹²), folded to `n, sum_loss_ppm, mean_loss_ppm` (ONE
    * integral division). Nulls refuse loudly. One map-side-combined
    * agg — nothing else moves.
    */
  def pinballLossPpm(df: DataFrame, keyCol: String, actualCol: String,
      forecastCol: String, qPpm: Long): DataFrame = {
    require(qPpm >= 1 && qPpm <= 999999L,
      s"qPpm=$qPpm out of [1, 999999]")
    def m(c: String, what: String) = coalesce(col(c).try_cast("long"),
      raise_error(concat(lit(s"pinballLossPpm: $what '"),
        coalesce(col(c).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    df.select(col(keyCol).as("key"), m(actualCol, "actual").as("__a"),
        m(forecastCol, "forecast").as("__f"))
      .withColumn("__loss",
        when(col("__a") >= col("__f"),
          lit(qPpm) * (col("__a") - col("__f")))
          .otherwise(lit(1000000L - qPpm)
            * (col("__f") - col("__a"))))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("__loss"))
        .as("sum_loss_ppm"))
      .withColumn("mean_loss_ppm", expr("sum_loss_ppm div n"))
  }

  /** Hosmer–Lemeshow calibration deciles per key — the RANK-bucketed
    * companion to [[ece]]'s value-bucketed bins (equal-count deciles
    * are the textbook HL grouping; value bins go empty exactly where
    * the model is confident): rows ranked by `(conf_ppm, tie)`,
    * decile `g = ((rank−1)·10) div n`, and per decile the EXACT
    * integer χ² inputs — `n_g`, observed `o_g = Σ label`, expected
    * `e_ppm = Σ conf_ppm` (expected conversions ×10⁶ — no floor
    * anywhere; the χ² fold `Σ(o·10⁶−e)²/(e·(1−e/(n·10⁶)))` is float
    * and stays caller-side per the [[graft.operators.Experiment
    * .logRank]] convention). Labels 0/1 and conf in [0, 10⁶],
    * refused loudly; duplicate `(conf, tie)` pairs refuse (the rank
    * must be total or the decile boundary is arbitrary). One
    * key-partitioned rank window + one (key, decile) fold.
    */
  def hosmerLemeshowDeciles(df: DataFrame, keyCol: String,
      tieCol: String, confPpmCol: String,
      labelCol: String): DataFrame = {
    val cf = coalesce(col(confPpmCol).try_cast("long"),
      raise_error(concat(lit("hosmerLemeshowDeciles: confidence '"),
        coalesce(col(confPpmCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val lb = coalesce(col(labelCol).try_cast("long"),
      raise_error(concat(lit("hosmerLemeshowDeciles: label '"),
        coalesce(col(labelCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val rows = df.select(col(keyCol).as("key"),
      col(tieCol).cast("long").as("__e"),
      when(cf >= 0 && cf <= 1000000L, cf).otherwise(
        raise_error(concat(lit("hosmerLemeshowDeciles: confidence "),
          cf.cast("string"), lit(" outside [0, 1000000] ppm")))
          .cast("long")).as("__c"),
      when(lb.isin(0L, 1L), lb).otherwise(
        raise_error(concat(lit("hosmerLemeshowDeciles: label "),
          lb.cast("string"), lit(" outside {0,1}"))).cast("long"))
        .as("__l"))
    val dupW = Window.partitionBy(col("key"), col("__c"), col("__e"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("__c"), col("__e"))
    rows
      .withColumn("__dup", count(lit(1)).over(dupW))
      .filter(when(col("__dup") > 1,
        raise_error(concat(lit("hosmerLemeshowDeciles: duplicate " +
          "(confidence, tie) in key '"),
          coalesce(col("key").cast("string"), lit("NULL")),
          lit("' — the decile boundary needs a total order")))
          .cast("boolean")).otherwise(lit(true)))
      .drop("__dup")
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("key"))))
      .withColumn("decile", expr("((__r - 1L) * 10L) div __n"))
      .groupBy(col("key"), col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("__l")).as("o"),
        sum(col("__c")).as("e_ppm"))
  }

  /** Isotonic (monotone non-decreasing) fit per key on the micro
    * lattice — the calibration-CURVE completion of [[ece]]'s gap
    * number (a reliability diagram is only readable once the
    * empirical accuracies are pooled monotone; PAVA's minimax form
    *
    *   fit_i = max_{j≤i} min_{k≥i} mean(v[j..k])
    *
    * is order-free, so it distributes): segment means floored ONCE
    * to micro per (j,k) (truncation toward zero on negatives,
    * stated — so the fit is the exact minimax of the LATTICE means,
    * within 1 micro of the real-valued PAVA fit), the min over ONE
    * (key, i, j)-grouped fold, the max over a second. The (j, k, i)
    * relation is n³/6-sized BY DEFINITION ⇒ a LOUD ≤ maxN contract
    * (calibration diagrams live at tens of bins; a million-point
    * isotonic fit is [[isotonicFitLarge]]'s sequential PAVA,
    * bit-equal on every input both accept).
    * Duplicate positions refuse. Output: `key, ts, tie, v,
    * iso_micro` — non-decreasing in `(ts, tie)` per key by
    * construction.
    */
  def isotonicFitMicro(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String, maxN: Int = 64): DataFrame = {
    require(maxN >= 1 && maxN <= 512, s"maxN=$maxN out of [1, 512]")
    val v = coalesce(col(valCol).try_cast("long"),
      raise_error(concat(lit("isotonicFitMicro value '"),
        coalesce(col(valCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val dupW = Window.partitionBy(col("key"), col("ts"), col("tie"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("tie"))
    val pre = df.select(col(keyCol).as("key"),
        col(tsCol).cast("long").as("ts"),
        col(tieCol).cast("long").as("tie"), v.as("v"))
      .withColumn("__dup", count(lit(1)).over(dupW))
      .filter(when(col("__dup") > 1,
        raise_error(concat(lit("isotonicFitMicro: duplicate " +
          "position (ts, tie) in key '"),
          coalesce(col("key").cast("string"), lit("NULL")),
          lit("' — the fit order must be total"))).cast("boolean"))
        .otherwise(lit(true)))
      .drop("__dup")
      .withColumn("__pos", row_number().over(w).cast("long"))
      .withColumn("__pre", sum(col("v")).over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("key"))))
      .filter(when(col("__n") > maxN,
        raise_error(concat(lit("isotonicFitMicro: key '"),
          coalesce(col("key").cast("string"), lit("NULL")),
          lit("' has "), col("__n").cast("string"),
          lit(s" rows > maxN=$maxN — the minimax relation is " +
            "n^3-sized; pre-bin upstream or use isotonicFitLarge")))
          .cast("boolean")).otherwise(lit(true)))
      .localCheckpoint()
    val a = pre.select(col("key").as("__k1"), col("__pos").as("__j"),
      (col("__pre") - col("v")).as("__pjm1"))
    val b = pre.select(col("key").as("__k2"), col("__pos").as("__k"),
      col("__pre").as("__prek"))
    val pairsJk = a.join(b, col("__k1") <=> col("__k2")
        && col("__j") <= col("__k"))
      .select(col("__k1").as("__kp"), col("__j"), col("__k"),
        expr("(1000000L * (__prek - __pjm1)) div (__k - __j + 1L)")
          .as("__avg"))
    val inner = pre.select(col("key").as("__ki"),
        col("__pos").as("__i"))
      .join(pairsJk, col("__ki") <=> col("__kp")
        && col("__j") <= col("__i") && col("__k") >= col("__i"))
      .groupBy(col("__ki"), col("__i"), col("__j"))
      .agg(min(col("__avg")).as("__mn"))
    val fit = inner.groupBy(col("__ki"), col("__i"))
      .agg(max(col("__mn")).as("iso_micro"))
    pre.join(fit, col("key") <=> col("__ki")
        && col("__pos") === col("__i"))
      .select(col("key"), col("ts"), col("tie"), col("v"),
        col("iso_micro"))
  }

  /** Isotonic fit at LARGE key sizes — the sequential PAVA
    * [[isotonicFitMicro]]'s n³ minimax contract points at, BIT-EQUAL
    * to it on every input both accept: because truncation toward
    * zero is monotone it commutes with min and max, so
    * `trunc(10⁶·(max_j min_k mean))` — the real PAVA fit on the
    * micro lattice — equals the micro operator's
    * `max_j min_k trunc(10⁶·mean)` exactly. The pools come from the
    * classic O(n) stack walk (Ayer et al. 1955): push each value as
    * a pool, merge backward while the last pool's mean exceeds the
    * new one's (exact BigInt cross-multiplication — no float, no
    * overflow), emit each element's pool mean as
    * `(10⁶·sum) div count` with BigInt truncation (== Spark `div`).
    *
    * Shape: ONE `flatMapGroups` per key over the sorted rows — the
    * bounded-state kernel shape the streaming suites run on; a key's
    * rows must fit one task, the loud ≤ `maxN` contract (default
    * 2²⁰ — 16,000× the minimax bound; a calibration curve over a
    * million raw scores fits). |v| > 10¹² refuses (10⁶·mean must
    * stay in int64). The key column rides as its STRING form (the
    * group encoder needs a concrete type — stated). Duplicate
    * positions refuse, the [[isotonicFitMicro]] contract. Output:
    * `key, ts, tie, v, iso_micro`.
    */
  def isotonicFitLarge(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String,
      maxN: Int = 1 << 20): DataFrame = {
    require(maxN >= 1 && maxN <= (1 << 24),
      s"maxN=$maxN out of [1, 2^24]")
    val v = coalesce(col(valCol).try_cast("long"),
      raise_error(concat(lit("isotonicFitLarge value '"),
        coalesce(col(valCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val spark = df.sparkSession
    import spark.implicits._
    val pre = df.select(col(keyCol).cast("string").as("key"),
      col(tsCol).cast("long").as("ts"),
      col(tieCol).cast("long").as("tie"), v.as("v"))
      .as[(String, Long, Long, Long)]
    pre.groupByKey(_._1)
      .flatMapGroups { (key: String,
          it: Iterator[(String, Long, Long, Long)]) =>
        val arr = it.toArray
        if (arr.length > maxN)
          throw new IllegalArgumentException(
            s"isotonicFitLarge: key '$key' has ${arr.length} rows " +
              s"> maxN=$maxN — one key must fit one task; shard " +
              "or pre-bin upstream")
        java.util.Arrays.sort(arr,
          Ordering.by((r: (String, Long, Long, Long)) => (r._2, r._3)))
        var i = 1
        while (i < arr.length) {
          if (arr(i)._2 == arr(i - 1)._2 && arr(i)._3 == arr(i - 1)._3)
            throw new IllegalArgumentException(
              s"isotonicFitLarge: duplicate position (ts, tie) in " +
                s"key '$key' — the fit order must be total")
          if (math.abs(arr(i)._4) > 1000000000000L)
            throw new IllegalArgumentException(
              s"isotonicFitLarge: |value| ${arr(i)._4} > 1e12 — " +
                "10^6·mean must stay in int64; rescale upstream")
          i += 1
        }
        if (arr.nonEmpty && math.abs(arr(0)._4) > 1000000000000L)
          throw new IllegalArgumentException(
            s"isotonicFitLarge: |value| ${arr(0)._4} > 1e12 — " +
              "10^6·mean must stay in int64; rescale upstream")
        // PAVA pool stack: sums exact in BigInt, counts in Long
        val sums = new Array[BigInt](arr.length)
        val cnts = new Array[Long](arr.length)
        var top = -1
        arr.foreach { r =>
          top += 1; sums(top) = BigInt(r._4); cnts(top) = 1L
          // merge while the previous pool's mean EXCEEDS this one's
          // (strict: equal means stay separate — same fit either way)
          while (top > 0 &&
              sums(top - 1) * cnts(top) > sums(top) * cnts(top - 1)) {
            sums(top - 1) += sums(top)
            cnts(top - 1) += cnts(top)
            top -= 1
          }
        }
        // emit each element's pool mean, truncated toward zero
        val out = new Array[(String, Long, Long, Long, Long)](arr.length)
        var p = 0; var ix = 0
        while (p <= top) {
          val fit = (BigInt(1000000) * sums(p) / cnts(p)).toLong
          var c = 0L
          while (c < cnts(p)) {
            val r = arr(ix)
            out(ix) = (key, r._2, r._3, r._4, fit)
            ix += 1; c += 1
          }
          p += 1
        }
        out.iterator
      }
      .toDF("key", "ts", "tie", "v", "iso_micro")
  }

  /** Cumulative gains / lift table per key — the DISCRIMINATION view
    * next to [[hosmerLemeshowDeciles]]' calibration and [[aucPpm]]'s
    * single number ("if we act on the top 20% by score, what share
    * of the positives do we capture, and how much better than
    * random is that"): rows ranked by `(score DESC, tie)`, bucket
    * `g = ((rank−1)·nBuckets) div n`, per bucket the exact integers
    * and the cumulative
    *
    *   capture_ppm = (10⁶·cum_o) div tot_o
    *   lift_ppm    = (10⁶·cum_o·n) div (tot_o·cum_n)   [DECIMAL(38)]
    *
    * (top bucket first — lift_ppm at bucket 0 is the headline;
    * capture is null when the key has NO positives, visibly).
    * Labels 0/1 refused loudly; duplicate `(score, tie)` refuses
    * (the bucket boundary needs a total order). One key-partitioned
    * rank window + one (key, bucket) fold + one key-ordered
    * cumulative window over nBuckets rows.
    */
  def gainsTable(df: DataFrame, keyCol: String, tieCol: String,
      scoreCol: String, labelCol: String,
      nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000,
      s"nBuckets=$nBuckets out of [2, 1000]")
    val sc = coalesce(col(scoreCol).try_cast("long"),
      raise_error(concat(lit("gainsTable score '"),
        coalesce(col(scoreCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val lb = coalesce(col(labelCol).try_cast("long"),
      raise_error(concat(lit("gainsTable label '"),
        coalesce(col(labelCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val rows = df.select(col(keyCol).as("key"),
      col(tieCol).cast("long").as("__e"), sc.as("__s"),
      when(lb.isin(0L, 1L), lb).otherwise(
        raise_error(concat(lit("gainsTable label "),
          lb.cast("string"), lit(" outside {0,1}"))).cast("long"))
        .as("__l"))
    val dupW = Window.partitionBy(col("key"), col("__s"), col("__e"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("__s").desc, col("__e"))
    val cum = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .withColumn("__dup", count(lit(1)).over(dupW))
      .filter(when(col("__dup") > 1,
        raise_error(concat(lit("gainsTable: duplicate " +
          "(score, tie) in key '"),
          coalesce(col("key").cast("string"), lit("NULL")),
          lit("' — the bucket boundary needs a total order")))
          .cast("boolean")).otherwise(lit(true)))
      .drop("__dup")
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("key"))))
      .withColumn("bucket",
        expr(s"((__r - 1L) * ${nBuckets}L) div __n"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__l")).as("o"),
        max(col("__n")).as("__tot"))
      .withColumn("cum_n", sum(col("n")).over(cum))
      .withColumn("cum_o", sum(col("o")).over(cum))
      .withColumn("__totO", sum(col("o")).over(
        Window.partitionBy(col("key"))))
      .select(col("key"), col("bucket"), col("n"), col("o"),
        col("cum_n"), col("cum_o"),
        when(col("__totO") <= 0, lit(null).cast("long"))
          .otherwise(expr("(1000000L * cum_o) div __totO"))
          .as("capture_ppm"),
        when(col("__totO") <= 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * cum_o * __tot)" +
              " div (CAST(__totO AS DECIMAL(38,0)) * cum_n)" +
              " AS BIGINT)")).as("lift_ppm"))
  }

  /** Quadratic-weighted Cohen's kappa per key — the ORDINAL
    * agreement [[cohensKappa]]'s unweighted form throws away (a
    * 1-vs-2 disagreement on a 5-point rubric is NOT a 1-vs-5
    * disagreement; quadratic weights (i−j)² are the standard
    * penalty, Cohen 1968):
    *
    *   κ_w = 1 − (n · Σ(i−j)²·O_ij) / (Σ(i−j)²·r_i·c_j)
    *
    * — O the observed pair counts, r/c the marginal totals — as ONE
    * integral division on DECIMAL(38) (`kappa_w_ppm = 10⁶ −
    * (10⁶·n·num) div den`; num/den exact integers, so the only
    * floor is the final ppm truncation). Ratings must be integers
    * in [0, maxCat), refused loudly; null when the chance-expected
    * weighted disagreement is zero (both raters constant — κ_w is
    * undefined, not perfect). The category grid is maxCat²-bounded
    * (≤ 64²). One (key, i, j) map-side agg + two marginal folds +
    * one key-local grid join.
    */
  def weightedKappa(ratings: DataFrame, keyCol: String, r1Col: String,
      r2Col: String, maxCat: Int = 16): DataFrame = {
    require(maxCat >= 2 && maxCat <= 64,
      s"maxCat=$maxCat out of [2, 64]")
    def rt(c: String) = {
      val v = coalesce(col(c).try_cast("long"),
        raise_error(concat(lit(s"weightedKappa: rating $c '"),
          coalesce(col(c).cast("string"), lit("NULL")),
          lit("' is null or not castable to long"))).cast("long"))
      when(v >= 0 && v < maxCat, v).otherwise(
        raise_error(concat(lit(s"weightedKappa: rating $c "),
          v.cast("string"), lit(s" outside [0, $maxCat)")))
          .cast("long"))
    }
    val cells = ratings.select(col(keyCol).as("key"),
        rt(r1Col).as("__i"), rt(r2Col).as("__j"))
      .groupBy(col("key"), col("__i"), col("__j"))
      .agg(count(lit(1)).as("__o"))
    val num = cells.groupBy(col("key"))
      .agg(count(lit(1)).as("__cells"), sum(col("__o")).as("n"),
        sum((col("__i") - col("__j")) * (col("__i") - col("__j"))
          * col("__o")).as("__num"))
    val rTot = cells.groupBy(col("key").as("__kr"), col("__i"))
      .agg(sum(col("__o")).as("__ri"))
    val cTot = cells.groupBy(col("key").as("__kc"), col("__j"))
      .agg(sum(col("__o")).as("__cj"))
    val den = rTot.join(cTot, col("__kr") <=> col("__kc"))
      .select(col("__kr"),
        ((col("__i") - col("__j")) * (col("__i") - col("__j"))
          .cast("decimal(38,0)") * col("__ri") * col("__cj"))
          .as("__t"))
      .groupBy(col("__kr")).agg(sum(col("__t")).as("__den"))
    num.join(den, col("key") <=> col("__kr"))
      .select(col("key"), col("n"), col("__num").as("num"),
        when(col("__den") <= 0, lit(null).cast("long"))
          .otherwise(expr(
            "1000000L - CAST((CAST(1000000 AS DECIMAL(38,0)) * n" +
              " * num) div __den AS BIGINT)")).as("kappa_w_ppm"))
  }

  /** Cronbach's α per key — the internal-consistency check a
    * multi-item rubric needs before anyone averages its items
    * (Cronbach 1951: if the items don't co-vary, their mean is not
    * a scale): with k items scored by n respondents,
    *
    *   α = k/(k−1) · (1 − ΣVᵢ / V_T)
    *
    * computed on EXACT integer moment sums — population variances
    * share the n² denominator, so `α_milli = (1000·k·(D − N)) div
    * ((k−1)·D)` with `N = Σᵢ(n·Qᵢ − Sᵢ²)`, `D = n·Q_T − S_T²` on
    * DECIMAL(38) is ONE truncation (≤ 1 milli; α lives on [−∞, 1] so
    * milli is the honest scale). The design must be COMPLETE and
    * UNIQUE — every respondent scores every item exactly once,
    * refused loudly (a silently missing cell deflates Vᵢ and
    * inflates α, the exact failure the statistic guards against).
    * Zero total variance (all respondents identical) ⇒ null. One
    * (key, item) agg + one (key, respondent) agg + two folds.
    */
  def cronbachAlpha(df: DataFrame, keyCol: String, respCol: String,
      itemCol: String, scoreCol: String): DataFrame = {
    val sc = coalesce(col(scoreCol).try_cast("long"),
      raise_error(concat(lit("cronbachAlpha: score '"),
        coalesce(col(scoreCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long"))).cast("long"))
    val rows = df.select(col(keyCol).as("key"),
      coalesce(col(respCol).cast("string"),
        raise_error(lit("cronbachAlpha: null respondent"))
          .cast("string")).as("__r"),
      coalesce(col(itemCol).cast("string"),
        raise_error(lit("cronbachAlpha: null item")).cast("string"))
        .as("__i"), sc.as("__v"))
    val dupW = Window.partitionBy(col("key"), col("__r"), col("__i"))
    val checked = rows
      .withColumn("__dup", count(lit(1)).over(dupW))
      .filter(when(col("__dup") > 1,
        raise_error(concat(lit("cronbachAlpha: respondent '"),
          col("__r"), lit("' scored item '"), col("__i"),
          lit("' more than once"))).cast("boolean"))
        .otherwise(lit(true)))
      .drop("__dup")
    val kItems = checked.groupBy(col("key").as("__kk"))
      .agg(countDistinct(col("__i")).as("__k"))
    val perResp = checked.groupBy(col("key"), col("__r"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__v")).as("__t"))
    val respFold = perResp
      .join(kItems, col("key") <=> col("__kk"))
      .filter(when(col("__cnt") =!= col("__k"),
        raise_error(concat(lit("cronbachAlpha: respondent '"),
          col("__r"), lit("' scored "), col("__cnt").cast("string"),
          lit(" of "), col("__k").cast("string"),
          lit(" items — the design must be complete; impute or " +
            "drop visibly upstream"))).cast("boolean"))
        .otherwise(lit(true)))
      .groupBy(col("key").as("__kt"))
      .agg(count(lit(1)).as("n"), max(col("__k")).as("k"),
        sum(col("__t").cast("decimal(38,0)") * col("__t"))
          .as("__st2"),
        sum(col("__t")).as("__st"),
        sum(col("__cnt")).as("__rows"))
    val itemFold = checked.groupBy(col("key"), col("__i"))
      .agg(sum(col("__v")).as("__si"),
        sum(col("__v").cast("decimal(38,0)") * col("__v"))
          .as("__qi"))
      .groupBy(col("key").as("__ki"))
      .agg(sum(col("__qi")).as("__sq"),
        sum(col("__si").cast("decimal(38,0)") * col("__si"))
          .as("__ss2"))
    respFold.join(itemFold, col("__kt") <=> col("__ki"))
      .select(col("__kt").as("key"), col("n"), col("k"),
        expr("CAST(n AS DECIMAL(38,0)) * __sq - __ss2").as("__nn"),
        expr("CAST(n AS DECIMAL(38,0)) * __st2 " +
          "- CAST(__st AS DECIMAL(38,0)) * __st").as("__dd"))
      .select(col("key"), col("n"), col("k"),
        when(col("k") < 2 || expr("__dd <= 0"),
          lit(null).cast("long"))
          .otherwise(expr(
            "CAST((CAST(1000 AS DECIMAL(38,0)) * k * (__dd - __nn))" +
              " div ((k - 1) * __dd) AS BIGINT)"))
          .as("alpha_milli"))
  }
}
