package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Model-based quality filtering: a linear classifier over cheap surface
  * statistics, trained IN the engine — the scale path for the
  * "fastText-style quality classifier" stage of published curation
  * pipelines (CCNet, GPT-3/Gopher data work), where a model scores every
  * document and the pipeline keeps the high-scoring tail.
  *
  * The trainer is the batch (aggregate) perceptron in EXACT INTEGER
  * arithmetic: per epoch, w ← w + Σ_{i : y_i (w·x_i) ≤ 0} y_i x_i. Each
  * epoch is ONE map-side-combined aggregation over the corpus (d bounded
  * sums), and the weight vector lives on the driver — the classic
  * "gradient aggregation, driver update" shape that scales to any corpus
  * size: no shuffle grows with rows, state is d longs.
  *
  * Integer arithmetic is a design decision, not a simplification (the q146
  * lesson institutionalized): integer sums are order-independent, so the
  * trained weights are bit-identical across partitionings, schedulings,
  * and engines — a DuckDB oracle replays every epoch exactly. A
  * float/sigmoid trainer (logistic regression) would reintroduce
  * merge-order ulps into the gate.
  */
object QualityModel {

  /** Integer surface features for [[perceptronTrain]], appended to `docs`:
    * bias 1, token count, punctuation chars, digit chars, stopword hits.
    * Null-text rows are dropped (a classifier has nothing to read).
    * Every feature is a plain count — cross-engine exact.
    */
  val featureCols: Seq[String] = Seq("x0", "x1", "x2", "x3", "x4")

  def docFeatures(docs: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    docs.filter(text.isNotNull)
      .withColumn("x0", lit(1L))
      .withColumn("x1", TextFns.tokenCount(text).cast("long"))
      .withColumn("x2",
        length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("long"))
      .withColumn("x3",
        length(regexp_replace(text, "[^0-9]", "")).cast("long"))
      .withColumn("x4", TextFns.stopwordHitCount(text).cast("long"))
  }

  private def dot(w: Seq[Long], feats: Seq[String]): Column =
    feats.zip(w).map { case (c, wi) => col(c) * lit(wi) }
      .reduce(_ + _)

  /** Train for `epochs` full passes. `labelCol` must be ±1 (long). Weights
    * start at zero (epoch 1 therefore updates on every row — margin 0
    * counts as misclassified, the standard convention). Returns the final
    * weight per feature column.
    *
    * Scale shape: `epochs` jobs, each one aggregation producing `d` longs;
    * nothing else crosses to the driver. Callers cache/checkpoint the
    * feature relation when the corpus scan is expensive.
    */
  def perceptronTrain(feats: DataFrame, labelCol: String,
      featureColumns: Seq[String], epochs: Int): Seq[Long] = {
    require(epochs >= 1 && epochs <= 64,
      s"epochs $epochs out of the driver-side contract bound [1, 64]")
    require(featureColumns.nonEmpty && featureColumns.size <= 64,
      s"${featureColumns.size} feature columns out of bound [1, 64]")
    var w = Seq.fill(featureColumns.size)(0L)
    var e = 0
    while (e < epochs) {
      val mis = col(labelCol) * dot(w, featureColumns) <= 0
      val aggs = featureColumns.map(c =>
        coalesce(sum(when(mis, col(labelCol) * col(c)).otherwise(lit(0L))),
          lit(0L)).as(s"g_$c"))
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      w = w.zipWithIndex.map { case (wi, j) => wi + row.getLong(j) }
      e += 1
    }
    w
  }

  /** Batch perceptron with AVERAGING (Freund & Schapire 1999's averaged
    * perceptron, batch form): returns (final, summed-over-epochs) weight
    * vectors. The epoch sum Σ_e w_e is exact integers like everything
    * else here, and sign(Σw·x) ≡ sign(avg(w)·x) — so averaged prediction
    * needs no division and stays engine-exact. Averaging damps the last
    * epoch's overshoot on non-separable data (the standard NLP fix); the
    * cost is identical — the sums ride the same one-agg-per-epoch loop.
    */
  def perceptronTrainAveraged(feats: DataFrame, labelCol: String,
      featureColumns: Seq[String], epochs: Int): (Seq[Long], Seq[Long]) = {
    require(epochs >= 1 && epochs <= 64,
      s"epochs $epochs out of the driver-side contract bound [1, 64]")
    var w = Seq.fill(featureColumns.size)(0L)
    var acc = Seq.fill(featureColumns.size)(0L)
    var e = 0
    while (e < epochs) {
      val mis = col(labelCol) * dot(w, featureColumns) <= 0
      val aggs = featureColumns.map(c =>
        coalesce(sum(when(mis, col(labelCol) * col(c)).otherwise(lit(0L))),
          lit(0L)).as(s"g_$c"))
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      w = w.zipWithIndex.map { case (wi, j) => wi + row.getLong(j) }
      acc = acc.zip(w).map { case (a, wi) => a + wi }
      e += 1
    }
    (w, acc)
  }

  /** Score + hard decision under trained weights: margin = w·x,
    * pred = 1 if margin > 0 else -1 (margin 0 → -1, matching the
    * misclassified-at-0 training convention). Map-side only.
    */
  def perceptronPredict(feats: DataFrame, weights: Seq[Long],
      featureColumns: Seq[String]): DataFrame = {
    require(weights.size == featureColumns.size,
      s"${weights.size} weights for ${featureColumns.size} features")
    feats
      .withColumn("margin", dot(weights, featureColumns))
      .withColumn("pred",
        when(col("margin") > 0, 1L).otherwise(lit(-1L)))
  }

  // ------------------------------------------- external (pretrained) models

  /** Score documents against an EXTERNAL (token → integer weight)
    * relation — the loader side of model-based language ID / quality
    * classification: instead of the in-engine surface-feature
    * perceptron, a user brings real pretrained linear-model weights
    * (a fastText-style bag-of-words classifier reduces to exactly this
    * once its hidden layer is folded: score = Σ_token w(token) + bias).
    *
    *   margin(doc) = bias + Σ_t count_t(doc) · w(t)
    *   pred        = 1 if margin > 0 else -1   (perceptronPredict's rule)
    *
    * over whitespace tokens of lower(trim(text)). Weights must already
    * be INTEGERS (micro-units — [[loadTokenWeights]] quantizes float
    * files); the margin is then an exact long, bit-identical across
    * engines and partitionings — the q146/q152 lattice discipline.
    *
    * Scale shape: token explode (map-side), broadcast hash join against
    * the weight relation (a vocabulary is broadcast-sized by contract —
    * fastText vocabularies are ≤ a few million rows ≈ tens of MB), then
    * one map-side-combined per-doc long sum. Docs with null/blank text
    * or no in-vocabulary tokens score exactly `bias`. No shuffle grows
    * with the corpus except the per-doc aggregation.
    */
  def tokenLinearScore(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, tokenCol: String, weightCol: String,
      bias: Long = 0L): DataFrame = {
    val w = broadcast(weights.select(col(tokenCol).as("__tok"),
      col(weightCol).cast("long").as("__w")))
    val contrib = docs
      .select(col(idCol), explode(TextFns.tokens(lower(col(textCol))))
        .as("__tok"))
      .join(w, Seq("__tok"))
      .groupBy(col(idCol))
      .agg(sum(col("__w")).as("__s"))
    docs.select(col(idCol))
      .join(contrib, Seq(idCol), "left")
      .select(col(idCol),
        (lit(bias) + coalesce(col("__s"), lit(0L))).as("margin"))
      .withColumn("pred", when(col("margin") > 0, 1L).otherwise(lit(-1L)))
  }

  /** MULTICLASS external-model scoring — the full fastText-style
    * language-ID shape ([[tokenLinearScore]] is the binary special
    * case): a (token, class, integer weight) relation plus a (class,
    * integer bias) relation; per document,
    *
    *   margin(doc, c) = bias_c + Σ_t count_t(doc) · w(t, c)
    *   prediction     = argmax_c margin  (ties → smallest class name)
    *
    * The class list comes from the BIAS relation (authoritative — a
    * class with no token weights still scores its bias; a weight row
    * whose class has no bias is ignored). Output: one row per
    * (doc, class) with the exact long margin and an `is_pred` flag on
    * the argmax row. All-integer, so predictions are bit-reproducible
    * across engines and partitionings — real LID labels from real
    * exported weights without a model runtime.
    *
    * Scale shape: one token explode, one broadcast join against the
    * (vocab × classes) weight relation, one map-side-combined
    * (doc, class) sum, one docs × |classes| base cross (classes are a
    * handful by contract) — nothing corpus-sized shuffles twice.
    */
  def tokenMulticlassScore(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, tokenCol: String, clsCol: String,
      weightCol: String, biases: DataFrame, biasClsCol: String,
      biasCol: String): DataFrame = {
    val cls = broadcast(biases.select(col(biasClsCol).as("cls"),
      col(biasCol).cast("long").as("__bias")).distinct())
    val w = broadcast(weights.select(col(tokenCol).as("__tok"),
      col(clsCol).as("cls"), col(weightCol).cast("long").as("__w")))
    val contrib = docs
      .select(col(idCol), explode(TextFns.tokens(lower(col(textCol))))
        .as("__tok"))
      .join(w, Seq("__tok"))
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("__w")).as("__s"))
    val margins = docs.select(col(idCol)).crossJoin(cls)
      .join(contrib, Seq(idCol, "cls"), "left")
      .select(col(idCol), col("cls"),
        (col("__bias") + coalesce(col("__s"), lit(0L))).as("margin"))
    // argmax as ONE doc-keyed window over margins (round-20): the round-19
    // groupBy+self-join made margins two-consumer, and neither duplicate
    // execution (round-18) nor an eager checkpoint (round-19 — it
    // SERIALIZED the two branches that used to overlap and cost q187/q191
    // ~2×) beats a single pass. (row_number over (margin DESC, cls ASC))
    // = 1 flags exactly the min_by(cls, struct(-margin, cls)) row —
    // (id, cls) rows are unique by construction.
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("margin").desc, col("cls").asc)
    margins
      .withColumn("is_pred",
        when(row_number().over(byDoc) === 1, lit(1L)).otherwise(lit(0L)))
      .select(col(idCol), col("cls"), col("margin"), col("is_pred"))
  }

  /** Hashed character-n-gram feature buckets — the fastText SUBWORD
    * feature extractor (Bojanowski et al., "Enriching Word Vectors with
    * Subword Information", TACL 2017; the language-ID models of Joulin
    * et al. 2016 score hashed n-grams, not whole tokens): every token
    * is wrapped in boundary markers (`<tok>`), every character n-gram
    * with n in [nMin, nMax] is extracted (by CODEPOINT, so the two
    * oracle engines agree beyond the BMP), and each n-gram hashes to a
    * bucket in [0, nBuckets):
    *
    *   h(g) = fold(cp ← codepoints(g)) h·31 + cp;  bucket = h mod nBuckets
    *
    * No intermediate modulus: nMax ≤ 6 is `require`d so the fold stays
    * under 31⁶·0x10FFFF < 2⁶³ — the hash is closed-form replayable in
    * SQL (nested `ord(substr(...))` arithmetic), unlike a seeded
    * Murmur. One bucket PER OCCURRENCE (fastText counts multiplicity).
    * Scala UDF over a codegen'd token split — the house rule for hash
    * kernels (nested Catalyst HOFs re-evaluate subtrees per element).
    */
  def charNgramBucketsUdf(nMin: Int, nMax: Int,
      nBuckets: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(nMin >= 1 && nMax >= nMin && nMax <= 6,
      s"n-gram range [$nMin,$nMax] must sit in [1,6] (hash overflow bound)")
    require(nBuckets >= 1, s"nBuckets $nBuckets must be >= 1")
    udf { (toks: Seq[String]) =>
      if (toks == null) null
      else toks.flatMap { t =>
        val cps = ("<" + t + ">").codePoints.toArray
        (nMin to nMax).flatMap { n =>
          (0 to cps.length - n).map { i =>
            var h = 0L
            var j = 0
            while (j < n) { h = h * 31 + cps(i + j); j += 1 }
            h % nBuckets
          }
        }
      }
    }
  }

  /** MULTICLASS scoring over HASHED CHAR-N-GRAM features — the faithful
    * fastText-LID feature path ([[tokenMulticlassScore]] is the
    * token-unigram simplification; real exported LID models key their
    * weights by feature-hash buckets, which [[charNgramBucketsUdf]]
    * reproduces): weights is a (bucket, class, integer weight)
    * relation ([[loadHashedClassWeights]] reads the exported file
    * form), biases a (class, integer bias) relation, and
    *
    *   margin(doc, c) = bias_c + Σ_{g ∈ ngrams(doc)} w(bucket(g), c)
    *   prediction     = argmax_c margin  (ties → smallest class name)
    *
    * Same exact-long lattice, same output shape (doc, class, margin,
    * is_pred), same scale shape as [[tokenMulticlassScore]]: one
    * n-gram explode, one broadcast join against the (buckets × classes)
    * weight relation, one map-side-combined (doc, class) sum, one
    * docs × |classes| cross — nothing corpus-sized shuffles twice. The
    * n-gram explode is ~(nMax−nMin+1)·|chars| rows/doc of 16-byte
    * (id, long) pairs, map-side only: it collapses into the per-doc
    * partial aggregate before any exchange.
    */
  def ngramMulticlassScore(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, bucketCol: String, clsCol: String,
      weightCol: String, biases: DataFrame, biasClsCol: String,
      biasCol: String, nMin: Int = 2, nMax: Int = 3,
      nBuckets: Int = 1 << 20): DataFrame = {
    val cls = broadcast(biases.select(col(biasClsCol).as("cls"),
      col(biasCol).cast("long").as("__bias")).distinct())
    val w = broadcast(weights.select(col(bucketCol).cast("long").as("__b"),
      col(clsCol).as("cls"), col(weightCol).cast("long").as("__w")))
    val contrib = docs
      .select(col(idCol),
        explode(charNgramBucketsUdf(nMin, nMax, nBuckets)(
          TextFns.tokens(lower(col(textCol))))).as("__b"))
      .join(w, Seq("__b"))
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("__w")).as("__s"))
    val margins = docs.select(col(idCol)).crossJoin(cls)
      .join(contrib, Seq(idCol, "cls"), "left")
      .select(col(idCol), col("cls"),
        (col("__bias") + coalesce(col("__s"), lit(0L))).as("margin"))
    // argmax as ONE doc-keyed window (see tokenMulticlassScore): single
    // pass over the n-gram explode subtree, no checkpoint, no self-join
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("margin").desc, col("cls").asc)
    margins
      .withColumn("is_pred",
        when(row_number().over(byDoc) === 1, lit(1L)).otherwise(lit(0L)))
      .select(col(idCol), col("cls"), col("margin"), col("is_pred"))
  }

  /** Load a foreign-format HASHED multiclass weight file into a
    * (bucket, class, weight) relation — the artifact bridge for
    * [[ngramMulticlassScore]] (the exported form of a fastText-LID
    * linear layer keyed by feature hash). Format: plain text, one
    * `bucket class value` triple per line (whitespace-separated);
    * lines that are not exactly three fields, `#` comments, lines
    * whose bucket does not parse as an integer or whose value does not
    * parse as a number are ignored. Values quantize to integer
    * micro-units like [[loadTokenWeights]]; duplicate (bucket, class)
    * rows keep the maximum quantized weight (deterministic regardless
    * of file order). Distributed `spark.read.text`, same as
    * [[loadTokenWeights]].
    */
  def loadHashedClassWeights(spark: org.apache.spark.sql.SparkSession,
      path: String, scale: Long = 1000000L): DataFrame = {
    require(scale >= 1, s"scale $scale must be >= 1")
    spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("__f"))
      .filter(size(col("__f")) === 3 &&
        !col("__f").getItem(0).startsWith("#") &&
        expr("try_cast(__f[0] AS BIGINT)").isNotNull &&
        expr("try_cast(__f[2] AS DOUBLE)").isNotNull)
      .select(expr("try_cast(__f[0] AS BIGINT)").as("bucket"),
        col("__f").getItem(1).as("cls"),
        expr(s"CAST(round(try_cast(__f[2] AS DOUBLE) * $scale, 0) AS BIGINT)")
          .as("weight"))
      .groupBy(col("bucket"), col("cls"))
      .agg(max(col("weight")).as("weight"))
  }

  /** Load a foreign-format linear-model weight file into a (token,
    * weight) relation — the artifact bridge for [[tokenLinearScore]].
    * Format: plain text, one `token value` pair per line (whitespace-
    * separated, the fastText `.vec`-family convention for 1-d output);
    * lines that are not exactly two fields — blank lines, a
    * single-field count header, `#` comments — are ignored, as are
    * lines whose value does not parse as a number, and the fastText
    * two-field `N dim` count header (recognized as BOTH fields being
    * bare unsigned integers — a real entry whose token is all digits
    * AND whose weight is written without sign or decimal point is
    * indistinguishable from a header and is dropped too; real exports
    * write signed/fractional weights, so this is the honest tiebreak
    * for a distributed reader that has no "line 1"). Float values are
    * quantized to exact integer micro-units (`round(value · scale)`,
    * half away from zero) so downstream margins stay on the integer
    * lattice; duplicate tokens keep their maximum quantized weight
    * (deterministic regardless of file order).
    *
    * Distributed: `spark.read.text` — a multi-million-line vocabulary
    * file splits across the cluster like any other text source.
    */
  def loadTokenWeights(spark: org.apache.spark.sql.SparkSession,
      path: String, scale: Long = 1000000L): DataFrame = {
    require(scale >= 1, s"scale $scale must be >= 1")
    spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("__f"))
      .filter(size(col("__f")) === 2 &&
        !col("__f").getItem(0).startsWith("#") &&
        // the fastText 'N dim' header: two bare unsigned integers
        !(col("__f").getItem(0).rlike("^[0-9]+$") &&
          col("__f").getItem(1).rlike("^[0-9]+$")) &&
        // try_cast, not cast: ANSI mode is on and a malformed value
        // must mean "not an entry", not a failed job
        expr("try_cast(__f[1] AS DOUBLE)").isNotNull)
      .select(col("__f").getItem(0).as("token"),
        // round half away from zero on the double value, exact for the
        // integral-microunit files real exports produce
        expr(s"CAST(round(try_cast(__f[1] AS DOUBLE) * $scale, 0) AS BIGINT)")
          .as("weight"))
      .groupBy(col("token"))
      .agg(max(col("weight")).as("weight"))
  }
}
