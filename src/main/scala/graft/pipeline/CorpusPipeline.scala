package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Curation, Dedup}

/** End-to-end training-corpus curation — the composed chain a data team
  * runs before tokenization, with every stage individually oracle-gated
  * elsewhere in this engine:
  *
  *  1. exact + transitive near-dup dedup, keeping the HIGHEST-QUALITY
  *     copy of each cluster ([[Dedup.dedupCorpusTransitiveBy]], q102)
  *  2. benchmark n-gram decontamination ([[Curation.decontaminated]],
  *     q69)
  *  3. quality gate: token-count bounds + the composite quality score
  *     ([[TextFns.qualityScore]], q22 family)
  *  4. optional DSIR selection toward a target corpus
  *     ([[Curation.dsirResample]], q138)
  *  5. deterministic hash split — leakage-safe AT THE DEDUP THRESHOLD:
  *     stage 1 removed every pair with Jaccard ≥ threshold, so no
  *     val-side document has a ≥ threshold near-dup in train; the split
  *     itself is the engine-wide Knuth hash ([[Curation.sampleBucket]]),
  *     exactly re-runnable (for EMBEDDING-space leakage safety use
  *     [[graft.operators.Similarity.leakageSafeSplit]] instead)
  *
  * Returns (curated, stats): curated keeps the input columns plus
  * `quality`, `n_tokens`, `split`; stats is one (stage, rows_in,
  * rows_out) row per stage. Stage counts are ACTIONS — five small jobs,
  * intended for pipeline-scale runs, not per-query latency paths. Each
  * stage boundary MATERIALIZES its output before counting it, so every
  * stage (dedup above all) executes exactly ONCE — the previous lazy
  * pass-through re-ran the whole upstream chain per boundary, i.e.
  * dedup 4× (measured, round 19).
  *
  * STORAGE / FAILURE-MODE CONTRACT (round 20; see SCALE.md): stage
  * outputs persist at `DISK_ONLY` and each stage's blocks are RELEASED
  * as soon as the next stage's count lands, so at most one corpus-sized
  * stage (plus the final survivor set the caller consumes) is pinned at
  * a time — the round-19 eager `localCheckpoint` kept up to 5 corpus
  * copies (text column included) in non-replicated executor storage
  * with no recompute path: one lost executor failed the query. persist
  * keeps lineage, so an executor loss recomputes the lost blocks
  * instead of failing. For pipeline-scale runs where even lineage
  * recomputation is too expensive, set a RELIABLE checkpoint directory
  * (`spark.sparkContext.setCheckpointDir(...)`) — stage boundaries then
  * `checkpoint()` to fault-tolerant storage instead (the conf-gated
  * escape hatch; costs one extra computation of each stage, the
  * standard reliable-checkpoint trade).
  */
object CorpusPipeline {

  def curate(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, decontamN: Int = 8,
      minTokens: Int = 3, maxTokens: Int = 100000,
      minQuality: Double = 0.2, nearDupThreshold: Double = 0.8,
      valFrac: Double = 0.1, target: Option[DataFrame] = None,
      selectK: Int = 0, dsirAlpha: Double = 1.0,
      dsirBuckets: Int = 1024, shingleN: Int = 3, minhashK: Int = 16,
      bands: Int = 8): (DataFrame, DataFrame) = {
    require(valFrac >= 0.0 && valFrac < 1.0,
      s"valFrac $valFrac out of [0, 1)")
    val spark = docs.sparkSession
    import spark.implicits._
    val stats = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val scored = docs.filter(col(textCol).isNotNull)
      .withColumn("quality", TextFns.qualityScore(col(textCol)))
    // Each stage boundary MATERIALIZES its output and counts the
    // materialized relation — round-19 measured fix: the old count-only
    // boundaries made every stage's count (and the final consumption of
    // `curated`) RE-EXECUTE the whole upstream chain — dedup, by far the
    // most expensive stage, ran once per remaining boundary (4× here).
    // Round-20 (scale contract, see scaladoc + SCALE.md): DISK_ONLY
    // persist with previous-stage release instead of eager
    // localCheckpoint — lineage-recoverable on executor loss, at most
    // one corpus-sized stage pinned; a configured reliable checkpoint
    // dir upgrades boundaries to fault-tolerant checkpoints. Results are
    // unchanged (same rows, same stats).
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    var prevPinned: Option[DataFrame] = None
    var prev = scored.count()
    def staged(name: String, out: DataFrame): DataFrame = {
      val mat =
        if (reliable) out.checkpoint()
        else out.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val c = mat.count()
      // the previous stage's blocks fed this stage's materialization and
      // nothing downstream reads them again — release them now
      prevPinned.foreach { p => p.unpersist(false); () }
      prevPinned = if (reliable) None else Some(mat)
      stats += ((name, prev, c))
      prev = c
      mat
    }
    // 1. dedup, keep the best-quality copy per near-dup cluster
    val deduped = staged("dedup",
      Dedup.dedupCorpusTransitiveBy(scored, idCol, textCol, "quality",
        threshold = nearDupThreshold, shingleN = shingleN, k = minhashK,
        bands = bands))
    // 2. benchmark decontamination
    val clean = staged("decontaminate",
      Curation.decontaminated(deduped, idCol, textCol, bench,
        benchTextCol, decontamN))
    // 3. quality gate
    val quality = staged("quality_gate",
      clean.withColumn("n_tokens", TextFns.tokenCount(col(textCol)))
        .filter(col("n_tokens").between(minTokens, maxTokens) &&
          col("quality") >= minQuality))
    // 4. optional DSIR selection toward a target corpus
    val selected = target match {
      case Some(t) if selectK > 0 =>
        staged("dsir_select",
          quality.join(
            Curation.dsirResample(quality, t, idCol, textCol, selectK,
                dsirBuckets, dsirAlpha)
              .select(col(idCol)), Seq(idCol)))
      case _ => quality
    }
    // 5. deterministic hash split (leakage-safe at the dedup threshold)
    val cut = (valFrac * (1L << 31)).toLong
    val split = selected.withColumn("split",
      when(Curation.sampleBucket(col(idCol)) < cut, "val")
        .otherwise("train"))
    (split, stats.toSeq.toDF("stage", "rows_in", "rows_out"))
  }
}
