package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-snapshot operators — the incremental-ingestion layer between
  * raw WARC scans ([[graft.sources.Warc]]) and the curation pipeline.
  *
  * The 100 TB motivation: a monthly crawl re-fetches mostly-unchanged
  * pages; re-running dedup/quality/decontamination over the full
  * snapshot every time is the single largest avoidable bill in a
  * recurring pipeline. Keying pages by canonical URL and diffing
  * content fingerprints shrinks "this month's work" to the
  * added+changed slice — typically a small fraction — while `removed`
  * feeds index tombstones ([[Dedup]] / [[graft.operators.TextIndex]]
  * `remove`).
  */
object Crawl {

  /** Diff two crawl snapshots keyed by URL (pre-canonicalize with
    * [[graft.functions.TextFns.urlCanonicalize]] — byte-distinct
    * equivalent URLs would otherwise report as a remove+add pair).
    *
    * Returns one row per URL in either snapshot with `status`:
    * `added` (new URL), `removed` (gone), `changed` (fingerprint
    * differs), `unchanged`. Fingerprints are caller-chosen (content
    * hash, simhash…); null fingerprints compare as distinct-from-
    * everything EXCEPT another null (two missing bodies are not a
    * change signal). Duplicate URLs within one snapshot must be
    * resolved upstream (one-row-per-key is the contract; the join
    * would otherwise fan out) — `requireUniqueKeys` guards it loudly
    * on by default, costing one count aggregate per side.
    *
    * Shape: ONE full shuffle join on the URL key and nothing else —
    * both sides partition by the same key, no broadcast of corpus-
    * sized relations, no window. Output carries both fingerprints so
    * downstream can route (e.g. `changed` into re-dedup, `removed`
    * into tombstones) without re-joining the snapshots.
    */
  def crawlDelta(oldSnap: DataFrame, newSnap: DataFrame,
      urlCol: String, fpCol: String,
      requireUniqueKeys: Boolean = true): DataFrame = {
    def prep(df: DataFrame, side: String) = {
      if (requireUniqueKeys) {
        val dup = df.groupBy(col(urlCol)).count()
          .filter(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"$side snapshot has duplicate $urlCol (e.g. ${dup.headOption
            .map(_.get(0)).getOrElse("")}) — resolve to one row per key " +
            "first (keep-best, latest-fetch…)")
      }
      // explicit presence markers: a null FINGERPRINT on a present row
      // must not read as absence (null fp vs null fp is `unchanged`)
      df.select(col(urlCol).as("url"), col(fpCol).as(s"fp_$side"),
        lit(1).as(s"__in_$side"))
    }
    val o = prep(oldSnap, "old")
    val n = prep(newSnap, "new")
    o.join(n, Seq("url"), "full_outer")
      .select(col("url"), col("fp_old"), col("fp_new"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("fp_old") <=> col("fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
