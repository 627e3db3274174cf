package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Shift-resistant chunk/fingerprint primitives for corpus dedup:
  *
  *   - Content-defined chunking (CDC): cut each document into chunks at
  *     positions where a local rolling hash satisfies a divisor condition
  *     (Muthitacharoen, Chen & Mazières 2001, LBFS; the basic form of
  *     FastCDC, Xia et al. 2016). Because boundaries depend only on LOCAL
  *     content, inserting a paragraph early in a document shifts no later
  *     chunk identity — exact-hash chunk dedup then catches shared tails
  *     that whole-doc hashing misses.
  *   - Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
  *     MOSS algorithm): from every window of `w` consecutive k-gram
  *     hashes select the rightmost minimum; the selected (pos, hash) set
  *     is a provably bounded-density fingerprint of the document,
  *     position-robust, and any shared substring of length ≥ w + k − 1
  *     guarantees a shared fingerprint.
  *
  * Both kernels are single JVM passes over the codegen'd token split (the
  * established minhash pattern: nested Catalyst `transform`s re-evaluate
  * subtrees per element, measured ~50× slower). Hashes are the engine-wide
  * polynomial hash ([[TextFns.polyHash]]) so a DuckDB oracle recomputes
  * every boundary and every fingerprint exactly — no engine-private
  * hashing in the contract.
  *
  * Scale shape: one narrow map per document (no shuffle) producing the
  * chunk/fingerprint relation; dedup over it is one map-side-combined
  * aggregation on the hash key. Output size is bounded: CDC emits
  * ~len/divisor chunks, winnowing ~2·len/w fingerprints per doc.
  */
object ContentChunks {

  /** One CDC chunk: token span [start, end) and its content hash. */
  private def cdcKernel(n: Int, divisor: Int) =
    udf { (toks: Seq[String]) =>
      if (toks == null || toks.isEmpty) Seq.empty[(Int, Int, Int, Long)]
      else {
        val len = toks.length
        // boundary BEFORE gram position p (p > 0) when the gram's hash
        // divides; gram at p covers toks[p, p+n)
        val starts = Seq.newBuilder[Int]
        starts += 0
        var p = 1
        while (p + n <= len) {
          val gram = toks.slice(p, p + n).mkString(" ")
          if (TextFns.polyHash(gram) % divisor == 0) starts += p
          p += 1
        }
        val ss = starts.result()
        ss.zipWithIndex.map { case (s, i) =>
          val e = if (i + 1 < ss.length) ss(i + 1) else len
          (i, s, e, TextFns.polyHash(toks.slice(s, e).mkString(" ")))
        }
      }
    }

  /** Chunk relation: (doc_id, chunk_idx, start, end, chash). Null/blank
    * docs produce no chunks. Expected chunk length ≈ `divisor` grams
    * (pure divisor rule — the basic published algorithm; FastCDC's
    * min/max clamps are a caller-side post-filter if needed).
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      n: Int, divisor: Int): DataFrame = {
    require(n >= 1, s"gram length $n must be >= 1")
    require(divisor >= 2, s"divisor $divisor must be >= 2")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(cdcKernel(n, divisor)(
          TextFns.tokens(lower(col(textCol))))).as("c"))
      .select(col("doc_id"), col("c._1").as("chunk_idx"),
        col("c._2").as("start"), col("c._3").as("end"),
        col("c._4").as("chash"))
  }

  /** Chunks whose content appears in ≥ `minDocs` distinct documents —
    * the shift-resistant shared-content report. One aggregation on the
    * chunk hash (map-side combined).
    */
  def cdcSharedChunks(chunks: DataFrame, minDocs: Long = 2): DataFrame =
    chunks.groupBy("chash")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)

  /** FastCDC's bounded form (Xia et al. 2016): candidate cut positions
    * are restricted to [s+minLen, s+maxLen] after the previous cut s —
    * the FIRST divisor hit in range cuts; if none, a cut is FORCED at
    * s+maxLen (unless the document ends first). Bounds change which
    * boundaries exist, so this is a real variant of [[cdcChunks]], not a
    * post-filter: minLen suppresses pathological runs of tiny chunks on
    * hit-dense content, maxLen caps chunk size for downstream batching.
    * The terminal chunk may be shorter than minLen (the tail remainder,
    * as in the paper). Sequential per document, O(len) total.
    */
  private def cdcBoundedKernel(n: Int, divisor: Int, minLen: Int,
      maxLen: Int) =
    udf { (toks: Seq[String]) =>
      if (toks == null || toks.isEmpty) Seq.empty[(Int, Int, Int, Long)]
      else {
        val len = toks.length
        val lastGram = len - n
        val out = Seq.newBuilder[(Int, Int, Int, Long)]
        var s = 0
        var idx = 0
        while (s < len) {
          var e = -1
          var p = s + minLen
          val hi = math.min(s + maxLen, lastGram)
          while (e < 0 && p <= hi) {
            if (TextFns.polyHash(toks.slice(p, p + n).mkString(" "))
                % divisor == 0) e = p
            p += 1
          }
          if (e < 0) e = if (s + maxLen < len) s + maxLen else len
          out += ((idx, s, e,
            TextFns.polyHash(toks.slice(s, e).mkString(" "))))
          idx += 1
          s = e
        }
        out.result()
      }
    }

  /** Bounded-chunk relation, schema of [[cdcChunks]]. */
  def cdcChunksBounded(docs: DataFrame, idCol: String, textCol: String,
      n: Int, divisor: Int, minLen: Int, maxLen: Int): DataFrame = {
    require(n >= 1, s"gram length $n must be >= 1")
    require(divisor >= 2, s"divisor $divisor must be >= 2")
    require(minLen >= 1 && maxLen > minLen,
      s"need 1 <= minLen < maxLen, got [$minLen, $maxLen]")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(cdcBoundedKernel(n, divisor, minLen, maxLen)(
          TextFns.tokens(lower(col(textCol))))).as("c"))
      .select(col("doc_id"), col("c._1").as("chunk_idx"),
        col("c._2").as("start"), col("c._3").as("end"),
        col("c._4").as("chash"))
  }

  /** Winnowing: rightmost-minimum selection over every window of `w`
    * consecutive k-gram hashes, selections deduplicated — the paper's
    * robust winnowing. Returns (doc_id, pos, fhash). Documents with
    * fewer than `k` tokens fingerprint their whole token stream as one
    * gram; blank docs produce nothing.
    */
  private def winnowKernel(k: Int, w: Int) =
    udf { (toks: Seq[String]) =>
      if (toks == null || toks.isEmpty) Seq.empty[(Int, Long)]
      else {
        val hs: Array[Long] =
          if (toks.length < k) Array(TextFns.polyHash(toks.mkString(" ")))
          else Array.tabulate(toks.length - k + 1)(p =>
            TextFns.polyHash(toks.slice(p, p + k).mkString(" ")))
        val m = hs.length
        val out = collection.mutable.LinkedHashSet.empty[(Int, Long)]
        if (m <= w) {
          // single (short) window: rightmost min of all hashes
          var best = 0
          var i = 1
          while (i < m) { if (hs(i) <= hs(best)) best = i; i += 1 }
          out += ((best, hs(best)))
        } else {
          // O(m) monotonic deque (ascending hashes front→back); popping
          // with >= on insert makes the LATEST of equal hashes survive,
          // so the front is exactly the rightmost minimum of the window
          val dq = new Array[Int](m)
          var head = 0
          var tail = 0 // exclusive
          var i = 0
          while (i < m) {
            while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
            dq(tail) = i; tail += 1
            val s = i - w + 1 // window [s, i] complete once s >= 0
            if (s >= 0) {
              while (dq(head) < s) head += 1
              out += ((dq(head), hs(dq(head))))
            }
            i += 1
          }
        }
        out.toSeq
      }
    }

  /** Fingerprint relation: (doc_id, pos, fhash). */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1, s"gram length $k must be >= 1")
    require(w >= 2, s"window $w must be >= 2")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(winnowKernel(k, w)(
          TextFns.tokens(lower(col(textCol))))).as("f"))
      .select(col("doc_id"), col("f._1").as("pos"), col("f._2").as("fhash"))
  }

  /** MOSS-style match report: fingerprint hashes shared by ≥ `minDocs`
    * documents. Any common substring of length ≥ w + k − 1 tokens lands
    * here by the winnowing guarantee.
    */
  def winnowShared(fps: DataFrame, minDocs: Long = 2): DataFrame =
    fps.groupBy("fhash")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)

  /** CROSS-DOC duplicated-run coverage from winnowed fingerprints — the
    * sampled tier of substring dedup (Lee et al. 2021's exact form is
    * `Curation.repeatedSpans`, which shuffles EVERY positioned n-gram;
    * this one shuffles only the ~2/(w+1) winnow-selected positions, at
    * the price of under-counting: a shared run is guaranteed detected
    * once it spans ≥ w + k − 1 tokens, and its measured coverage is the
    * islands-merge of the k-token windows around the selected
    * fingerprints — a lower bound on the true run length).
    *
    * Per doc: (doc_id, n_tokens, n_spans, dup_tokens, keep) where spans
    * merge overlapping [pos, pos+k) windows of fingerprints shared by
    * ≥ `minDocs` DISTINCT documents (within-doc repetition alone does
    * not mark), and keep = 1 iff dup_tokens/n_tokens ≤ maxNum/maxDen,
    * compared by integer cross-multiplication (exact, no division).
    * Null/blank docs pass through with zero counts and keep = 1.
    */
  def winnowDupCoverage(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minDocs: Long = 2, maxNum: Long = 1L,
      maxDen: Long = 5L): DataFrame = {
    require(minDocs >= 2, s"minDocs $minDocs must be >= 2")
    require(maxDen > 0 && maxNum >= 0, "threshold must be a ratio >= 0")
    val toks = docs.select(col(idCol).as("doc_id"),
      coalesce(size(TextFns.tokens(lower(col(textCol)))), lit(0))
        .cast("long").as("n_tokens"))
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
    val shared = fps.groupBy("fhash")
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= minDocs).select(col("fhash"))
    val marked = fps.join(shared, Seq("fhash"), "left_semi")
      .join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        least(col("pos") + k, col("n_tokens")).cast("long").as("__end"))
    val perDoc = Curation.islandsToSpans(marked)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("dup_tokens"))
    toks.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("keep",
        when(lit(maxDen) * col("dup_tokens") <= lit(maxNum) * col("n_tokens"),
          lit(1L)).otherwise(lit(0L)))
  }

  /** The APPLY step of cross-document substring dedup — where
    * [[winnowDupCoverage]] MEASURES how much of each doc is covered by
    * windows shared with other docs, this REWRITES the corpus: every
    * token inside a shared-fingerprint span (same winnowing + k-window +
    * island-merge machinery, so q165's coverage numbers describe exactly
    * what gets cut) is removed, and the survivors re-join in original
    * order. This is the "delete the duplicated substring, keep the rest
    * of the document" policy of Lee et al.'s deduplication work — the
    * alternative to dropping whole near-dup documents when only a
    * boilerplate block is shared.
    *
    * This is the SAMPLED tier: winnowing keeps ~1/(w+1) of windows, so
    * the cut spans are the k-windows around SELECTED shared
    * fingerprints, not every shared token — 1/(w+1) of the shuffle of
    * the exact tier, the q165 trade. For exact every-occurrence span
    * removal use [[graft.operators.Curation.repeatedSpans]] +
    * `clipRepeatedSpans` (corpus-wide n-gram marking, q110/q111).
    *
    * Output: (doc_id, clean_text, n_tokens, dup_tokens) — null text
    * stays null, blank text stays empty, a fully-covered doc yields ''.
    *
    * Scale shape: fingerprints + spans are the coverage operator's
    * (sampled 1/(w+1) of positions, grouped per doc); the removal
    * itself is one (doc_id)-keyed join of token rows against the
    * per-doc span list with a range predicate — doc-partitioned, no
    * all-pairs, and the rebuild is one per-doc aggregation of
    * (pos, token) structs.
    */
  def winnowDupRemove(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minDocs: Long = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs $minDocs must be >= 2")
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    // reconstruction keeps the ORIGINAL-case tokens (whitespace
    // tokenization gives identical positions with or without lower();
    // the fingerprints lowercase internally) — only inter-token
    // whitespace is normalized to single spaces in clean_text
    val toks = base.select(col("doc_id"), col("__text"),
      posexplode(TextFns.tokens(col("__text"))))
      .toDF("doc_id", "__text", "pos", "tok")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val nTok = base.select(col("doc_id"),
      coalesce(size(TextFns.tokens(lower(col("__text")))), lit(0))
        .cast("long").as("n_tokens"))
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
    val shared = fps.groupBy("fhash")
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= minDocs).select(col("fhash"))
    val marked = fps.join(shared, Seq("fhash"), "left_semi")
      .join(nTok, Seq("doc_id"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        least(col("pos") + k, col("n_tokens")).cast("long").as("__end"))
    val spans = Curation.islandsToSpans(marked)
    val kept = toks.join(spans,
        toks("doc_id") === spans("doc_id") &&
          toks("pos") >= spans("span_start") &&
          toks("pos") < spans("span_end"),
        "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("tok"))))
        .as("__ordered"))
      .select(col("doc_id"),
        expr("array_join(transform(__ordered, x -> x.tok), ' ')")
          .as("__clean"))
    val dup = spans.groupBy(col("doc_id"))
      .agg(sum(col("span_end") - col("span_start")).as("__dup"))
    base.join(rebuilt, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .join(nTok, Seq("doc_id"))
      .select(col("doc_id"),
        when(col("__text").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("__clean"), lit(""))).as("clean_text"),
        col("n_tokens"),
        coalesce(col("__dup"), lit(0L)).as("dup_tokens"))
  }
}
