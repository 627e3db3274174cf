package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — PassJoin-style segment
  * signatures (Li, Deng, Feng, ICDE 2011 "PASS-JOIN: a partition-based
  * method for similarity joins") with exact Levenshtein verification.
  *
  * The all-pairs form is O(n²) and unusable at scale; the pigeonhole
  * scheme here is the published fix: partition every string into τ+1
  * contiguous segments — if ed(r, s) ≤ τ then at least one segment of s
  * occurs VERBATIM inside r, and an optimal alignment shifts it by at
  * most τ positions. So candidates are an equi join between
  *   index side:  (len, segIdx, segment)            — τ+1 rows/string
  *   probe side:  (len, segIdx, substring at ±τ)    — ≤(2τ+1)²(τ+1) rows
  * and every true pair is guaranteed to collide (no false negatives);
  * false positives die in the exact `levenshtein ≤ τ` verification.
  * Both signature counts are constants in τ — independent of string
  * length and corpus size — so the join is an ordinary hash-partitioned
  * equi join that scales like any other keyed shuffle: no all-pairs,
  * no broadcast of the corpus, no per-task quadratic work.
  *
  * Intended for short join keys (titles, names, normalized prefixes) —
  * record-linkage shapes — not whole documents; near-dup detection for
  * long text belongs to MinHash/SimHash/winnowing (`Dedup`,
  * `ContentChunks`).
  */
object EditDistance {

  /** Even partition of a length-`l` string into `tau+1` segments:
    * the first `l mod (tau+1)` segments get the extra char. Returns
    * (start, len) per segment, 0-based.
    */
  private[operators] def segmentsOf(l: Int, tau: Int): Array[(Int, Int)] = {
    val parts = tau + 1
    val base = l / parts
    val extra = l % parts
    val out = new Array[(Int, Int)](parts)
    var start = 0
    var i = 0
    while (i < parts) {
      val len = base + (if (i < extra) 1 else 0)
      out(i) = (start, len)
      start += len
      i += 1
    }
    out
  }

  /** Pairs (id_a, id_b, dist) with id_a < id_b and
    * levenshtein(key_a, key_b) ≤ tau, where key = `keyCol` evaluated per
    * row. Exact (complete + sound) at the default settings: completeness
    * from the pigeonhole segment scheme, soundness from the final
    * Levenshtein filter.
    *
    * Skew valve: keys sharing a long boilerplate prefix/suffix put all
    * their variation in ONE segment, so the other segments' buckets
    * degenerate toward all-pairs (inherent to any fixed segmentation).
    * `maxPairsPerBucket` drops a (length, segment, substring) bucket
    * whose index×probe candidate product exceeds the cap — trading
    * completeness ONLY on those degenerate buckets for a hard bound on
    * join fan-out, the same contract as the LSH generators' maxBucket.
    * The default keeps the join exact.
    *
    * Empty keys pair only with keys of length ≤ tau (dist = length);
    * null keys are dropped.
    *
    * Id contract: `idCol` must be NUMERIC (castable to long) — the pair
    * ordering (id_a < id_b) uses the long value. A row whose id casts
    * to null (null id, or a non-numeric string id) is dropped here
    * explicitly, same as a null key.
    */
  def edSelfJoin(df: DataFrame, idCol: String, keyCol: Column,
      tau: Int, maxPairsPerBucket: Long = Long.MaxValue): DataFrame = {
    require(tau >= 1 && tau <= 4, s"tau $tau out of supported range 1..4")
    require(maxPairsPerBucket >= 1, "maxPairsPerBucket must be >= 1")

    val keyed = df.select(col(idCol).cast("long").as("__id"),
        keyCol.cast("string").as("__key"))
      .filter(col("__key").isNotNull && col("__id").isNotNull)
    edPairs(keyed, keyed, tau, maxPairsPerBucket, selfJoin = true)
  }

  /** Edit-distance join between TWO relations — the R⋈S record-linkage
    * form of the same PassJoin scheme ([[edSelfJoin]] is the self
    * case): pairs (left_id, right_id, dist) with
    * levenshtein(left key, right key) ≤ tau. Segment (index)
    * signatures come from the LEFT side, shifted-substring (probe)
    * signatures from the RIGHT — match a batch of incoming records
    * against a master entity table without ever crossing the two. Same
    * exactness, id, and skew-valve contracts as the self join; a pair
    * of equal ids across the two relations IS emitted (the relations
    * are distinct id spaces by contract).
    */
  def edJoin(left: DataFrame, leftIdCol: String, leftKeyCol: Column,
      right: DataFrame, rightIdCol: String, rightKeyCol: Column,
      tau: Int, maxPairsPerBucket: Long = Long.MaxValue): DataFrame = {
    require(tau >= 1 && tau <= 4, s"tau $tau out of supported range 1..4")
    require(maxPairsPerBucket >= 1, "maxPairsPerBucket must be >= 1")
    val keyedL = left.select(col(leftIdCol).cast("long").as("__id"),
        leftKeyCol.cast("string").as("__key"))
      .filter(col("__key").isNotNull && col("__id").isNotNull)
    val keyedR = right.select(col(rightIdCol).cast("long").as("__id"),
        rightKeyCol.cast("string").as("__key"))
      .filter(col("__key").isNotNull && col("__id").isNotNull)
    edPairs(keyedL, keyedR, tau, maxPairsPerBucket, selfJoin = false)
      .withColumnRenamed("id_a", "left_id")
      .withColumnRenamed("id_b", "right_id")
  }

  /** Shared candidate generation + verify: index side from `keyedL`,
    * probe side from `keyedR`; self joins order pairs (id_a < id_b),
    * two-relation joins keep (left, right) roles.
    */
  private def edPairs(keyedL: DataFrame, keyedR: DataFrame, tau: Int,
      maxPairsPerBucket: Long, selfJoin: Boolean): DataFrame = {
    val keyed = keyedL // segment/index side

    // index side: the tau+1 segments of each string, keyed by its length
    val segUdf = udf { (s: String) =>
      val l = s.length
      segmentsOf(l, tau).zipWithIndex.map { case ((st, ln), i) =>
        (l, i, s.substring(st, st + ln))
      }.toSeq
    }
    // probe side: for every candidate indexed length l within ±tau and
    // every segment slot of length-l strings, the substrings of this
    // string at start positions shifted by at most tau
    val probeUdf = udf { (s: String) =>
      val r = s.length
      val out = collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
      var l = math.max(0, r - tau)
      while (l <= r + tau) {
        val segs = segmentsOf(l, tau)
        var i = 0
        while (i < segs.length) {
          val (st, ln) = segs(i)
          var p = math.max(0, st - tau)
          val pMax = math.min(r - ln, st + tau)
          while (p <= pMax) {
            out += ((l, i, s.substring(p, p + ln)))
            p += 1
          }
          i += 1
        }
        l += 1
      }
      out.distinct.toSeq
    }

    // Candidate generation is a plain hash equi join on the signature —
    // only (signature, id) rows shuffle (keys do NOT travel through the
    // ~(2τ+1)²(τ+1)-fold expansion) and the join spills gracefully
    // instead of holding per-bucket id sets in aggregation buffers.
    // When capped, degenerate signatures are removed from BOTH sides by
    // a semi join against precomputed bucket counts (longs only,
    // map-side combined) before the pair join runs.
    val idx = keyed.select(col("__id"), explode(segUdf(col("__key")))
      .as("__s"))
      .select(col("__id"), col("__s._1").as("__l"),
        col("__s._2").as("__i"), col("__s._3").as("__seg"))
    val prb = keyedR.select(col("__id"), explode(probeUdf(col("__key")))
      .as("__s"))
      .select(col("__id"), col("__s._1").as("__l"),
        col("__s._2").as("__i"), col("__s._3").as("__seg"))
    val sigKey = Seq("__l", "__i", "__seg")
    val (idxF, prbF) =
      if (maxPairsPerBucket == Long.MaxValue) (idx, prb)
      else {
        val ok = idx.groupBy(sigKey.map(col): _*)
          .agg(count(lit(1)).as("__nx"))
          .join(prb.groupBy(sigKey.map(col): _*)
            .agg(count(lit(1)).as("__np")), sigKey)
          .filter(col("__nx") * col("__np") <= maxPairsPerBucket)
          .select(sigKey.map(col): _*)
        (idx.join(ok, sigKey, "left_semi"), prb.join(ok, sigKey, "left_semi"))
      }
    val joined = prbF.alias("p")
      .join(idxF.alias("x"),
        col("p.__l") === col("x.__l") && col("p.__i") === col("x.__i") &&
          col("p.__seg") === col("x.__seg") &&
          (if (selfJoin) col("p.__id") =!= col("x.__id") else lit(true)))
    val cand =
      if (selfJoin)
        joined.select(least(col("p.__id"), col("x.__id")).as("id_a"),
          greatest(col("p.__id"), col("x.__id")).as("id_b"))
          .distinct()
      else
        joined.select(col("x.__id").as("id_a"), col("p.__id").as("id_b"))
          .distinct()
    cand
      .join(keyedL.select(col("__id").as("id_a"), col("__key").as("__ka")),
        "id_a")
      .join(keyedR.select(col("__id").as("id_b"), col("__key").as("__kb")),
        "id_b")
      .select(col("id_a"),
        col("id_b"),
        levenshtein(col("__ka"), col("__kb")).cast("long").as("dist"))
      .filter(col("dist") <= tau)
  }
}
