package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distributed sketches — the two canonical bounded-memory
  * profiles a 100 TB pipeline runs before anything else: HyperLogLog
  * (distinct cardinality) and count-min (per-key frequency). Both join
  * the existing sketch family (histogram quantiles `Ops`, Misra-Gries
  * heavy hitters `HeavyHitters`) and share its design rule: the sketch
  * state is a TINY keyed relation produced by one map-side-combined
  * aggregation over the corpus — the only thing that ever shuffles is
  * the partially-merged register table (≤ m rows for HLL, ≤ depth·width
  * for CMS), never the data.
  *
  * Determinism contract: every hash is the engine-wide SQL-reproducible
  * polynomial hash ([[TextFns.polyHash]]) re-scrambled by the affine
  * family ([[TextFns.minhashPerm]], salts 100/101 for HLL, 200+i for
  * CMS rows), so a DuckDB oracle recomputes the REGISTER TABLES exactly
  * (integer arithmetic end-to-end; q139/q141). The HLL estimate's
  * 2^-rho sum is dyadic-rational and exact in IEEE double for any
  * summation order, so even the float estimate reproduces bit-for-bit
  * across engines (q140).
  *
  * Honest bias note: rho is framed against 31-bit hash values drawn
  * from [0, 1e9+7), not a power-of-two range, so P(rho = 1) is ~0.46
  * instead of 0.5 — a small systematic undercount on top of HLL's
  * published ~1.04/sqrt(m) relative error. The spec measures accuracy
  * empirically instead of assuming the ideal-geometric analysis.
  */
object Sketches {

  /** Quadratic scramble mod p: (x² + x) mod p. The affine permutation
    * family alone preserves the arithmetic lattice of structured key
    * sets (sequential ids left 24/256 HLL buckets EMPTY at 5000 keys —
    * a 4× cardinality undercount); one squaring round breaks the
    * lattice while staying SQL-expressible (x < p ≈ 2^30 keeps x² < 2^60
    * inside BIGINT in both engines).
    */
  private def mix(x: Long): Long = (x * x % TextFns.HashP + x) % TextFns.HashP

  /** HLL register relation: (bucket, rho_max) with absent buckets
    * meaning rho 0. bucket = mix(perm_100(poly(key))) mod 2^p; rho = 31 −
    * bitlength(mix(perm_101(poly(key)))) (31 for the zero hash). One
    * map-side (bucket, rho) projection + one partial-aggregated max —
    * the sketch is mergeable by construction (max is associative), so
    * register tables from independent partitions/corpora union + re-max.
    */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 8): DataFrame =
    hllRegistersBy(df, Seq.empty, keyCol, p)

  /** Per-group HLL registers — the scale replacement for
    * `COUNT(DISTINCT key) GROUP BY g`: instead of shuffling every
    * (group, key) pair, each task partial-maxes its local registers and
    * ≤ m rows per group cross the wire. (groupCols..., bucket, rho_max).
    */
  def hllRegistersBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"hllRegisters p $p must be in [4, 16]")
    val m = 1 << p
    val h = udf { (s: String) =>
      val base = TextFns.polyHash(s)
      val bucket = (mix(TextFns.minhashPerm(100, base)) % m).toInt
      val wv = mix(TextFns.minhashPerm(101, base))
      val rho =
        if (wv == 0L) 31
        else 31 - (64 - java.lang.Long.numberOfLeadingZeros(wv))
      (bucket, rho)
    }
    val g = groupCols.map(col)
    df.filter(col(keyCol).isNotNull)
      .select(g :+ h(col(keyCol).cast("string")).as("__h"): _*)
      .select(g ++ Seq(col("__h._1").as("bucket"), col("__h._2").as("rho")): _*)
      .groupBy(g :+ col("bucket"): _*).agg(max(col("rho")).as("rho_max"))
  }

  /** Cardinality estimate off an [[hllRegisters]] relation: the
    * classic alpha_m · m² / Σ 2^−M_j with the linear-counting fallback
    * (m · ln(m/V)) when the raw estimate is ≤ 2.5·m and zero registers
    * remain. 2^−rho is computed as 1.0 / (1 << rho) — an exact dyadic
    * double, so the Σ (and hence the raw estimate and the branch
    * decision) is bit-identical in any engine and any summation order.
    * Returns one row (v_zero, estimate) with estimate rounded to 6 dp.
    */
  def hllEstimate(registers: DataFrame, p: Int = 8): DataFrame =
    hllEstimateBy(registers, Seq.empty, p)

  /** Per-group cardinality estimates off an [[hllRegistersBy]] relation:
    * one row per group, same formula and determinism contract as
    * [[hllEstimate]]. The input is already register-compact, so this is
    * an aggregation over ≤ m rows per group.
    */
  def hllEstimateBy(registers: DataFrame, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"hllEstimate p $p must be in [4, 16]")
    val m = 1 << p
    val alphaM2 = (if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709 else if (m == 32) 0.697 else 0.673) * m * m
    val g = groupCols.map(col)
    val agged =
      if (groupCols.isEmpty)
        registers.agg(count(lit(1)).as("__present"),
          sum(expr("1.0D / shiftleft(1L, rho_max)")).as("__s"))
      else registers.groupBy(g: _*)
        .agg(count(lit(1)).as("__present"),
          sum(expr("1.0D / shiftleft(1L, rho_max)")).as("__s"))
    agged
      .select(g ++ Seq((lit(m.toLong) - col("__present")).as("v_zero"),
        (lit(alphaM2) /
          (col("__s") + (lit(m) - col("__present")).cast("double")))
          .as("__raw")): _*)
      .select(g ++ Seq(col("v_zero"),
        round(when(col("__raw") <= 2.5 * m && col("v_zero") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")))
          .otherwise(col("__raw")), 6).as("estimate")): _*)
  }

  /** Merge HLL register relations (shards, days, sources) into one
    * sketch: union + register max. Associative and commutative — merge
    * order never matters, and re-merging an already-merged shard is a
    * no-op (max is idempotent).
    *
    * Per-GROUP register relations ([[hllRegistersBy]] output) must pass
    * their group columns via `groupCols`, which become merge keys — a
    * bare merge would silently collapse every group into one sketch, so
    * the schema is validated to be EXACTLY groupCols + (bucket, rho_max)
    * and anything else fails loudly.
    */
  def hllMerge(regs: Seq[DataFrame], groupCols: Seq[String] = Nil)
      : DataFrame = {
    require(regs.nonEmpty, "hllMerge: no register relations")
    val expect = (groupCols ++ Seq("bucket", "rho_max")).toSet
    regs.foreach { r =>
      require(r.columns.toSet == expect,
        s"hllMerge: register relation has columns ${r.columns.toSeq} — " +
          s"expected exactly ${expect.toSeq.sorted} (per-group registers " +
          "must pass their group columns via groupCols or the groups " +
          "would silently merge into one sketch)")
    }
    regs.reduce(_ unionByName _)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho_max")).as("rho_max"))
  }

  /** Merge count-min register relations by cell-wise SUM. Associative
    * and commutative but NOT idempotent — each shard must appear
    * exactly once (see the streaming wrapper's replay guard). Per-group
    * relations pass their group columns like [[hllMerge]]; the schema
    * is validated the same way.
    */
  def cmsMerge(regs: Seq[DataFrame], groupCols: Seq[String] = Nil)
      : DataFrame = {
    require(regs.nonEmpty, "cmsMerge: no register relations")
    val expect = (groupCols ++ Seq("row", "col", "cnt")).toSet
    regs.foreach { r =>
      require(r.columns.toSet == expect,
        s"cmsMerge: register relation has columns ${r.columns.toSeq} — " +
          s"expected exactly ${expect.toSeq.sorted} (per-group registers " +
          "must pass their group columns via groupCols or the groups " +
          "would silently merge into one sketch)")
    }
    regs.reduce(_ unionByName _)
      .groupBy((groupCols ++ Seq("row", "col")).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Set-overlap estimate from two HLL register relations via
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A max-merge B).
    * This is the sketch-world answer to "how much do two corpora /
    * partitions / days overlap" without ever joining them — the union
    * sketch is free (register max), so the whole comparison costs three
    * ≤ m-row aggregations. Combines the three 6-dp-rounded estimates
    * (so the arithmetic is engine-reproducible), clamped at 0; relative
    * error grows as the true intersection shrinks versus the union
    * (inclusion–exclusion differences amplify the ±1.04/√m terms).
    * Returns one row (est_a, est_b, est_union, est_intersect).
    */
  def hllIntersect(regA: DataFrame, regB: DataFrame, p: Int = 8): DataFrame = {
    val ua = hllEstimate(regA, p).select(col("estimate").as("est_a"))
    val ub = hllEstimate(regB, p).select(col("estimate").as("est_b"))
    val uu = hllEstimate(hllMerge(Seq(regA, regB)), p)
      .select(col("estimate").as("est_union"))
    ua.crossJoin(ub).crossJoin(uu)
      .withColumn("est_intersect",
        round(greatest(lit(0.0),
          col("est_a") + col("est_b") - col("est_union")), 6))
  }

  /** Count-min register relation: (row, col, cnt) for `depth` hash rows
    * of `width` columns — cnt = how many key INSTANCES landed in that
    * cell (point queries then take the min over rows, [[cmsEstimate]]:
    * one-sided error, never an undercount). Same scale shape as the HLL:
    * one map-side posexplode to `depth` cells per instance, one
    * partial-aggregated count; ≤ depth·width rows ever shuffle. Row i
    * hashes with affine salt 200+i, so the table is SQL-reproducible.
    */
  def cmsRegisters(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, s"cms depth $depth not in [1, 16]")
    require(width >= 16 && width <= (1 << 20),
      s"cms width $width not in [16, 2^20]")
    val h = udf { (s: String) =>
      val base = TextFns.polyHash(s)
      Array.tabulate(depth)(i =>
        (mix(TextFns.minhashPerm(200 + i, base)) % width).toInt)
    }
    df.filter(col(keyCol).isNotNull)
      .select(posexplode(h(col(keyCol).cast("string"))).as(Seq("row", "col")))
      .groupBy(col("row"), col("col")).agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `keys` off a [[cmsRegisters]]
    * relation: est(key) = min over rows of the key's cell count (absent
    * cells are 0). `keys` is a driver-side probe list by contract (the
    * register relation is tiny; the keys side is broadcast).
    */
  def cmsEstimate(registers: DataFrame, keys: Seq[String], depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(keys.nonEmpty && keys.length <= 65536,
      s"cmsEstimate probes ${keys.length} not in [1, 65536] — the probe " +
        "list is driver-built and broadcast by contract")
    val spark = registers.sparkSession
    import spark.implicits._
    val probe = keys.distinct.flatMap { s =>
      val base = TextFns.polyHash(s)
      (0 until depth).map(i =>
        (s, i, (mix(TextFns.minhashPerm(200 + i, base)) % width).toInt))
    }.toDF("key", "row", "col")
    broadcast(probe).join(registers, Seq("row", "col"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ------------------------------------------------------------- bloom

  /** Bloom filter register relation: (bit) — the DISTINCT set bit
    * positions of an `mBits`-bit filter with `kHashes` hash functions
    * (affine salts 300+i over the engine-wide polynomial hash, so the
    * relation is SQL-reproducible like the HLL/CMS registers). The
    * third member of the membership-sketch family: HLL answers "how
    * many distinct", CMS "how often", Bloom "have we seen THIS one" —
    * the crawl-frontier / historical-id-set primitive that replaces an
    * anti-join against 100 TB of history with a broadcast against
    * ≤ mBits rows.
    *
    * Scale shape: one map-side explode to kHashes bits per key + one
    * partial-aggregated distinct — at most min(n·k, mBits) rows ever
    * shuffle, and the OUTPUT is ≤ mBits rows no matter the corpus.
    * Mergeable by union+distinct (bitwise OR): associative, commutative
    * AND idempotent, so shard redelivery is harmless by algebra (the
    * HLL property, not the CMS one).
    */
  def bloomRegisters(df: DataFrame, keyCol: String, mBits: Int = 65536,
      kHashes: Int = 4): DataFrame = {
    require(mBits >= 64 && mBits <= (1 << 27),
      s"bloom mBits $mBits not in [64, 2^27]")
    require(kHashes >= 1 && kHashes <= 16,
      s"bloom kHashes $kHashes not in [1, 16]")
    val h = udf { (s: String) =>
      val base = TextFns.polyHash(s)
      Array.tabulate(kHashes)(i =>
        (mix(TextFns.minhashPerm(300 + i, base)) % mBits).toInt)
    }
    df.filter(col(keyCol).isNotNull)
      .select(explode(h(col(keyCol).cast("string"))).as("bit"))
      .distinct()
  }

  /** Merge Bloom register relations (shards, days, sources) by bitwise
    * OR = union + distinct. Idempotent, so re-merging an already-merged
    * shard is a no-op. Schema-guarded like [[hllMerge]] so a mis-shaped
    * relation fails loudly instead of merging wrong.
    */
  def bloomMerge(regs: Seq[DataFrame]): DataFrame = {
    require(regs.nonEmpty, "bloomMerge: no register relations")
    regs.foreach { r =>
      require(r.columns.toSeq == Seq("bit"),
        s"bloomMerge: register relation has columns ${r.columns.toSeq} — " +
          "expected exactly (bit)")
    }
    regs.reduce(_ unionByName _).distinct()
  }

  /** Membership test for a key RELATION against a Bloom register
    * relation: might_contain = every one of the key's kHashes bits is
    * set. No false negatives; false-positive odds ≈ (setBits/mBits)^k
    * ([[bloomFpEstimate]]). The register side is broadcast (≤ mBits
    * rows), the keys side streams — one map-side explode + broadcast
    * semi-join + count-match per key, so probing 100 TB of candidates
    * against the filter is a single scan of the candidates.
    */
  def bloomMightContain(keys: DataFrame, keyCol: String,
      registers: DataFrame, mBits: Int = 65536,
      kHashes: Int = 4): DataFrame = {
    val h = udf { (s: String) =>
      val base = TextFns.polyHash(s)
      Array.tabulate(kHashes)(i =>
        (mix(TextFns.minhashPerm(300 + i, base)) % mBits).toInt)
    }
    keys.filter(col(keyCol).isNotNull)
      .select(col(keyCol), explode(h(col(keyCol).cast("string"))).as("bit"))
      .join(broadcast(registers.withColumn("__set", lit(1))),
        Seq("bit"), "left")
      .groupBy(col(keyCol))
      .agg((sum(coalesce(col("__set"), lit(0))) === kHashes)
        .as("might_contain"))
  }

  /** False-positive odds of a Bloom register relation from its ACTUAL
    * fill: (setBits/mBits)^k, 6-dp rounded — deterministic from the
    * relation, no n assumption. One row (set_bits, fp_est).
    */
  def bloomFpEstimate(registers: DataFrame, mBits: Int = 65536,
      kHashes: Int = 4): DataFrame =
    registers.agg(count(lit(1)).as("set_bits"))
      .select(col("set_bits"),
        round(pow(col("set_bits").cast("double") / mBits.toDouble, kHashes),
          6).as("fp_est"))

  // --------------------------------------------- log-histogram quantiles

  /** LOG-HISTOGRAM registers for positive long values — the
    * unbounded-range quantile sketch of the family (DDSketch's idea on
    * an INTEGER lattice): where [[graft.operators.Ops.histogramQuantiles]]
    * needs a known [lo, hi] and q147's exact cut needs a full
    * per-group pass, this folds ANY positive long distribution (doc
    * lengths, file sizes, token counts at 100 TB) into ≤ 64·8 + 1
    * cells with a guaranteed ≤ 2⁻³ = 12.5 % relative cell width.
    *
    * Cell index, all integer-exact (no float log anywhere):
    *   octave  b   = floor(log₂ v) = length(bin(v)) − 1
    *   subcell sub = (v ≫ (b−3)) − 8   (v ≪ (3−b) − 8 for b < 3)
    * so cell (b, sub) holds exactly [lb, lb + 2^(b−3)) with
    * lb = (8+sub) ≪ (b−3) — and for b < 3 every integer is its own
    * cell (exact small-value quantiles). Values ≤ 0 and nulls land in
    * the reserved underflow cell (b = −1, sub = 0).
    *
    * Registers (b, sub, cnt) merge by cell-wise sum ([[logHistMerge]],
    * the cmsMerge contract: each shard exactly once) and build with one
    * map-side-combined aggregation — the same one-pass/mergeable/
    * streamable shape as the other sketches here.
    */
  def logHistRegisters(df: DataFrame, valueCol: String): DataFrame =
    logHistRegistersBy(df, Nil, valueCol)

  /** Per-group log-histogram registers — one independent sketch per
    * group key (the [[hllRegistersBy]] companion): (groupCols..., b,
    * sub, cnt), ≤ 513 cells per group, one map-side-combined pass.
    * Per-source length/size distributions at corpus scale.
    */
  def logHistRegistersBy(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.select((groupCols.map(col) :+
        col(valueCol).cast("long").as("__v")): _*)
      .select((groupCols.map(col) ++ Seq(
        expr("CASE WHEN __v IS NULL OR __v <= 0 THEN CAST(-1 AS BIGINT) " +
          "ELSE CAST(length(bin(__v)) - 1 AS BIGINT) END").as("b"),
        expr("CASE WHEN __v IS NULL OR __v <= 0 THEN CAST(0 AS BIGINT) " +
          "WHEN length(bin(__v)) - 1 >= 3 " +
          "THEN shiftright(__v, length(bin(__v)) - 4) - CAST(8 AS BIGINT) " +
          "ELSE shiftleft(__v, 4 - length(bin(__v))) - CAST(8 AS BIGINT) " +
          "END").as("sub"))): _*)
      .groupBy((groupCols :+ "b" :+ "sub").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge log-histogram register relations by cell-wise sum (NOT
    * idempotent — each shard exactly once, the [[cmsMerge]] contract).
    * Per-group relations pass their group columns like [[hllMerge]].
    */
  def logHistMerge(regs: Seq[DataFrame],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(regs.nonEmpty, "logHistMerge: no register relations")
    val expect = (groupCols ++ Seq("b", "sub", "cnt")).toSet
    regs.foreach { r =>
      require(r.columns.toSet == expect,
        s"logHistMerge: register relation has columns ${r.columns.toSeq} — " +
          s"expected exactly ${expect.toSeq.sorted}")
    }
    regs.reduce(_ unionByName _)
      .groupBy((groupCols :+ "b" :+ "sub").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile estimates off a log-histogram register relation: each q
    * resolves to a whole percent (q_pct = round(q·100)) and reports the
    * LOWER BOUND of the cell holding rank ⌈q_pct·n/100⌉ (integer ceil)
    * in (b, sub) order — an exact integer, deterministic across
    * engines and partitionings, within 12.5 % of the true quantile by
    * the cell-width guarantee (underflow-cell ranks report 0). The
    * register relation is ≤ 513 cells by construction, so the walk is a
    * BOUNDED driver collect (the house contract for sketch readouts);
    * output one row per q: (q_pct, rank, n, value_lb).
    */
  def logHistQuantiles(registers: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    val spark = registers.sparkSession
    import spark.implicits._
    // bounded collect: limit BEFORE collecting so a corpus-sized
    // relation passed by mistake refuses loudly instead of OOMing the
    // driver (the logHistQuantilesBy pattern)
    val cells = registers.select(col("b").cast("long"),
        col("sub").cast("long"), col("cnt").cast("long"))
      .limit(514)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (b, sub, _) => (b, sub) }
    require(cells.length <= 513,
      s"logHistQuantiles: ${cells.length} cells — not a logHistRegisters relation")
    val n = cells.map(_._3).sum
    def lb(b: Long, sub: Long): Long =
      if (b < 0) 0L
      else if (b >= 3) (8L + sub) << (b - 3)
      else (8L + sub) >> (3 - b)
    val rows = qs.map { q =>
      // integer ceil of q_pct·n/100 — q is resolved to whole percent so
      // the rank is integer arithmetic end to end (a float ceil(q·n)
      // can land one off the oracle's when q·n sits on a ulp boundary)
      val qp = math.round(q * 100)
      val rank = math.max(1L, (qp * n + 99L) / 100L)
      var cum = 0L
      var out = 0L
      var i = 0
      var found = false
      while (i < cells.length && !found) {
        cum += cells(i)._3
        if (cum >= rank) { out = lb(cells(i)._1, cells(i)._2); found = true }
        i += 1
      }
      (qp, rank, n, out)
    }
    rows.toDF("q_pct", "rank", "n", "value_lb")
  }

  /** Per-group quantile readout off a [[logHistRegistersBy]] relation
    * with ONE group column: same integer-ceil-rank / cell-lower-bound
    * semantics as [[logHistQuantiles]], walked independently per group.
    * Bounded driver collect enforced at `maxGroups` × 513 cells —
    * refuse loudly rather than OOM on an unbounded group domain.
    * Output one row per (group, q): (group, q_pct, rank, n, value_lb).
    */
  def logHistQuantilesBy(registers: DataFrame, groupCol: String,
      qs: Seq[Double], maxGroups: Int = 4096): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    val spark = registers.sparkSession
    import spark.implicits._
    val limit = maxGroups.toLong * 513L
    val cells = registers.select(col(groupCol).cast("string"),
        col("b").cast("long"), col("sub").cast("long"),
        col("cnt").cast("long"))
      .limit((limit + 1).toInt)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    require(cells.length <= limit,
      s"logHistQuantilesBy: register relation exceeds maxGroups=$maxGroups" +
        " × 513 cells — raise maxGroups or pre-filter the groups")
    def lb(b: Long, sub: Long): Long =
      if (b < 0) 0L
      else if (b >= 3) (8L + sub) << (b - 3)
      else (8L + sub) >> (3 - b)
    val rows = cells.groupBy(_._1).toSeq.flatMap { case (g, cs) =>
      val sorted = cs.sortBy(c => (c._2, c._3))
      val n = sorted.map(_._4).sum
      qs.map { q =>
        val qp = math.round(q * 100)
        val rank = math.max(1L, (qp * n + 99L) / 100L)
        var cum = 0L
        var out = 0L
        var i = 0
        var found = false
        while (i < sorted.length && !found) {
          cum += sorted(i)._4
          if (cum >= rank) { out = lb(sorted(i)._2, sorted(i)._3); found = true }
          i += 1
        }
        (g, qp, rank, n, out)
      }
    }
    rows.toDF(groupCol, "q_pct", "rank", "n", "value_lb")
  }
}
