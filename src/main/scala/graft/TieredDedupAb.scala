package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the COMPOSED tiered dedup (`Dedup.dedupCorpusTiered`, round
  * 12) vs the single-detector OPH pipeline (`Dedup.dedupCorpusOph`) on a
  * MIXED-duplication corpus — the judge's round-11 ask: does running the
  * measured detector ladder cheapest-first, each tier over the previous
  * tier's survivors, beat one detector doing all the work?
  *
  * Corpus: `nBase` unique 120-token docs; a fraction get an EXACT
  * (whitespace/case) copy, a fraction a NEAR-IDENTICAL re-serve (2
  * scattered token edits — the simhash Hamming-ball regime), and a
  * fraction a LOOSE paraphrase (8-token prefix + 4 scattered edits — the
  * OPH/Jaccard regime). Ground truth: copy i of base b pairs with b.
  *
  * Reported per arm: duplicates caught (docs removed that ARE planted
  * copies), misses, false removals, wall seconds — plus the tiered
  * ledger's per-tier counts, which is the point: the expensive
  * shingle-explosion tier should see only the survivors the cheap tiers
  * could not catch. Results → TIERED_DEDUP_AB_r12.json.
  *
  * Usage: sbt "runMain graft.TieredDedupAb"
  */
object TieredDedupAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val nBase = sys.env.getOrElse("TIERED_AB_N", "3000").toInt
    val docLen = 120
    // base doc b (ids 0..nBase-1): tokens b{(b*37+j*j*13+j)%4096}
    val body = s"transform(sequence(0, ${docLen - 1}), " +
      s"j -> concat('b', pmod(id * 4099 + j * j * 13 + j, 1000003)))"
    val base = spark.range(nBase).select(col("id").as("doc_id"),
      expr(s"array_join($body, ' ')").as("text"))
    // copies (ids base+nBase): id%3==0 exact ws/case copy; ==1 two
    // scattered edits (near-identical); ==2 loose: 8-token prefix + 4
    // scattered edits
    val editedBody = (edits: Seq[Int]) =>
      s"transform(sequence(0, ${docLen - 1}), j -> CASE WHEN j IN " +
        edits.mkString("(", ",", ")") +
        s" THEN concat('e', id, 'x', j) ELSE " +
        s"concat('b', pmod(id * 4099 + j * j * 13 + j, 1000003)) END)"
    // crawl-like mix: half the copies are exact re-fetches, 40% are
    // near-identical re-serves (2 scattered edits), 10% loose paraphrases
    val copies = spark.range(nBase).select(
      (col("id") + nBase).as("doc_id"),
      when(col("id") % 10 < 5,
        concat(lit("  "), upper(expr(s"array_join($body, ' ')")), lit(" ")))
      .when(col("id") % 10 < 9,
        expr(s"array_join(${editedBody(Seq(41, 83))}, ' ')"))
      .otherwise(
        expr("array_join(concat(transform(sequence(1, 8), " +
          s"j -> concat('p', id, '_', j)), ${editedBody(Seq(17, 47, 71, 103))}), ' ')"))
      .as("text"))
    val docs = base.unionByName(copies).localCheckpoint()

    def evalSurvivors(removedIds: Set[Long]): (Long, Long, Long) = {
      // planted duplicates are exactly ids >= nBase
      val caught = removedIds.count(_ >= nBase).toLong
      val missed = nBase - caught
      val falseRm = removedIds.count(_ < nBase).toLong
      (caught, missed, falseRm)
    }
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // warm both paths once on a small slice (JIT)
    Dedup.dedupCorpusTiered(docs.limit(200), "doc_id", "text").count()
    Dedup.dedupCorpusOph(docs.limit(200), "doc_id", "text").count()

    val (ledger, tTier) = time {
      Dedup.dedupCorpusTiered(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val tierCounts = ledger.values.groupBy(identity).view
      .mapValues(_.size).toMap
    val (tCaught, tMissed, tFalse) =
      evalSurvivors(ledger.filter(_._2 != "kept").keySet)

    val (ophKept, tOph) = time {
      Dedup.dedupCorpusOph(docs, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val allIds = (0L until 2L * nBase).toSet
    val (oCaught, oMissed, oFalse) = evalSurvivors(allIds -- ophKept)

    // scan-mass economics (the 100 TB-dominant term): how many docs
    // reach the shingle-explosion tier under each arm. Both arms run the
    // exact tier first, so oph-only's shingle input = total - exact;
    // tiered subtracts the simhash catches too.
    val total = 2L * nBase
    val exactRm = tierCounts.getOrElse("exact", 0).toLong
    val simhashRm = tierCounts.getOrElse("simhash", 0).toLong
    println(s"""{"probe":"tiered_dedup_ab","n_base":$nBase,""" +
      s""""tiered":{"sec":${f"$tTier%.2f"},"caught":$tCaught,""" +
      s""""missed":$tMissed,"false_removed":$tFalse,""" +
      s""""by_tier":{"exact":$exactRm,""" +
      s""""simhash":$simhashRm,""" +
      s""""oph":${tierCounts.getOrElse("oph", 0)},""" +
      s""""kept":${tierCounts.getOrElse("kept", 0)}},""" +
      s""""shingle_tier_input_docs":${total - exactRm - simhashRm}},""" +
      s""""oph_only":{"sec":${f"$tOph%.2f"},"caught":$oCaught,""" +
      s""""missed":$oMissed,"false_removed":$oFalse,""" +
      s""""shingle_tier_input_docs":${total - exactRm}}}""")
    spark.stop()
  }
}
