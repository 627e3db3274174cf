package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.CorpusPipeline

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // eight genuinely distinct, fluent documents (no shared 3-gram runs,
  // none containing the benchmark 8-gram)
  private val good = Seq(
    (2L, "the hydro reservoir in the alpine valley stores water from " +
      "the spring melt and releases it through turbines when demand " +
      "peaks in the evening hours"),
    (3L, "offshore wind farms along the northern coast deliver most of " +
      "their annual production during winter storms when electricity " +
      "use for heating is also at its highest"),
    (4L, "rooftop photovoltaic installations have grown quickly because " +
      "falling module prices made small systems attractive to " +
      "households without any subsidy at all"),
    (5L, "district heating networks distribute hot water from a central " +
      "plant to thousands of buildings which avoids the cost of " +
      "individual boilers in every basement"),
    (6L, "battery storage projects bid into the balancing market where " +
      "fast response is rewarded better than sheer capacity and " +
      "cycling patterns determine profitability"),
    (7L, "transmission lines between the two price zones are congested " +
      "on windy days so the market splits and producers in the north " +
      "receive lower prices than consumers pay in the south"),
    (8L, "biomass plants burn residues from nearby sawmills and their " +
      "output follows the forestry season rather than the weather " +
      "which makes them useful as a complement"),
    (9L, "geothermal wells provide steady baseload heat throughout the " +
      "year although drilling risk keeps investors cautious about " +
      "projects in unexplored sedimentary basins"))

  test("curate: each planted defect falls at its stage, survivors split " +
      "deterministically, stats ledger matches") {
    val exactDup = Seq((100L, good.head._2)) // byte-identical to doc 2
    val nearDup = Seq((101L, good(1)._2      // near-dup of doc 3
      .replace("annual production", "yearly production")))
    val contaminated = Seq((102L,
      "filler words first and then the exact benchmark passage which " +
        "asks how much storage the grid needs by twenty forty exactly"))
    val junk = Seq((103L, "@@ ## !! %% ^^ && ** (( ))"), // punct soup
      (104L, "tiny"))                                    // too short
    val docs = (good ++ exactDup ++ nearDup ++ contaminated ++ junk)
      .toDF("doc_id", "text")
    val bench = Seq((1L,
      "the benchmark passage which asks how much storage the grid " +
        "needs by twenty forty")).toDF("doc_id", "text")
    val (curated, stats) = CorpusPipeline.curate(docs, "doc_id", "text",
      bench, "text", decontamN = 8, minTokens = 5, minQuality = 0.3,
      nearDupThreshold = 0.5, valFrac = 0.2)
    val out = curated.select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!out.contains(102L), "contaminated doc must fall at stage 2")
    assert(!out.contains(103L) && !out.contains(104L),
      "junk must fall at the quality gate")
    // each dup cluster keeps exactly ONE member (the best-quality copy)
    assert(out.contains(2L) ^ out.contains(100L),
      s"exact-dup cluster must keep one: ${out.keys.toSeq.sorted}")
    assert(out.contains(3L) ^ out.contains(101L),
      s"near-dup cluster must keep one: ${out.keys.toSeq.sorted}")
    assert((4L to 9L).forall(out.contains),
      s"distinct good docs must survive: ${out.keys.toSeq.sorted}")
    // the stats ledger chains: rows_in of stage n = rows_out of n-1
    val ledger = stats.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(ledger.map(_._1).toSeq ==
      Seq("dedup", "decontaminate", "quality_gate"))
    ledger.sliding(2).foreach { case Array((_, _, out1), (_, in2, _)) =>
      assert(out1 == in2, s"ledger must chain: ${ledger.toSeq}")
    }
    assert(ledger.head._2 == 13 && ledger.last._3 == out.size,
      s"ledger ends at the survivor count: ${ledger.toSeq}")
    // split is the engine-wide Knuth hash: deterministic on re-run
    val (again, _) = CorpusPipeline.curate(docs, "doc_id", "text",
      bench, "text", decontamN = 8, minTokens = 5, minQuality = 0.3,
      nearDupThreshold = 0.5, valFrac = 0.2)
    val out2 = again.select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == out2, "curation must be exactly re-runnable")
    assert(out.values.toSet.subsetOf(Set("train", "val")))
  }

  test("curate with a DSIR target: sharp smoothing selects the " +
      "target-like survivors") {
    // solar-topic docs vs transport-topic docs, genuinely distinct per
    // doc (unique trailing tokens) so dedup keeps them all
    val solar = (0 until 10).map(i => (i.toLong,
      s"solar energy yield model run number$i gave panel capacity " +
        s"output for district$i across the simulation"))
    val other = (20 until 30).map(i => (i.toLong,
      s"transport fleet schedule case$i uses vehicle routing windows " +
        s"for depot$i across the planning horizon"))
    val docs = (solar ++ other).toDF("doc_id", "text")
    val target = Seq((900L,
      "solar panel energy capacity yield model output simulation"))
      .toDF("doc_id", "text")
    val bench = Seq((1L, "zz yy xx ww vv uu tt ss")).toDF("doc_id", "text")
    val (curated, stats) = CorpusPipeline.curate(docs, "doc_id", "text",
      bench, "text", minTokens = 3, minQuality = 0.0,
      nearDupThreshold = 0.9, target = Some(target), selectK = 8,
      dsirAlpha = 0.01)
    val kept = curated.select(col("doc_id")).collect().map(_.getLong(0))
    assert(kept.length == 8, s"selectK must bound the output: ${kept.toSeq}")
    assert(kept.count(_ < 20L) >= 7,
      s"DSIR at alpha=0.01 must prefer target-like docs: ${kept.toSeq.sorted}")
    assert(stats.collect().map(_.getString(0)).contains("dsir_select"))
  }
}
