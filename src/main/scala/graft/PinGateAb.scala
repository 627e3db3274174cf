package graft

import org.apache.spark.sql.SparkSession

/** A/B for the SIZE-GATED post-join parallelism pin (round 12): the
  * round-11 bench showed the unconditional `repartition(n, keys)` in the
  * bucketed pair joins costs ~1 s/query at toy scale (q25 0.78→1.54 s,
  * q53 1.63→2.75 s, q90 2.15→3.42 s vs r10d) while being required at
  * scale (AQE coalesces advisory repartitions behind broadcast joins and
  * cannot see post-join fan-out). `Dedup.pinIfLarge` now skips the pin
  * when Catalyst's size estimate for the keyed relation is under
  * `spark.graft.pairJoin.pinThresholdBytes` (default 64 MB).
  *
  * This probe times the three affected gate queries at the bench sf with
  * the gate DISABLED (threshold 0 → always pin, the round-11 behavior)
  * vs ENABLED (default threshold), interleaved passes, median seconds.
  * Results → PIN_GATE_AB_r12.json.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.PinGateAb"
  */
object PinGateAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Seq("q25_minhash_pairs", "q53_dedup_corpus",
      "q90_dedup_incremental")
    val qs = names.map(n => n -> SparkEntry.queries(n)).toMap

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      try SparkEntry.releaseScratch(spark) catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }

    // one warm pass (JIT + parquet footer cache), then interleaved timed
    // passes so neither arm benefits from running last
    names.foreach(time)
    val passes = sys.env.getOrElse("PIN_AB_PASSES", "5").toInt
    val acc = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to passes; arm <- Seq("pinned", "gated")) {
      spark.conf.set("spark.graft.pairJoin.pinThresholdBytes",
        if (arm == "pinned") "0" else (64L << 20).toString)
      names.foreach(n => acc((arm, n)) ::= time(n))
    }
    spark.conf.unset("spark.graft.pairJoin.pinThresholdBytes")
    def med(xs: List[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val fields = for (n <- names; arm <- Seq("pinned", "gated")) yield
      f""""${n.takeWhile(_ != '_')}_$arm":${med(acc((arm, n)))}%.3f"""
    println(s"""{"probe":"pin_gate_ab","sf":"$sfDir","passes":$passes,""" +
      fields.mkString(",") + "}")
    spark.stop()
  }
}
