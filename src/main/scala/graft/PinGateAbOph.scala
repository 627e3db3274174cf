package graft

import org.apache.spark.sql.SparkSession

/** Round-13 A/B for the UDF-UPSTREAM pin exemption: round 12's byte gate
  * (`Dedup.pinIfLarge`) skipped the repartition at the OPH/Hamming pair
  * joins because the keyed relation is byte-small — but there the
  * exchange is also the reuse point for the expensive non-codegen
  * signature pipeline, so skipping it made the pipeline evaluate on both
  * join sides at raw-scan parallelism (q166 2.16→5.33 s, q168
  * 2.04→4.91 s vs the r11 pinned plan; judge-verified in
  * `PLANS_r12.txt:17099`). Round 13 exempts those call sites from the
  * byte gate (`udfUpstream = true`).
  *
  * This probe times the three affected queries with the exemption ON
  * (round-13 default: always pin at OPH/Hamming sites) vs OFF
  * (`spark.graft.pairJoin.udfUpstreamExempt=false`, the round-12
  * byte-gated behavior), interleaved passes, median seconds.
  * Results → PIN_GATE_AB_r13.json.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.PinGateAbOph"
  */
object PinGateAbOph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Seq("q166_oph_signatures", "q168_containment",
      "q182_dup_source_matrix")
    val qs = names.map(n => n -> SparkEntry.queries(n)).toMap

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      try SparkEntry.releaseScratch(spark) catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach(time) // warm pass (JIT + parquet footer cache)
    val passes = sys.env.getOrElse("PIN_AB_PASSES", "5").toInt
    val acc = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to passes; arm <- Seq("exempt", "gated")) {
      spark.conf.set("spark.graft.pairJoin.udfUpstreamExempt",
        (arm == "exempt").toString)
      names.foreach(n => acc((arm, n)) ::= time(n))
    }
    spark.conf.unset("spark.graft.pairJoin.udfUpstreamExempt")
    def med(xs: List[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val fields = for (n <- names; arm <- Seq("exempt", "gated")) yield
      f""""${n.takeWhile(_ != '_')}_$arm":${med(acc((arm, n)))}%.3f"""
    println(s"""{"probe":"pin_gate_ab_oph","sf":"$sfDir","passes":$passes,""" +
      fields.mkString(",") + "}")
    spark.stop()
  }
}
