package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the native [[graft.expr.OphSigExpr]] vs the `udf` OPH kernel
  * (`spark.graft.oph.nativeExpr=false` restores the UDF form): the
  * signature scan is the dominant cost of every OPH dedup pipeline, so
  * the swap is measured two ways —
  *
  *  1. raw signature scan: `Dedup.ophSignatures` → noop sink over 1M
  *     synthetic 60-token docs (pure kernel + explode, no joins);
  *  2. the full q176 `dedupCorpusOph` pipeline at the bench sf.
  *
  * Interleaved passes, medians → OPH_EXPR_AB_r13.json.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.OphExprAb"
  */
object OphExprAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    // regenerated per scan (releaseScratch would evict a checkpoint);
    // generation cost is identical in both arms
    val synth = spark.range(1000000L).select(col("id").as("doc_id"),
      expr("array_join(transform(sequence(0, 59), " +
        "i -> concat('w', pmod(id * 37 + i * 13, 4096))), ' ')").as("text"))
    val q176 = SparkEntry.queries("q176_dedup_oph")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def sigScan(): Unit =
      Dedup.ophSignatures(synth, "doc_id", "text")
        .write.mode("overwrite").format("noop").save()
    def pipeline(): Unit = {
      q176(spark, sfDir).write.mode("overwrite").format("noop").save()
      try SparkEntry.releaseScratch(spark) catch { case _: Throwable => }
    }

    // minhash / simhash arms compare the column forms directly (the
    // native path is unconditional in production; the udf kernels are
    // retained for this measurement and the equality specs)
    import graft.functions.TextFns
    val toks = TextFns.tokens(lower(col("text")))
    def mhNative(): Unit = synth.select(col("doc_id"),
        TextFns.minhashSig(3, 16)(toks).as("sig"))
      .write.mode("overwrite").format("noop").save()
    def mhUdf(): Unit = synth.select(col("doc_id"),
        TextFns.minhashSigUdf(3, 16)(toks).as("sig"))
      .write.mode("overwrite").format("noop").save()
    def shNative(): Unit = synth.select(col("doc_id"),
        TextFns.simhash64(col("text")).as("sh"))
      .write.mode("overwrite").format("noop").save()
    def shUdf(): Unit = synth.select(col("doc_id"),
        TextFns.simhash64Udf(toks).as("sh"))
      .write.mode("overwrite").format("noop").save()

    sigScan(); pipeline(); mhNative(); shNative() // warm
    val acc = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    val passes = sys.env.getOrElse("OPH_AB_PASSES", "5").toInt
    for (_ <- 1 to passes; arm <- Seq("native", "udf")) {
      spark.conf.set("spark.graft.oph.nativeExpr",
        (arm == "native").toString)
      acc((arm, "scan")) ::= time(sigScan())
      acc((arm, "q176")) ::= time(pipeline())
      acc((arm, "mh")) ::= time(if (arm == "native") mhNative() else mhUdf())
      acc((arm, "sh")) ::= time(if (arm == "native") shNative() else shUdf())
    }
    spark.conf.unset("spark.graft.oph.nativeExpr")
    def med(xs: List[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    println(f"""{"probe":"oph_expr_ab","passes":$passes,""" +
      f""""scan1m_native":${med(acc(("native", "scan")))}%.3f,""" +
      f""""scan1m_udf":${med(acc(("udf", "scan")))}%.3f,""" +
      f""""q176_native":${med(acc(("native", "q176")))}%.3f,""" +
      f""""q176_udf":${med(acc(("udf", "q176")))}%.3f,""" +
      f""""minhash1m_native":${med(acc(("native", "mh")))}%.3f,""" +
      f""""minhash1m_udf":${med(acc(("udf", "mh")))}%.3f,""" +
      f""""simhash1m_native":${med(acc(("native", "sh")))}%.3f,""" +
      f""""simhash1m_udf":${med(acc(("udf", "sh")))}%.3f}""")
    spark.stop()
  }
}
