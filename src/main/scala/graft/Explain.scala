package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of the named queries
  * (default: a pushdown-sensitive, a broadcast-join, and a window query) so
  * scan pruning (`PushedFilters`/`ReadSchema`), broadcast choices, and
  * whole-stage-codegen spans can be eyeballed each round.
  *
  * Usage: sbt "runMain graft.Explain [queryName ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.sameElements(Array("all"))) SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q03_join_broadcast", "q44_star_join",
        "q08_topk_per_group", "q20_spatial_join", "q69_decontaminate",
        "q77_asof_join", "q27_ann_brute")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
      // index-lifecycle queries build real scratch indexes even under
      // explain — release them like Bench/Verify do
      SparkEntry.releaseScratch(spark)
    }
    spark.stop()
  }
}
