package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/cost sweep for the bounded-kNN knobs — turns the hot-list
  * cap's "bounded-recall trade" (knnGraph scaladoc) from prose into
  * recorded numbers.
  *
  * Grid: nProbe ∈ {1, 2, 4, 8} × maxListSize ∈ {binding, default} over
  * the sf embeddings table, k = 10. For each point: build the
  * [[graft.operators.Similarity.knnGraph]], time its materialization,
  * and score mean recall@10 against the exact brute-force graph via
  * [[graft.operators.Similarity.recallAtK]] (the exact graph is computed
  * once — at sweep scale the corpus is small enough that all-pairs is
  * the cheap part; at production scale the exact leg would be a sampled
  * query set, which recallAtK supports unchanged).
  *
  * The "binding" cap is chosen WELL BELOW the average list size so the
  * candidate-side subsample provably engages; coarse-list occupancy
  * (max/avg under the same hash-donor assignment knnGraph uses) is
  * recorded next to it so the artifact shows the cap binding rather than
  * asserting it.
  *
  * Writes RECALL_SWEEP_r9.json and prints one JSON line.
  * Usage: sbt "runMain graft.RecallSweep" (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, GRAFT_SWEEP_REPS, GRAFT_SWEEP_CAP)
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Ops, Similarity}
    import graft.functions.VectorFns
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("GRAFT_SWEEP_REPS").flatMap(_.toIntOption).getOrElse(2)
    val cap = sys.env.get("GRAFT_SWEEP_CAP").flatMap(_.toIntOption).getOrElse(64)
    val k = 10; val nLists = 16
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
    val n = emb.count()

    // coarse-list occupancy under the same deterministic hash-donor
    // centroids knnGraph uses: nearest-donor assignment, counted
    val donors = emb
      .select(col("vec_id").cast("long").as("did"),
        col("embedding").cast("array<double>").as("dv"))
      .orderBy(pmod(pmod(col("did"), lit(2147483648L)) * 2654435761L,
        lit(4294967296L)), col("did"))
      .limit(nLists)
    val assigned = emb
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(donors))
      .select(col("vec_id"), col("did"),
        VectorFns.l2Distance(col("v"), col("dv")).as("d"))
    val occ = Ops.topKPerGroup(assigned, Seq("vec_id"),
        Seq(col("d").asc, col("did").asc), 1)
      .groupBy(col("did")).agg(count(lit(1)).as("sz"))
      .agg(max(col("sz")), avg(col("sz"))).head()
    val (maxOcc, avgOcc) = (occ.getLong(0), occ.getDouble(1))

    // exact graph once: all-pairs cosine, top-10 per vector
    val e1 = emb.select(col("vec_id").cast("long").as("id1"),
      col("embedding").cast("array<double>").as("v1"))
    val e2 = emb.select(col("vec_id").cast("long").as("id2"),
      col("embedding").cast("array<double>").as("v2"))
    val exactTop = Ops.topKPerGroup(
      e1.crossJoin(e2).filter(col("id1") =!= col("id2"))
        .select(col("id1"), col("id2"),
          VectorFns.cosine(col("v1"), col("v2")).as("cos")),
      Seq("id1"), Seq(col("cos").desc, col("id2").asc), k).persist()
    val t0e = System.nanoTime()
    val exactRows = exactTop.count()
    val exactSec = (System.nanoTime() - t0e) / 1e9

    val grid = for (mls <- Seq(cap, 10000); np <- Seq(1, 2, 4, 8))
      yield (np, mls)
    def point(np: Int, mls: Int): (Double, Double, Long) = {
      val t0 = System.nanoTime()
      val g = Similarity.knnGraph(emb, "vec_id", "embedding", k,
        nLists, np, mls).persist()
      val rows = g.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rec = Similarity.recallAtK(g, exactTop, "id1", "id2", k)
        .agg(avg(col("recall"))).head().getDouble(0)
      g.unpersist(blocking = false)
      (rec, sec, rows)
    }
    grid.foreach { case (np, mls) => point(np, mls) } // untimed warm pass
    val results = (0 until reps).flatMap { r =>
      grid.map { case (np, mls) =>
        val (rec, sec, rows) = point(np, mls)
        (np, mls, r, rec, sec, rows)
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val points = grid.map { case (np, mls) =>
      val rs = results.collect { case (`np`, `mls`, _, rec, sec, rows) =>
        (rec, sec, rows) }
      f"""{"nProbe":$np,"maxListSize":$mls,"capBinds":${mls < maxOcc},""" +
        f""""recall10":${rs.head._1}%.4f,"sec":${median(rs.map(_._2))}%.3f,""" +
        f""""edges":${rs.head._3}}"""
    }.mkString("[", ",", "]")
    val out = s"""{"sf":"$sfDir","n":$n,"k":$k,"nLists":$nLists,""" +
      f""""reps":$reps,"occupancy":{"max":$maxOcc,"avg":$avgOcc%.1f},""" +
      f""""exact":{"sec":$exactSec%.3f,"rows":$exactRows},""" +
      s""""points":$points}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("RECALL_SWEEP_r9.json"),
      out.getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
