package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scale probe for the persisted IVF-PQ index (SCALE.md): grow the corpus
  * ×1/×10/×100 with the LIST COUNT growing in proportion (fixed expected
  * list size — the FAISS billion-vector discipline), probe with a fixed
  * query and nProbe, and time
  *
  *  - the one-time build (expected ~linear in corpus: one assign+encode
  *    scan),
  *  - the indexed probe (expected ~flat — nProbe fixed-size lists via
  *    partition pruning, m-byte codes per row),
  *  - the one-shot `ivfPqTopK` (expected ~linear — it recomputes donors,
  *    assignment and encode over the whole corpus per query: the cost
  *    shape the persisted index removes).
  *
  * Asserts the probe plan partition-prunes `codes/` on `ivf_list` and
  * that the codes relation stores no raw vectors.
  */
object IvfPqProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-46s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val query = vecs0.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)

    for (mult <- mults) {
      val reps = spark.range(mult).select(col("id").as("rep"))
      // replicas get shifted ids and a small deterministic per-replica
      // perturbation so lists don't collapse onto identical points
      val corpus = vecs0.crossJoin(reps)
        .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"),
          expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
            "(x, i) -> x + CAST(pmod(rep * (i + 1), 13) AS DOUBLE) / 1300.0)")
            .as("embedding"))
        .repartition(32).cache()
      val n = corpus.count()
      val nLists = 16 * mult // fixed expected list size across scales
      println(s"[probe] corpus x$mult = $n vecs, nLists = $nLists, nProbe = 4")
      val idx = java.nio.file.Files.createTempDirectory("graft_pqxp")
        .resolve("idx").toString
      time(s"x$mult IVF-PQ index build") {
        Similarity.writeIvfPqIndex(corpus, "vec_id", "embedding", idx,
          nLists = nLists, m = 8, nCodes = 16)
      }
      // two-level coarse assignment: build cost drops from O(N·nLists)
      // to ~O(N·√nLists) distance evaluations — the gap widens with the
      // list count (×100 = 1600 lists is where exact assign dominates)
      val idxH = java.nio.file.Files.createTempDirectory("graft_pqxh")
        .resolve("idx").toString
      time(s"x$mult build with assignGroups=4 (two-level)") {
        Similarity.writeIvfPqIndex(corpus, "vec_id", "embedding", idxH,
          nLists = nLists, m = 8, nCodes = 16, assignGroups = 4)
      }
      require(Similarity.ivfPqTopKIndexed(spark, idxH, "vec_id", query,
        k = 10, nProbe = 4).collect().length == 10)
      val probe = Similarity.ivfPqTopKIndexed(spark, idx, "vec_id", query,
        k = 10, nProbe = 4)
      val top = time(s"x$mult indexed probe (pruned lists only)") {
        probe.collect()
      }
      require(top.length == 10, s"x$mult: probe returned ${top.length} rows")
      val oneShot = time(s"x$mult one-shot ivfPqTopK (corpus-sized)") {
        Similarity.ivfPqTopK(corpus, "vec_id", "embedding", query, k = 10,
          nLists = nLists, nProbe = 4, m = 8, nCodes = 16).collect()
      }
      require(oneShot.length == 10)
      val plan = probe.queryExecution.executedPlan.toString
      require(plan.contains("PartitionFilters: [ivf_list"),
        s"codes/ scan not partition-pruned:\n$plan")
      require(!spark.read.parquet(s"$idx/codes")
          .schema.fieldNames.contains("embedding"),
        "codes relation must not store raw vectors")
      // rolling append of a FIXED-size batch: cost is one map-side
      // assign+encode pass over the BATCH plus one file-commit per
      // TOUCHED LIST — independent of corpus size (nothing rescans the
      // index), but NOT of the list count: a diverse batch touches
      // ~min(|batch|, nLists) lists, so as lists grow ∝ corpus the
      // per-append commit overhead grows until batch size outpaces list
      // count (the real-ingestion regime: batch ≫ lists). The printed
      // touched-list count is the cost driver to watch.
      val batch = vecs0
        .select((col("vec_id") + lit(1000000000L)).as("vec_id"),
          col("embedding"))
      val nb = batch.count()
      time(s"x$mult rolling append ($nb-vec batch)") {
        Similarity.appendToIvfPqIndex(batch, "vec_id", "embedding", idx)
      }
      val afterAppend = Similarity.ivfPqTopKIndexed(spark, idx, "vec_id",
        query, k = 10, nProbe = 4).collect()
      require(afterAppend.length == 10,
        s"x$mult: post-append probe returned ${afterAppend.length} rows")
      println(s"[probe] x$mult touched lists <= ${math.min(nb, nLists)} " +
        s"of $nLists (append commit cost driver)")
      corpus.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
