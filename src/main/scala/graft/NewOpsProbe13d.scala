package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-13 ANN-composition miners (triplet mining,
  * bitext margins) at 10k / 50k / 200k vectors, dim 16. Claim under
  * test: both ride the knnGraph IVF candidate machinery, so with
  * nLists scaled ∝ n (the documented operating rule: keep avg list
  * size ~constant) the candidate space is ~n·nProbe·avgList — LINEAR
  * in corpus size, never all-pairs; the label/side joins and argmax
  * cuts add no new shuffle shape.
  *
  * Usage: sbt "runMain graft.NewOpsProbe13d" → one JSON line per scale.
  */
object NewOpsProbe13d {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(10000, 50000, 200000)) {
      val nLists = math.max(16, n / 500) // avg list ~500, the operating rule
      // deterministic 16-dim vectors on a continuous manifold (id-scaled
      // diagonal + jitter): neighborhoods stay ~constant-size as n and
      // nLists grow together — the geometry real embeddings have, unlike
      // a few collapsed topic points (which would make every list a
      // clone-set and the candidate space quadratic by construction)
      val vecs = spark.range(n.toLong).select(
        col("id").as("vec_id"),
        expr("transform(sequence(0, 15), j -> " +
          "CAST(id * 0.01 + pmod(id * 37 + j * 13, 7) AS DOUBLE))")
          .as("embedding"),
        pmod(expr("id DIV 8"), lit(10)).cast("int").as("label"), // label runs of 8: top-k holds both same- and cross-label neighbors
        pmod(col("id"), lit(2)).cast("int").as("side"))
        .localCheckpoint()
      var triplets = 0L
      val tTrip = time {
        triplets = Similarity.tripletMining(vecs, "vec_id", "embedding",
          "label", k = 8, nLists = nLists, nProbe = 4).count()
      }
      var mined = 0L
      val tBitext = time {
        mined = Similarity.bitextMine(vecs, "vec_id", "embedding",
          "side", k = 4, nLists = nLists, nProbe = 4).count()
      }
      println(f"""{"n":$n,"n_lists":$nLists,"triplets":$triplets,""" +
        f""""mined_pairs":$mined,"triplet_s":$tTrip%.2f,""" +
        f""""bitext_s":$tBitext%.2f}""")
    }
    spark.stop()
  }
}
