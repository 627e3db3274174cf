package graft
import org.apache.spark.sql.SparkSession

/** A/B attribution harness for the round-7 dedup-family bench regression.
  *
  * Round 7 changed ONE dedup hot path — `Dedup.appendToSignatureIndex`
  * switched eager `localCheckpoint(true)` to lazy `persist()` (to stop
  * unreleasable block leaks across streaming micro-batches) — and the same
  * round's bench showed q107 2.23×, q53 2.54×, q25 2.44×, q90 2.39×
  * against a 1.49× suite-wide median that hit UNTOUCHED queries just as
  * hard (q01 3.46×). This main separates the two explanations in one
  * quiet JVM:
  *
  *   - q25/q53/q102 never call `appendToSignatureIndex`; their A and B
  *     timings must be equal (within noise) — any driver-bench regression
  *     on them is environment, not code.
  *   - q90/q107 do; if the persist variant recomputes the UDF-heavy
  *     enrichment its median must exceed the localCheckpoint variant's.
  *
  * Modes alternate A,B,A,B,… (`reps` each, default 3) so slow drift in
  * the sandbox hits both arms equally; the report is per-(query, mode)
  * medians. Writes DEDUP_AB_r8.json and prints one JSON line.
  *
  * Usage: sbt "runMain graft.DedupAb" (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, GRAFT_AB_REPS)
  */
object DedupAb {
  private val Queries = Seq(
    "q25_minhash_pairs", "q53_dedup_corpus", "q90_dedup_incremental",
    "q102_dedup_keep_best", "q107_dedup_maintenance")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("GRAFT_AB_REPS").flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timeOne(name: String, mode: String): Double = {
      System.setProperty("graft.dedup.append.materialize", mode)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      try SparkEntry.releaseScratch(spark) catch { case _: Throwable => }
      dt
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // one untimed warm pass (parquet footers, codegen) before measuring
    Queries.foreach(q => timeOne(q, "persist"))
    // arm order FLIPS on alternate reps: the second same-query execution
    // in a rep is systematically faster (JIT/cache), and a fixed order
    // would fold that bias into the mode ratio — the first run of this
    // harness showed exactly that on q25/q53, which never touch the
    // toggled code path yet read 1.35x under a fixed order
    val raw: Seq[(String, String, Int, Double)] = (0 until reps).flatMap {
      r => Queries.flatMap { q =>
        val arms =
          if (r % 2 == 0) Seq("persist", "localCheckpoint")
          else Seq("localCheckpoint", "persist")
        arms.map(m => (q, m, r, timeOne(q, m)))
      }
    }
    System.clearProperty("graft.dedup.append.materialize")
    val med = Queries.flatMap { q =>
      Seq("persist", "localCheckpoint").map { m =>
        (q, m, median(raw.collect { case (`q`, `m`, _, dt) => dt }))
      }
    }
    val medJson = Queries.map { q =>
      val p = med.collectFirst { case (`q`, "persist", v) => v }.get
      val c = med.collectFirst { case (`q`, "localCheckpoint", v) => v }.get
      f""""$q":{"persist":$p%.3f,"localCheckpoint":$c%.3f,"ratio":${p / c}%.3f}"""
    }.mkString("{", ",", "}")
    val rawJson = raw.map { case (q, m, r, dt) =>
      f"""{"q":"$q","mode":"$m","rep":$r,"sec":$dt%.3f}"""
    }.mkString("[", ",", "]")
    val out = s"""{"reps":$reps,"sf":"$sfDir","cpus":$cpus,""" +
      s""""medians":$medJson,"raw":$rawJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("DEDUP_AB_r8.json"),
      out.getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
