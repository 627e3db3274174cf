package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Curation

/** Scale probe for the curation operators (SCALE.md): replicate the sf0.1
  * documents table ×N (ids shifted, text varied by a replica suffix) and
  * measure decontamination, stratified sampling, packing and PII
  * redaction on the enlarged corpus. Also asserts the load-bearing plan
  * properties: decontaminate joins via BroadcastHashJoin, sampling and
  * redaction are exchange-free single stages.
  */
object CurationProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = docs0.count()
    // ×N replication: shift ids, suffix text with the replica tag so
    // replicas are near-dups (worst case for gram explosion), not exact.
    val reps = spark.range(mult).select(col("id").as("rep"))
    val docs = docs0.crossJoin(reps)
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        concat_ws(" ", col("text"), concat(lit("rep"), col("rep"))).as("text"),
        col("lang"))
      .repartition(64).cache()
    val n = docs.count()
    println(s"[probe] corpus: $n0 -> $n docs (x$mult)")

    // benchmark = a fixed small slice of the ORIGINAL docs (eval suites
    // don't grow with the corpus)
    val bench = docs0.filter(col("doc_id") % 97 === 0)
      .filter(col("text").isNotNull && TextFns.tokenCount(col("text")) >= 3)

    val eligible = docs.filter(col("text").isNotNull &&
      TextFns.tokenCount(col("text")) >= 3)
    val deconPlan = Curation.decontaminate(eligible, "doc_id", "text",
      bench, "text", n = 3).queryExecution.executedPlan.toString
    require(deconPlan.contains("BroadcastHashJoin") ||
      deconPlan.contains("BroadcastExchange"),
      s"decontaminate should broadcast benchmark grams:\n$deconPlan")
    time(s"decontaminate x$mult (3-grams)") {
      Curation.decontaminate(eligible, "doc_id", "text", bench, "text", 3)
        .agg(count(lit(1)), sum("hits")).collect()
    }

    import spark.implicits._
    val fr = Seq(("en", 0.5), ("de", 0.25), ("es", 0.125),
      ("fr", 0.75), ("zh", 0.0625)).toDF("lang", "fraction")
    val samplePlan = Curation.stratifiedHashSample(docs, "doc_id", "lang", fr)
      .queryExecution.executedPlan.toString
    // shuffle nodes render as "Exchange hashpartitioning(...)" — the
    // broadcast of the fractions table is the ONLY exchange allowed
    require(!samplePlan.contains("Exchange hashpartitioning"),
      s"sampling must not shuffle the corpus:\n$samplePlan")
    time(s"stratified hash sample x$mult") {
      Curation.stratifiedHashSample(docs, "doc_id", "lang", fr).count()
    }

    time(s"pack sequences x$mult (256-tok bins, 64 shards)") {
      val d = docs.filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("doc_id"), pmod(col("doc_id"), lit(64)).as("shard"),
          TextFns.tokenCount(col("text")).cast("long").as("toks"))
      Curation.packingStats(
        Curation.packSequences(d, "doc_id", "toks", 256, "shard"),
        "toks", 256, "shard").agg(count(lit(1)), sum("fill")).collect()
    }

    // token-budget mix: the window must partition by (source, shard) —
    // a per-source-only window serializes each source through one task
    // at corpus scale. Assert the plan has no such window, then run.
    val mixDocs = docs.filter(col("text").isNotNull && trim(col("text")) =!= "")
      .select(col("doc_id"), col("lang").as("source"),
        TextFns.tokenCount(col("text")).cast("long").as("toks"))
    val mixBudgets = Seq(("en", 500000L), ("de", 250000L), ("es", 125000L),
      ("fr", 750000L), ("zh", 62500L)).toDF("source", "budget")
    val mixPlan = Curation.tokenBudgetMix(mixDocs, "doc_id", "toks", "source",
      mixBudgets).queryExecution.executedPlan.toString
    // the wide cumsum window spec must read: partition (source, __shard),
    // order (__bucket, ...) — i.e. __shard as a PARTITION column
    require("""windowspecdefinition\(source#\d+L?, __shard#\d+, __bucket#\d+L? ASC""".r
      .findFirstIn(mixPlan).isDefined,
      s"tokenBudgetMix wide window must partition by (source, __shard):\n$mixPlan")
    time(s"token-budget mix x$mult (5 sources, 64 shards)") {
      Curation.tokenBudgetMix(mixDocs, "doc_id", "toks", "source", mixBudgets)
        .agg(count(lit(1)), sum("toks")).collect()
    }

    time(s"PII redaction x$mult") {
      Curation.redactPii(docs.filter(col("text").isNotNull), "text")
        .agg(sum(length(col("text"))), sum("n_email"), sum("n_phone")).collect()
    }

    // chunking: map-side only — no exchange may appear before the agg
    val chunkPlan = Curation.chunkWindows(docs, "doc_id", "text", 64, 48)
      .queryExecution.executedPlan.toString
    require(!chunkPlan.contains("Exchange hashpartitioning"),
      s"chunkWindows must not shuffle the corpus:\n$chunkPlan")
    time(s"chunk windows x$mult (64/48)") {
      Curation.chunkWindows(docs, "doc_id", "text", 64, 48)
        .agg(count(lit(1)), sum("n_tokens")).collect()
    }

    time(s"unigram surprisal x$mult") {
      Curation.unigramSurprisal(docs, "doc_id", "text")
        .agg(count(lit(1)), sum("surprisal")).collect()
    }

    // persist hook: tokenize ONCE, cache, run BOTH twice-scanning scorers
    // through the *Tokenized overloads — every scan must hit the cache
    // (InMemoryTableScan), never re-read the corpus text
    val toksRel = Curation.tokenized(docs, "doc_id", "text").persist()
    toksRel.count() // materialize before planning the consumers
    for ((name, df) <- Seq(
      "surprisal" -> Curation.unigramSurprisalTokenized(toksRel, "doc_id"),
      "bigram" -> Curation.bigramSurprisalTokenized(toksRel, "doc_id"),
      "bm25" -> Curation.bm25Tokenized(toksRel, "doc_id",
        Seq("spark", "query", "join")))) {
      // walk the optimized LOGICAL plan: InMemoryRelation is a leaf (its
      // cached subtree is display-only), so any LogicalRelation found is
      // a LIVE source scan the cache failed to cover
      val lp = df.queryExecution.optimizedPlan
      val live = lp.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }
      val cached = lp.collect {
        case i: org.apache.spark.sql.execution.columnar.InMemoryRelation => i
      }
      require(cached.nonEmpty,
        s"$name (tokenized) must scan the persisted relation:\n$lp")
      require(live.isEmpty,
        s"$name (tokenized) must not re-scan the corpus:\n$lp")
    }
    time(s"uni+bigram surprisal + bm25 over ONE persisted tokenization x$mult") {
      Curation.unigramSurprisalTokenized(toksRel, "doc_id")
        .agg(count(lit(1)), sum("surprisal")).collect()
      Curation.bigramSurprisalTokenized(toksRel, "doc_id")
        .agg(count(lit(1)), sum("surprisal")).collect()
      Curation.bm25Tokenized(toksRel, "doc_id", Seq("spark", "query", "join"))
        .agg(count(lit(1)), sum("bm25")).collect()
    }
    toksRel.unpersist()

    // semantic decontamination: bench side must broadcast
    val embDocs = spark.range(200000L).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 31), d -> CAST(pmod(id * (d + 7), 97) AS DOUBLE) / 97.0)")
        .as("embedding"))
    val embBench = embDocs.filter(col("vec_id") % 997 === 0)
    val semPlan = Curation.semanticDecontaminate(
      embDocs.filter(col("vec_id") % 997 =!= 0), "vec_id", "embedding",
      embBench, "embedding", 0.99).queryExecution.executedPlan.toString
    require(semPlan.contains("BroadcastNestedLoopJoin") ||
      semPlan.contains("BroadcastExchange"),
      s"semanticDecontaminate must broadcast the benchmark:\n$semPlan")
    time("semantic decontam 200k x 200 bench (32-dim)") {
      Curation.semanticDecontaminate(
        embDocs.filter(col("vec_id") % 997 =!= 0), "vec_id", "embedding",
        embBench, "embedding", 0.99)
        .agg(count(lit(1))).collect()
    }

    // inverted-index build over the replicated corpus + a pruned probe
    val tixPath = java.nio.file.Files.createTempDirectory("probe_tix")
      .resolve("idx").toString
    time(s"text index build x$mult") {
      graft.operators.TextIndex.write(docs, "doc_id", "text", tixPath)
    }
    time("text index search (3 terms, pruned)") {
      graft.operators.TextIndex.search(spark, tixPath,
        Seq("spark", "query", "join"), 100).collect()
    }

    // as-of join at volume: one shuffle on the key, no row expansion
    val leftEv = spark.range(10000000L).select(
      pmod(col("id"), lit(10000)).as("k"), (col("id") * 13 % 1000003).as("ts"),
      col("id").as("x"))
    val rightEv = spark.range(1000000L).select(
      pmod(col("id"), lit(10000)).as("k"), (col("id") * 7 % 1000003).as("ts"),
      col("id").cast("double").as("v"))
    time("asof join 10M left x 1M right (10k keys)") {
      graft.operators.Ops.asofJoin(leftEv, rightEv, "k", "ts", Seq("v")).count()
    }

    spark.stop()
  }
}
