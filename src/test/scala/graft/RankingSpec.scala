package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation
import graft.functions.TextFns

class RankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25 ranks term-dense short docs above sparse long ones") {
    val docs = Seq(
      (1L, "spark spark spark join"),            // dense
      (2L, "spark " + ("filler " * 60).trim),    // one hit, long doc
      (3L, "completely unrelated words here"),   // no hits
      (4L, "join query spark")                   // all three terms
    ).toDF("doc_id", "text")
    val got = Curation.bm25(docs, "doc_id", "text", Seq("spark", "query", "join"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(!got.contains(3L)) // no matching term, no row
    assert(got(4L)._2 == 3 && got(1L)._2 == 2 && got(2L)._2 == 1)
    assert(got(4L)._1 > got(2L)._1) // three distinct terms beat one diluted hit
    assert(got(1L)._1 > got(2L)._1) // tf saturation still beats long-doc dilution
  }

  test("repetitionRatio: novel text 0, repeated text approaches 1, edges") {
    val docs = Seq(
      (1L, "a b c d e f"),            // all bigrams distinct -> 0
      (2L, ("ha " * 30).trim),        // single repeated bigram -> 1 - 1/29
      (3L, "one"),                    // < n tokens -> 0
      (4L, null.asInstanceOf[String]) // null -> null
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
      TextFns.repetitionRatio(col("text"), 2).as("r")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) == Some(0.0))
    assert(math.abs(got(2L).get - (1.0 - 1.0 / 29)) < 1e-12)
    assert(got(3L) == Some(0.0))
    assert(got(4L).isEmpty)
  }
}

/** asofJoin semantics: latest at-or-before match, ties, misses. */
class AsofSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Ops

  test("asofJoin picks latest right at-or-before each left ts per key") {
    val left = Seq(
      ("a", 10L, "l1"), ("a", 25L, "l2"), ("a", 5L, "l3"),
      ("b", 100L, "l4")).toDF("k", "ts", "tag")
    val right = Seq(
      ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
      ("c", 1L, 9.0)).toDF("k", "ts", "v")
    val got = Ops.asofJoin(left, right, "k", "ts", Seq("v"))
      .select(col("tag"), col("asof_v")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got("l1") == Some(1.0)) // tie at ts=10 matches (<=)
    assert(got("l2") == Some(2.0)) // 20 latest <= 25
    assert(got("l3") == None)      // nothing at-or-before 5
    assert(got("l4") == None)      // key with no right rows
  }

  test("asofJoin shuffles once on the key — no range-join expansion") {
    val left = spark.range(1000).select((col("id") % 10).as("k"),
      col("id").as("ts"), col("id").as("x"))
    val right = spark.range(100).select((col("id") % 10).as("k"),
      (col("id") * 7).as("ts"), col("id").cast("double").as("v"))
    val plan = Ops.asofJoin(left, right, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    // a single Window over the union — no join operator at all
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert(plan.contains("Window"))
  }
}

/** Boilerplate passages + token-budget mixing semantics. */
class MixBoilerplateSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Curation

  test("boilerplatePassages finds the shared footer, not unique text") {
    val footer = "all rights reserved contact us"
    // prefixes are exactly k tokens so the footer tiles into its own
    // aligned passage (tiling is alignment-sensitive by design — a
    // shifted footer is a different passage, like real line-dedup units)
    val docs = Seq(
      (1L, s"unique words one two three $footer"),
      (2L, s"totally different content here now $footer"),
      (3L, s"yet another body of text $footer"),
      (4L, "no footer in this one at all")).toDF("doc_id", "text")
    // k=5 tiles: docs 1-3 end with the footer tail chunk (5 tokens + 1)
    val got = Curation.boilerplatePassages(docs, "doc_id", "text", k = 5, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.forall { case (p, n) => n >= 3 &&
      (footer.contains(p.split(" ").head) ||
        footer.split(" ").contains(p.split(" ").head)) })
    // doc 4's unique chunks never appear
    assert(!got.exists(_._1.contains("no footer")))
  }

  test("tokenBudgetMix: deterministic, budget-respecting, per-source") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      (when(col("id") % 2 === 0, "a").otherwise("b")).as("source"),
      lit(10L).as("toks"))
    val budgets = Seq(("a", 55L), ("b", 200L)).toDF("source", "budget")
    val mix = Curation.tokenBudgetMix(docs, "doc_id", "toks", "source", budgets)
    val perSource = mix.groupBy("source").agg(sum("toks").as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perSource("a") == ((50L, 5L))) // 5 docs of 10 tokens fit in 55
    assert(perSource("b") == ((200L, 20L)))
    // reproducible: second run identical ids
    val ids1 = mix.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Curation.tokenBudgetMix(docs, "doc_id", "toks", "source", budgets)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }
}
