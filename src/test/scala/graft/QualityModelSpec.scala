package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityModel

class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("docFeatures: integer surface counts, null text dropped") {
    val docs = Seq(
      (1L, "Hello, world 42 the the"),
      (2L, null.asInstanceOf[String]),
      (3L, "   ")).toDF("doc_id", "text")
    val f = QualityModel.docFeatures(docs, "text")
      .select("doc_id", "x0", "x1", "x2", "x3", "x4")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(f(1L) == ((1L, 5L, 1L, 2L, 2L))) // 5 toks, 1 comma, "42", 2×the
    assert(f(3L) == ((1L, 0L, 0L, 0L, 0L))) // blank: all-zero counts
    assert(!f.contains(2L))
  }

  test("perceptronTrain replays the hand-computed epoch updates exactly") {
    // two rows, two features; margin 0 counts as misclassified
    val feats = Seq((1L, 1L, 2L), (-1L, 1L, 1L)).toDF("y", "x0", "x1")
    // e1: w=(0,0), both mis: g=(1-1, 2-1)=(0,1)        -> w=(0,1)
    // e2: margins 2 (ok), 1 (y*m=-1 mis): g=(-1,-1)    -> w=(-1,0)
    // e3: margins -1 (mis), -1 (y*m=1 ok): g=(1,2)     -> w=(0,2)
    assert(QualityModel.perceptronTrain(feats, "y", Seq("x0", "x1"), 1)
      == Seq(0L, 1L))
    assert(QualityModel.perceptronTrain(feats, "y", Seq("x0", "x1"), 2)
      == Seq(-1L, 0L))
    assert(QualityModel.perceptronTrain(feats, "y", Seq("x0", "x1"), 3)
      == Seq(0L, 2L))
  }

  test("weights are partitioning-invariant (integer order-independence)") {
    val rows = (0 until 400).map { i =>
      (if (i % 3 == 0) 1L else -1L, 1L, i.toLong % 17, i.toLong % 5)
    }
    val one = rows.toDF("y", "x0", "x1", "x2").repartition(1)
    val many = rows.toDF("y", "x0", "x1", "x2").repartition(13)
    val cols = Seq("x0", "x1", "x2")
    assert(QualityModel.perceptronTrain(one, "y", cols, 4)
      == QualityModel.perceptronTrain(many, "y", cols, 4))
  }

  test("perceptronTrainAveraged: epoch-sum weights replay the hand math") {
    val feats = Seq((1L, 1L, 2L), (-1L, 1L, 1L)).toDF("y", "x0", "x1")
    // per-epoch w: (0,1), (-1,0), (0,2) -> acc: (0,1), (-1,1), (-1,3)
    val (wf, acc) = QualityModel.perceptronTrainAveraged(feats, "y",
      Seq("x0", "x1"), 3)
    assert(wf == Seq(0L, 2L))
    assert(acc == Seq(-1L, 3L))
  }

  test("perceptronPredict: margin 0 classifies -1, matching training") {
    val feats = Seq((10L, 1L, 0L), (11L, 1L, 1L)).toDF("doc_id", "x0", "x1")
    val p = QualityModel.perceptronPredict(feats, Seq(0L, 5L),
        Seq("x0", "x1"))
      .select("doc_id", "margin", "pred").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(p(10L) == ((0L, -1L)))
    assert(p(11L) == ((5L, 1L)))
  }

  test("loadTokenWeights: foreign-format file -> integer micro-units, " +
      "headers/comments/blank/garbage lines ignored, dup tokens max-win") {
    val dir = java.nio.file.Files.createTempDirectory("wts").toFile
    val f = new java.io.File(dir, "model.vec")
    val pw = new java.io.PrintWriter(f, "UTF-8")
    pw.println("5 1")            // fastText-style count header (2 ints)?
    pw.println("")               // blank
    pw.println("# lang-id weights") // comment
    pw.println("bonjour 2.5")
    pw.println("hello -1.25")
    pw.println("hola 3")
    pw.println("hola 1")         // duplicate: max quantized weight wins
    pw.println("broken x1y")     // non-numeric value -> ignored
    pw.println("three fields here") // 3 fields -> ignored
    pw.close()
    val w = QualityModel.loadTokenWeights(spark, f.getAbsolutePath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the two-integer 'N dim' header is recognized (both fields bare
    // unsigned ints) and dropped -- it must NOT inject a bogus token
    assert(!w.contains("5"), s"header leaked into vocab: $w")
    assert(w("bonjour") == 2500000L)
    assert(w("hello") == -1250000L)
    assert(w("hola") == 3000000L)
    assert(!w.contains("broken") && !w.contains("three"))
  }

  test("tokenLinearScore: margin = bias + sum of matched token weights; " +
      "null/blank/no-match docs score exactly bias") {
    val docs = Seq(
      (1L, "spark join the the"),
      (2L, "nothing matches here"),
      (3L, null.asInstanceOf[String]),
      (4L, "  ")).toDF("doc_id", "text")
    val w = Seq(("spark", 5L), ("join", 3L), ("the", -1L))
      .toDF("token", "weight")
    val got = QualityModel.tokenLinearScore(docs, "doc_id", "text",
        w, "token", "weight", bias = -2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(1L) == ((-2L + 5 + 3 - 1 - 1, 1L)))
    assert(got(2L) == ((-2L, -1L)))
    assert(got(3L) == ((-2L, -1L)))
    assert(got(4L) == ((-2L, -1L)))
  }

  test("tokenMulticlassScore: per-class margins hand-computed, argmax " +
      "flagged, ties break to the smallest class, bias-only docs covered") {
    val docs = Seq(
      (1L, "the the table"),     // en: -1+3+3+1=6; de: 0+2=2; fr: 1
      (2L, "query value"),       // en: -1; de: 0; fr: 1+2+2=5
      (3L, "nothing known"),     // biases only: en -1, de 0, fr 1 -> fr
      (4L, "table table"))       // en: -1+2=1; de: 0+4=4; fr: 1
      .toDF("doc_id", "text")
    val w = Seq(
      ("the", "en", 3L), ("table", "en", 1L),
      ("table", "de", 2L),
      ("query", "fr", 2L), ("value", "fr", 2L)).toDF("token", "c", "wt")
    val b = Seq(("en", -1L), ("de", 0L), ("fr", 1L)).toDF("c", "bias")
    val got = QualityModel.tokenMulticlassScore(docs, "doc_id", "text",
        w, "token", "c", "wt", b, "c", "bias")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got((1L, "en")) == ((6L, 1L)) && got((1L, "de")) == ((2L, 0L)))
    assert(got((2L, "fr")) == ((5L, 1L)) && got((2L, "en")) == ((-1L, 0L)))
    assert(got((3L, "fr")) == ((1L, 1L)) && got((3L, "de")) == ((0L, 0L)))
    assert(got((4L, "de")) == ((4L, 1L)))
    // tie case: equal margins -> smallest class name wins
    val tie = QualityModel.tokenMulticlassScore(
        Seq((9L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", w, "token", "c", "wt",
        Seq(("aa", 5L), ("bb", 5L)).toDF("c", "bias"), "c", "bias")
      .filter(col("is_pred") === 1L).collect()
    assert(tie.length == 1 && tie(0).getString(1) == "aa")
  }

  test("charNgramBucketsUdf: hand-computed <wrap> bigram/trigram hashes, " +
      "multiplicity kept, null-safe") {
    // token "ab" -> "<ab>" codepoints 60,97,98,62
    //   bigrams:  60*31+97=1957, 97*31+98=3105, 98*31+62=3100
    //   trigrams: 1957*31+98=60765, 3105*31+62=96317
    val got = Seq((1, Seq("ab")), (2, Seq("ab", "ab")),
        (3, null.asInstanceOf[Seq[String]]))
      .toDF("i", "toks")
      .select(col("i"),
        QualityModel.charNgramBucketsUdf(2, 3, 100000)(col("toks")).as("b"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Long](1))).toMap
    assert(got(1) == Some(Seq(1957L, 3105L, 3100L, 60765L, 96317L)))
    // per-occurrence: the repeated token doubles every bucket
    assert(got(2).get.length == 10 &&
      got(2).get.count(_ == 1957L) == 2)
    assert(got(3) == None)
    // modulus applies
    val mod = Seq((1, Seq("ab"))).toDF("i", "toks")
      .select(QualityModel.charNgramBucketsUdf(2, 3, 1000)(col("toks"))
        .as("b")).head().getSeq[Long](0)
    assert(mod == Seq(957L, 105L, 100L, 765L, 317L))
  }

  test("ngramMulticlassScore: margins replay the hand-computed bucket " +
      "sums; no-text docs score exactly the biases") {
    // doc 1 = "ab": buckets (mod 1000) 957,105,100,765,317
    // weights: w(b, cls) = +1 for cls 'p' on every bucket, -1 for 'q'
    // on bucket 957 only
    val docs = Seq((1L, "ab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val w = ((0 until 1000).map(b => (b.toLong, "p", 1L)) :+
        ((957L, "q", -1L))).toDF("bucket", "c", "wt")
    val b = Seq(("p", 10L), ("q", 100L)).toDF("c", "bias")
    val got = QualityModel.ngramMulticlassScore(docs, "doc_id", "text",
        w, "bucket", "c", "wt", b, "c", "bias",
        nMin = 2, nMax = 3, nBuckets = 1000)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got((1L, "p")) == ((15L, 0L)))  // 10 + 5 buckets * 1
    assert(got((1L, "q")) == ((99L, 1L)))  // 100 - 1 (bucket 957 once)
    assert(got((2L, "p")) == ((10L, 0L)) && got((2L, "q")) == ((100L, 1L)))
  }

  test("loadHashedClassWeights: 3-field (bucket class value) lines, " +
      "garbage ignored, micro-unit quantization, dup max-win") {
    val dir = java.nio.file.Files.createTempDirectory("hwts").toFile
    val f = new java.io.File(dir, "lid.bin.export")
    val pw = new java.io.PrintWriter(f, "UTF-8")
    pw.println("# hashed LID export")
    pw.println("42 en 2.5")
    pw.println("42 de -1.25")
    pw.println("42 en 1.0")      // dup (bucket, cls): max wins
    pw.println("notanint fr 1.0") // bucket not integer -> ignored
    pw.println("7 fr xx")         // value not numeric -> ignored
    pw.println("7 fr")            // 2 fields -> ignored
    pw.println("9 fr 0.5")
    pw.close()
    val got = QualityModel.loadHashedClassWeights(spark, f.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((42L, "en") -> 2500000L, (42L, "de") -> -1250000L,
      (9L, "fr") -> 500000L), got.toString)
  }
}
