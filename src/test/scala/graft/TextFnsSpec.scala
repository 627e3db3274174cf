package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns

class TextFnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens: empty text yields empty array, not [\"\"]") {
    val df = Seq("", "  ", "a  b\tc").toDF("t")
      .select(TextFns.tokenCount($"t").as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 3))
  }

  test("punct and stopword ratios") {
    val df = Seq("the cat, the hat!").toDF("t").select(
      round(TextFns.punctRatio($"t"), 4).as("p"),
      round(TextFns.stopwordRatio($"t"), 4).as("s"))
    val r = df.head
    // 2 punct chars of 17; 2 of 4 tokens are stopwords ("the","the";
    // "cat,"/"hat!" carry punctuation so don't match)
    assert(r.getDouble(0) == math.rint(2.0 / 17 * 1e4) / 1e4)
    assert(r.getDouble(1) == 0.5)
  }

  test("wordShingles produce distinct n-grams; short docs degrade to one") {
    val df = Seq("a b c d", "a").toDF("t")
      .select(TextFns.wordShingles($"t", 2).as("sh"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b", "b c", "c d"))
    assert(got(1) == Seq("a"))
  }

  test("charShingles over normalized text") {
    val df = Seq("Ab  c").toDF("t").select(TextFns.charShingles($"t", 3).as("sh"))
    assert(df.head.getSeq[String](0) == Seq("ab ", "b c"))
  }

  test("minhash: identical docs share signatures; near-dups agree on most") {
    val mh = TextFns.minhashSigUdf(2, 16)
    val df = Seq(
      ("x", "the quick brown fox jumps over the lazy dog again and again"),
      ("y", "the quick brown fox jumps over the lazy dog again and again"),
      ("z", "quick brown fox jumps over the lazy dog again and again"),
      ("w", "completely different words entirely unrelated content here"))
      .toDF("id", "t")
      .select($"id", mh(TextFns.tokens(lower($"t"))).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("x") == sigs("y"))
    val agree = sigs("x").zip(sigs("z")).count { case (a, b) => a == b }
    assert(agree >= 8, s"near-dup agreement only $agree/16")
    val agreeFar = sigs("x").zip(sigs("w")).count { case (a, b) => a == b }
    assert(agreeFar <= 4, s"unrelated docs agree on $agreeFar/16")
  }

  test("simhash: hamming small for near-dups, large for unrelated") {
    val df = Seq(
      ("a", "spark catalyst optimizer rewrites logical plans into physical plans"),
      ("b", "spark catalyst optimizer rewrites logical plans into physical stages"),
      ("c", "pelicans migrate across the southern wetlands every winter"))
      .toDF("id", "t").select($"id", TextFns.simhash64($"t").as("h"))
    val h = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(h("a"), h("b")) <= 12, s"near ${ham(h("a"), h("b"))}")
    assert(ham(h("a"), h("c")) > 12, s"far ${ham(h("a"), h("c"))}")
  }

  test("fingerprint is whitespace/case-invariant, content-sensitive") {
    val df = Seq("Hello  World", "hello world", "hello worlds").toDF("t")
      .select(TextFns.fingerprint($"t").as("f"))
    val f = df.collect().map(_.getLong(0))
    assert(f(0) == f(1))
    assert(f(0) != f(2))
  }

  test("langId picks marker-language, und when none") {
    val df = Seq("the cat is on the mat", "der hund ist mit der katze",
      "le chat est avec les chiens", "xyzzy plugh").toDF("t")
      .select(TextFns.langId($"t").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "de", "fr", "und"))
  }

  test("qualityScore stays in [0,1]") {
    val df = Seq("", "the of and is with good text here", "!!!###$$$").toDF("t")
      .select(TextFns.qualityScore($"t").as("q"))
    df.collect().foreach(r => assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
  }
}
