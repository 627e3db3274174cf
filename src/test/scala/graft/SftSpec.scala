package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sft

class SftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def turns = Seq(
    (1L, 0, "system", "sys"),
    (1L, 1, "user", "hi there"),
    (1L, 2, "assistant", "hello"),
    (1L, 3, "user", "more?"),
    (1L, 4, "assistant", "yes más 😀"),
    (2L, 0, "user", "lonely prompt"),          // no assistant at all
    (3L, 0, "assistant", null: String))         // null content
    .toDF("conv", "ix", "role", "c")

  test("renderChatML: offsets slice back the exact assistant contents, " +
      "unicode included; no-target and null-content convs behave") {
    val r = Sft.renderChatML(turns, "conv", "ix", "role", "c")
    val spans = Sft.explodeSpans(r).collect()
      .map(x => (x.getLong(0), x.getInt(4), x.getString(7)))
    assert(spans.toSet == Set((1L, 0, "hello"), (1L, 1, "yes más 😀"),
      (3L, 0, "")))
    val byConv = r.collect().map(x => x.getLong(0) ->
      ((x.getString(1), x.getInt(2), x.getInt(3)))).toMap
    assert(byConv(1L)._1 ==
      "<|im_start|>system\nsys<|im_end|>\n" +
        "<|im_start|>user\nhi there<|im_end|>\n" +
        "<|im_start|>assistant\nhello<|im_end|>\n" +
        "<|im_start|>user\nmore?<|im_end|>\n" +
        "<|im_start|>assistant\nyes más 😀<|im_end|>\n")
    // offsets are CODE POINTS (Spark length/substring semantics, same
    // as DuckDB): the emoji counts 1, not its 2 UTF-16 units
    val target = "yes más 😀"
    assert(byConv(1L)._2 == 5 &&
      byConv(1L)._3 == "hello".length +
        target.codePointCount(0, target.length))
    // conv 2: no assistant turn -> zero spans, zero target mass
    assert(byConv(2L)._3 == 0)
    assert(Sft.explodeSpans(r).filter(col("conv") === 2L).count() == 0)
    // conv 3: null content renders an empty turn with an empty span
    assert(byConv(3L)._1 == "<|im_start|>assistant\n<|im_end|>\n")
  }

  test("tokenLossMask: exactly the tokens overlapping a loss span are " +
      "masked, offsets slice the text, boundary tokens count as masked") {
    val r = Sft.renderChatML(turns, "conv", "ix", "role", "c")
    val m = Sft.tokenLossMask(r).filter(col("conv") === 1L).collect()
      .map(x => (x.getString(2), x.getInt(3), x.getInt(4), x.getBoolean(5)))
    val text = r.filter(col("conv") === 1L)
      .select(col("text")).collect().head.getString(0)
    // every offset slices its token back out (code-point arithmetic)
    m.foreach { case (tok, s, e, _) =>
      val cp = text.codePoints().toArray
      assert(new String(cp, s, e - s) == tok) }
    // masked tokens are precisely those carrying assistant content:
    // 'hello<|im_end|>' (glued marker overlaps) and the three words of
    // 'yes más 😀<|im_end|>'
    val masked = m.filter(_._4).map(_._1).toSet
    assert(masked == Set("hello<|im_end|>", "yes", "más", "😀<|im_end|>"))
    // conv 2 (no assistant turn): nothing masks
    assert(Sft.tokenLossMask(r).filter(col("conv") === 2L &&
      col("masked")).count() == 0)
  }

  test("every span's substring equals its span_text (the pre-training " +
      "self-check), and spans are in turn order") {
    val r = Sft.renderChatML(turns, "conv", "ix", "role", "c")
    val bad = Sft.explodeSpans(r)
      .withColumn("__cut", expr("substring(text, s + 1, e - s)"))
      .filter(col("__cut") =!= col("span_text")).count()
    assert(bad == 0)
    val order = Sft.explodeSpans(r).filter(col("conv") === 1L)
      .orderBy(col("span_ix")).select(col("s")).collect().map(_.getInt(0))
    assert(order.sliding(2).forall {
      case Array(a, b) => a < b
      case _ => true
    })
  }

  test("treePaths: branched tree flattens to one row per leaf; " +
      "missing parents, cycles and oversized trees refuse loudly") {
    // conv 1:     0
    //           /   \
    //          1     2
    //         / \     \
    //        3   4     5        -> leaves 3, 4, 5
    // conv 2: single node       -> one path
    val nodes = Seq(
      (1L, 0L, None, "r"), (1L, 1L, Some(0L), "a"),
      (1L, 2L, Some(0L), "b"), (1L, 3L, Some(1L), "c"),
      (1L, 4L, Some(1L), "d"), (1L, 5L, Some(2L), "e"),
      (2L, 9L, None, "solo"))
      .toDF("conv", "node", "parent", "content")
    val r = graft.operators.Sft.treePaths(nodes, "conv", "node",
      "parent", "content").collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getInt(2), x.getString(3), x.getString(4)))).toMap
    assert(r.keySet == Set((1L, 3L), (1L, 4L), (1L, 5L), (2L, 9L)))
    assert(r((1L, 3L)) == ((3, "0 1 3", "r a c")))
    assert(r((1L, 4L)) == ((3, "0 1 4", "r a d")))
    assert(r((1L, 5L)) == ((3, "0 2 5", "r b e")))
    assert(r((2L, 9L)) == ((1, "9", "solo")))
    def root(t: Throwable): Throwable =
      if (t.getCause == null) t else root(t.getCause)
    val orphan = Seq((7L, 1L, Some(99L), "x")).toDF("conv", "node",
      "parent", "content")
    val e1 = intercept[Exception] { graft.operators.Sft.treePaths(
      orphan, "conv", "node", "parent", "content").collect() }
    assert(root(e1).getMessage.contains("missing parent 99"))
    val cyc = Seq((8L, 1L, Some(2L), "x"), (8L, 2L, Some(1L), "y"),
      (8L, 3L, Some(1L), "z")).toDF("conv", "node", "parent", "content")
    val e2 = intercept[Exception] { graft.operators.Sft.treePaths(
      cyc, "conv", "node", "parent", "content").collect() }
    assert(root(e2).getMessage.contains("cycle"))
    val e3 = intercept[Exception] { graft.operators.Sft.treePaths(
      nodes, "conv", "node", "parent", "content", maxNodes = 3)
      .collect() }
    assert(root(e3).getMessage.contains("not a chat tree"))
    // a node id of -1 would silently read as a root (-1 is the
    // root-parent sentinel) — refused loudly instead
    val negId = Seq((9L, -1L, None: Option[Long], "x"),
      (9L, 1L, Some(-1L), "y")).toDF("conv", "node", "parent", "content")
    val e4 = intercept[Exception] { graft.operators.Sft.treePaths(
      negId, "conv", "node", "parent", "content").collect() }
    assert(root(e4).getMessage.contains("negative node id -1"))
    val negPtr = Seq((10L, 1L, Some(-5L), "x")).toDF("conv", "node",
      "parent", "content")
    val e5 = intercept[Exception] { graft.operators.Sft.treePaths(
      negPtr, "conv", "node", "parent", "content").collect() }
    assert(root(e5).getMessage.contains("negative parent pointer -5"))
  }
}
