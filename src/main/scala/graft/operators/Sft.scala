package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning data assembly — the step between curated
  * conversations and the trainer: render multi-turn conversations into
  * one template string per conversation and emit the LOSS-MASK spans
  * (which character ranges the loss is computed on — assistant
  * contents only; prompts, roles and markers are context, not target).
  *
  * Template: ChatML (the widely-published
  * `<|im_start|>role\ncontent<|im_end|>\n` form). Spans are CHARACTER
  * offsets into the rendered string — tokenizer-agnostic by design:
  * token-level masks are obtained downstream by intersecting token
  * char-ranges with these spans, so the same rendered relation feeds
  * any tokenizer. All offset arithmetic is integer prefix sums over
  * window functions partitioned by conversation — exactly replayable
  * in the oracle and shuffle-bounded by conversation size.
  */
object Sft {

  private val turnPrefix: Column => Column =
    role => concat(lit("<|im_start|>"), role, lit("\n"))
  private val turnSuffix = "<|im_end|>\n"

  /** Render conversations `(convCol, ixCol, roleCol, textCol)` — one
    * row per turn, `ixCol` ordering turns within a conversation — into
    * `(conv, text, n_turns, n_target_chars, spans)`:
    *
    *  - `text`: the ChatML rendering in turn order;
    *  - `spans`: `array<struct<s int, e int>>` of 0-based character
    *    ranges `[s, e)` covering each `targetRole` turn's CONTENT
    *    (role marker and `<|im_end|>` excluded — loss on the words,
    *    not the scaffolding), in turn order;
    *  - `n_target_chars`: total masked-in characters (the per-example
    *    packing weight a loss-weighted sampler needs).
    *
    * Null contents render as empty turns (span `[s, s)`) rather than
    * dropping the turn — turn structure is data, absence is not.
    */
  def renderChatML(turns: DataFrame, convCol: String, ixCol: String,
      roleCol: String, textCol: String,
      targetRole: String = "assistant"): DataFrame = {
    require(targetRole.matches("[A-Za-z_-]+"),
      s"targetRole '$targetRole' is not a plain role token")
    val content = coalesce(col(textCol).cast("string"), lit(""))
    val rendered = concat(turnPrefix(col(roleCol)), content,
      lit(turnSuffix))
    val w = Window.partitionBy(col("conv")).orderBy(col("__ix"))
    val withOff = turns.select(col(convCol).as("conv"), col(ixCol).as("__ix"),
        col(roleCol).as("__role"), content.as("__c"),
        rendered.as("__r"))
      .withColumn("__start",
        coalesce(sum(length(col("__r")))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
    withOff
      .withColumn("__s",
        (col("__start") + length(turnPrefix(col("__role")))).cast("int"))
      .withColumn("__e", (col("__s") + length(col("__c"))).cast("int"))
      .groupBy(col("conv"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__ix"), col("__r")))),
          t => t.getField("__r")), "").as("text"),
        count(lit(1)).cast("int").as("n_turns"),
        coalesce(sum(when(col("__role") === targetRole,
          length(col("__c")))), lit(0)).cast("int").as("n_target_chars"),
        expr("array_sort(collect_list(CASE WHEN __role = '" + targetRole +
          "' THEN struct(__s AS s, __e AS e) END))").as("spans"))
  }

  /** Char-span → token-mask intersection — the downstream half of the
    * loss-mask contract: given the rendered relation, tokenize `text`
    * on single whitespace characters (space or newline — the only
    * separators the ChatML template emits) WITH character offsets, and
    * mark each token masked-in iff its `[s, e)` range overlaps any
    * loss span. Partial overlaps count (a token glueing content to the
    * `<|im_end|>` marker carries loss chars, so it is masked in) —
    * exactly what a subword tokenizer's offset intersection does.
    *
    * Offsets are one prefix-sum window per conversation (the relation
    * arrives hash-partitioned by `conv` from the render aggregate, so
    * no extra shuffle); the span test is a HOF `exists` over the
    * per-row spans array — no join, no second evaluation of the render
    * chain. Empty tokens (consecutive/trailing separators) are dropped
    * AFTER the offset arithmetic so positions stay exact.
    */
  def tokenLossMask(rendered: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv")).orderBy(col("pos"))
    rendered.select(col("conv"), col("spans"),
        posexplode(split(col("text"), "[ \n]", -1)).as(Seq("pos", "tok")))
      .withColumn("s", coalesce(sum(length(col("tok")) + 1)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0))
        .cast("int"))
      .withColumn("e", (col("s") + length(col("tok"))).cast("int"))
      .filter(length(col("tok")) > 0)
      .select(col("conv"), col("pos"), col("tok"), col("s"), col("e"),
        coalesce(exists(col("spans"),
          sp => col("s") < sp.getField("e") && col("e") > sp.getField("s")),
          lit(false)).as("masked"))
  }

  /** The rendered relation flattened to one row per loss span, with
    * the span text sliced back out — the self-check consumers run
    * before training (`span_text` must equal the source assistant
    * content), and the join-friendly form for char→token mask
    * intersection. The per-conversation columns (text, n_turns,
    * n_target_chars) ride along so no re-join against `rendered` (and
    * no second evaluation of the render chain) is ever needed.
    */
  /** Branched-conversation flattening — the ShareGPT/"message tree"
    * shape: every assistant reply may have sibling alternatives, and
    * SFT consumes each ROOT→LEAF path as one linear conversation.
    * Input is one row per node `(conv, node, parent, content)` with
    * `parent` null at roots; output is one row per LEAF carrying the
    * path's node ids (space-joined, root first), the concatenated
    * content, and the depth.
    *
    * Per-conversation local (a chat tree is bounded — loud `maxNodes`
    * guard): one groupBy collect + a walk-up UDF; no joins, no
    * iteration over the cluster. Malformed trees refuse loudly:
    * a node whose parent id is missing from the conversation, a
    * parent cycle, or a NEGATIVE node id (−1 is reserved as the
    * root-parent sentinel) names the conversation.
    */
  def treePaths(nodes: DataFrame, convCol: String, nodeCol: String,
      parentCol: String, contentCol: String,
      maxNodes: Int = 4096): DataFrame = {
    val pathsUdf = udf { (ns: Seq[Long], ps: Seq[Long],
        cs: Seq[String], conv: Long) =>
      // ps carries -1 at roots (null parents are sentinel-coded by the
      // caller — safer across the UDF boundary than nested Options)
      require(ns.length <= maxNodes,
        s"conversation $conv has > $maxNodes nodes — not a chat tree")
      // -1 is the root sentinel, so negative NODE ids would silently
      // read as roots — refuse them instead (loud-refusal contract)
      ns.foreach(n => require(n >= 0L,
        s"conversation $conv: negative node id $n (ids must be >= 0; " +
          "-1 is reserved as the root-parent sentinel)"))
      ps.foreach(p => require(p >= -1L,
        s"conversation $conv: negative parent pointer $p"))
      val ix = ns.zipWithIndex.toMap
      ps.zipWithIndex.foreach { case (p, i) =>
        require(p == -1L || ix.contains(p),
          s"conversation $conv: node ${ns(i)} points at missing " +
            s"parent $p") }
      val hasChild = ps.filter(_ != -1L).toSet
      val leaves = ns.filter(n => !hasChild.contains(n))
      leaves.map { leaf =>
        var cur = leaf
        var ids = List.empty[Long]
        var texts = List.empty[String]
        var steps = 0
        var done = false
        while (!done) {
          require(steps <= ns.length,
            s"conversation $conv: parent cycle at node $leaf")
          steps += 1
          val i = ix(cur)
          ids = cur :: ids
          texts = cs(i) :: texts
          if (ps(i) == -1L) done = true else cur = ps(i)
        }
        (leaf, ids.length, ids.mkString(" "), texts.mkString(" "))
      }
    }
    nodes.groupBy(col(convCol).cast("long").as("conv"))
      .agg(
        collect_list(struct(col(nodeCol).cast("long").as("n"),
          coalesce(col(parentCol).cast("long"), lit(-1L)).as("p"),
          col(contentCol).as("c"))).as("__ns"))
      .select(col("conv"),
        explode(pathsUdf(
          expr("transform(__ns, x -> x.n)"),
          expr("transform(__ns, x -> x.p)"),
          // null contents join as empty, not the string "null"
          expr("transform(__ns, x -> coalesce(x.c, ''))"),
          col("conv"))).as("x"))
      .select(col("conv"), col("x._1").as("leaf_id"),
        col("x._2").as("depth"), col("x._3").as("path_ids"),
        col("x._4").as("path_text"))
  }

  def explodeSpans(rendered: DataFrame): DataFrame =
    rendered.select(col("conv"), col("text"), col("n_turns"),
        col("n_target_chars"),
        posexplode(col("spans")).as(Seq("span_ix", "sp")))
      .select(col("conv"), col("text"), col("n_turns"),
        col("n_target_chars"), col("span_ix"),
        col("sp.s").as("s"), col("sp.e").as("e"),
        expr("substring(text, sp.s + 1, sp.e - sp.s)").as("span_text"))
}
