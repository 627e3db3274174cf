package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns
import graft.operators.ContentChunks

class ContentChunksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 3
  private val DV = 32

  /** Independent reimplementation of the CDC definition for oracle-style
    * cross-checks (straight from the scaladoc, not the kernel).
    */
  private def cdcRef(toks: Seq[String]): Seq[(Int, Int, Long)] = {
    if (toks.isEmpty) return Nil
    val starts = 0 +: (1 to toks.length - N).filter(p =>
      TextFns.polyHash(toks.slice(p, p + N).mkString(" ")) % DV == 0)
    starts.zipWithIndex.map { case (s, i) =>
      val e = if (i + 1 < starts.length) starts(i + 1) else toks.length
      (s, e, TextFns.polyHash(toks.slice(s, e).mkString(" ")))
    }
  }

  test("cdcChunks matches the definitional reimplementation on varied docs") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again and " +
        "again until the fox is tired of jumping over anything at all",
      "a b", "single", "x " * 200)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = ContentChunks.cdcChunks(docs, "doc_id", "text", N, DV)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    val want = texts.zipWithIndex.flatMap { case (t, i) =>
      cdcRef(t.trim.toLowerCase.split("\\s+").toSeq)
        .map { case (s, e, h) => (i.toLong, s, e, h) }
    }.toSet
    assert(got == want)
  }

  test("CDC is shift-resistant: prefix insertion preserves tail chunks") {
    val body = (1 to 300).map(j => s"tok${j % 45}w").mkString(" ")
    val docs = Seq((1L, body), (2L, "zzz qqq inserted prefix words " + body))
      .toDF("doc_id", "text")
    val chunks = ContentChunks.cdcChunks(docs, "doc_id", "text", N, DV)
    val byDoc = chunks.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(4)).toSet).toMap
    val shared = byDoc(1L) intersect byDoc(2L)
    // whole-doc hashing shares nothing; CDC re-synchronizes after the
    // first content-defined boundary past the insertion
    assert(shared.nonEmpty,
      s"no shared chunk hashes after prefix shift: ${byDoc.view.mapValues(_.size).toMap}")
    val dup = ContentChunks.cdcSharedChunks(chunks).collect()
    assert(dup.map(_.getLong(0)).toSet == shared)
  }

  /** Definitional bounded CDC (straight from the FastCDC rule). */
  private def cdcBoundedRef(toks: Seq[String], n: Int, dv: Int, mn: Int,
      mx: Int): Seq[(Int, Int)] = {
    if (toks.isEmpty) return Nil
    val len = toks.length
    val out = Seq.newBuilder[(Int, Int)]
    var s = 0
    while (s < len) {
      val cands = (s + mn) to math.min(s + mx, len - n)
      val hit = cands.find(p =>
        TextFns.polyHash(toks.slice(p, p + n).mkString(" ")) % dv == 0)
      val e = hit.getOrElse(if (s + mx < len) s + mx else len)
      out += ((s, e)); s = e
    }
    out.result()
  }

  test("cdcChunksBounded matches the definitional rule; bounds hold") {
    val texts = Seq(
      (1 to 300).map(j => s"tok${(j * 11) % 37}").mkString(" "),
      "a b", "x " * 500, (1 to 70).map(j => s"v$j").mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = ContentChunks.cdcChunksBounded(docs, "doc_id", "text",
        N, DV, 8, 64)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSet
    val want = texts.zipWithIndex.flatMap { case (t, i) =>
      cdcBoundedRef(t.trim.toLowerCase.split("\\s+").toSeq, N, DV, 8, 64)
        .map { case (s, e) => (i.toLong, s, e) }
    }.toSet
    assert(got == want)
    // bounds: every chunk <= 64; every non-terminal chunk >= 8
    val byDoc = got.groupBy(_._1)
    byDoc.values.foreach { cs =>
      val maxEnd = cs.map(_._3).max
      cs.foreach { case (_, s, e) =>
        assert(e - s <= 64)
        if (e != maxEnd) assert(e - s >= 8, s"mid-doc chunk [$s,$e)")
      }
    }
  }

  /** Definitional winnowing (windows + rightmost min + dedup). */
  private def winnowRef(toks: Seq[String], k: Int, w: Int): Set[(Int, Long)] = {
    if (toks.isEmpty) return Set.empty
    val hs = if (toks.length < k) Seq(TextFns.polyHash(toks.mkString(" ")))
      else (0 to toks.length - k).map(p =>
        TextFns.polyHash(toks.slice(p, p + k).mkString(" ")))
    val m = hs.length
    val wins = if (m <= w) Seq(0 until m)
      else (0 to m - w).map(s => s until s + w)
    wins.map { r =>
      val mn = r.map(hs).min
      val pos = r.filter(i => hs(i) == mn).max // rightmost minimum
      (pos, mn)
    }.toSet
  }

  test("winnowFingerprints matches the definitional reimplementation") {
    val texts = Seq(
      (1 to 80).map(j => s"w${(j * 7) % 23}").mkString(" "),
      "short doc", "a b c d e f", "one")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = ContentChunks.winnowFingerprints(docs, "doc_id", "text", 3, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = texts.zipWithIndex.flatMap { case (t, i) =>
      winnowRef(t.trim.toLowerCase.split("\\s+").toSeq, 3, 4)
        .map { case (p, h) => (i.toLong, p, h) }
    }.toSet
    assert(got == want)
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 substring share a " +
      "fingerprint, and winnowShared reports it") {
    val common = (1 to 12).map(j => s"shared$j").mkString(" ") // 12 = 8+5-1
    val docs = Seq(
      (1L, "alpha beta gamma " + common + " delta epsilon zeta eta theta"),
      (2L, "completely different front material here " + common))
      .toDF("doc_id", "text")
    val fps = ContentChunks.winnowFingerprints(docs, "doc_id", "text", 5, 8)
    val shared = ContentChunks.winnowShared(fps).collect()
    assert(shared.nonEmpty, "guaranteed shared fingerprint missing")
    assert(shared.forall(r => r.getLong(1) == 2L))
  }

  test("fingerprint density: selections per doc <= window count") {
    val doc = Seq((1L, (1 to 200).map(j => s"t${(j * 13) % 97}")
      .mkString(" "))).toDF("doc_id", "text")
    val n = ContentChunks.winnowFingerprints(doc, "doc_id", "text", 5, 8)
      .count()
    // m = 196 grams, 189 windows; dedup must compress far below that
    assert(n <= 189 && n >= 196 / 8,
      s"fingerprint count $n outside plausible density bounds")
  }

  test("winnowDupCoverage marks only cross-doc duplication and islands-" +
      "merges coverage") {
    val common = (1 to 30).map(j => s"shr$j").mkString(" ")
    val selfRep = (1 to 3).flatMap(_ => (1 to 15).map(j => s"rep$j"))
      .mkString(" ") // within-doc repetition only — must NOT mark
    val docs = Seq(
      (1L, "aaa bbb ccc " + common + " ddd eee fff ggg hhh iii jjj"),
      (2L, "front matter words quite different here then " + common),
      (3L, selfRep),
      (4L, "totally unrelated content with unique tokens only"),
      (5L, null.asInstanceOf[String]),
      (6L, "   "))
      .toDF("doc_id", "text")
    val got = ContentChunks.winnowDupCoverage(docs, "doc_id", "text",
      k = 5, w = 8, minDocs = 2, maxNum = 1L, maxDen = 5L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // docs 1 and 2 share a 30-token run >= w+k-1=12: both must have
    // nonzero dup coverage and (30-token dup vs ~45-token doc) be cut
    assert(got(1L)._3 > 0 && got(2L)._3 > 0)
    assert(got(1L)._4 == 0L && got(2L)._4 == 0L,
      s"heavily duplicated docs must be cut: ${got(1L)}, ${got(2L)}")
    // self-repetition and unique docs: zero cross-doc coverage, kept
    assert(got(3L)._3 == 0L && got(3L)._4 == 1L)
    assert(got(4L) == ((7L, 0L, 0L, 1L)))
    // null/blank: zero tokens, kept
    assert(got(5L) == ((0L, 0L, 0L, 1L)))
    assert(got(6L) == ((0L, 0L, 0L, 1L)))
    // coverage is islands-merged: dup_tokens never exceeds n_tokens
    assert(got.values.forall { case (n, _, d, _) => d <= n })
  }

  test("winnowDupRemove cuts exactly the cross-doc spans, keeps original " +
      "case and order; null/blank/unique docs pass through") {
    val common = (1 to 30).map(j => s"shr$j").mkString(" ")
    val docs = Seq(
      (1L, "AAA bbb CCC " + common + " ddd EEE"),
      (2L, "front matter words quite different here then " + common),
      (4L, "Totally Unrelated content with unique tokens only"),
      (5L, null.asInstanceOf[String]),
      (6L, "   "))
      .toDF("doc_id", "text")
    val got = ContentChunks.winnowDupRemove(docs, "doc_id", "text",
      k = 5, w = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3)))).toMap
    // the cleaned docs must cut EXACTLY the sampled coverage spans
    // (winnowing samples ~1/(w+1) of windows, so not every shared token
    // is covered — that is q165's documented sampled-tier semantics),
    // keeping the rest in original case/order
    val (c1, n1, d1) = got(1L)
    def nShr(t: String) = t.split("\\s+").count(_.startsWith("shr"))
    assert(nShr(c1.get) < 30 && d1 > 0L, s"some shared tokens cut: $c1")
    assert(c1.get.startsWith("AAA bbb CCC"), c1.toString)
    assert(n1 == 35L)
    val (c2, _, d2) = got(2L)
    assert(nShr(c2.get) < 30 && c2.get.startsWith("front matter"),
      c2.toString)
    assert(d2 > 0L)
    // consistency with the measuring operator: dup_tokens match
    val cov = ContentChunks.winnowDupCoverage(docs, "doc_id", "text",
      k = 5, w = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.view.mapValues(_._3).toMap == cov)
    // cleaned token count + dup span length == original token count
    assert(c1.get.split("\\s+").count(_.nonEmpty) + d1 == n1)
    // untouched docs: unchanged text modulo whitespace normalization
    assert(got(4L)._1.get == "Totally Unrelated content with unique tokens only")
    assert(got(5L)._1.isEmpty && got(5L)._2 == 0L)
    assert(got(6L)._1.get == "" && got(6L)._2 == 0L)
  }

  test("pairSourceMatrix counts unordered labeled pairs") {
    import graft.operators.Dedup
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("doc_id", "source").withColumnRenamed("source", "src")
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 1L), (2L, 4L), (9L, 1L))
      .toDF("id1", "id2") // (9,_) has no label -> dropped
    val got = Dedup.pairSourceMatrix(pairs, docs, "doc_id", "src")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("a", "a") -> 1L, ("a", "b") -> 2L, ("a", "c") -> 1L))
  }

  test("pairSourceMatrix drops pairs with a null source label (no " +
      "silent diagonal inflation)") {
    import graft.operators.Dedup
    val docs = Seq((1L, Some("a")), (2L, None), (3L, Some("a")))
      .toDF("doc_id", "src")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id1", "id2")
    val got = Dedup.pairSourceMatrix(pairs, docs, "doc_id", "src")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // (1,2) and (2,3) carry a null label and must NOT count as (a, a)
    assert(got == Map(("a", "a") -> 1L))
  }
}
