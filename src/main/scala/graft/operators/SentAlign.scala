package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sentence alignment for parallel corpora — the Gale–Church dynamic
  * program (Gale & Church 1993, "A Program for Aligning Sentences in
  * Bilingual Corpora") on an exact integer cost lattice: bead types
  * 1:1, 1:0, 0:1, 2:1, 1:2, 2:2 with the paper's type penalties
  * (0 / 450 / 450 / 230 / 230 / 440) and, in place of the paper's
  * Gaussian length-delta term, `10·|Σlen_A − Σlen_B|` over the bead's
  * consumed sentence lengths — integer-exact, so the oracle can derive
  * the optimal alignment independently and the hashes must meet.
  *
  * Tie-break: at each DP cell the FIRST minimal move in the fixed
  * order (1:1, 1:0, 0:1, 2:1, 1:2, 2:2) wins, making the argmin PATH
  * (not just its cost) deterministic.
  *
  * Scale shape: the DP is per-document-pair local (sentences per
  * document are bounded — `maxSents` guards the quadratic table
  * loudly); document pairing is one equi-join; nothing global. This is
  * the bitext-mining complement: [[Similarity.bitextMine]] pairs
  * DOCUMENTS by embedding margin, this aligns SENTENCES inside each
  * pair.
  */
object SentAlign {

  private val Moves: Array[(Int, Int, Long)] = Array(
    (1, 1, 0L), (1, 0, 450L), (0, 1, 450L),
    (2, 1, 230L), (1, 2, 230L), (2, 2, 440L))

  /** Align two sentence relations `(doc, ix, len)` per document.
    * Output: one row per bead, in order — `(doc, bead_ix, a_from, n_a,
    * b_from, n_b, bead, cost)` with `a_from`/`b_from` the first
    * consumed sentence index on each side (the side's current cursor
    * when the bead consumes nothing) and `bead` the `di:dj` label.
    * Documents must appear on both sides (inner join — pair upstream).
    */
  def galeChurch(a: DataFrame, b: DataFrame, docCol: String,
      ixCol: String, lenCol: String, maxSents: Int = 512): DataFrame = {
    def side(df: DataFrame, out: String) =
      df.groupBy(col(docCol).cast("long").as("doc"))
        .agg(transform(
          sort_array(collect_list(struct(col(ixCol).cast("int").as("ix"),
            col(lenCol).cast("long").as("len")))),
          s => s.getField("len")).as(out))
    val dpUdf = udf { (sa: Seq[Long], sb: Seq[Long]) =>
      val n = sa.length; val m = sb.length
      require(n <= maxSents && m <= maxSents,
        s"document with > $maxSents sentences — chunk upstream")
      val pa = sa.scanLeft(0L)(_ + _).toArray // prefix sums
      val pb = sb.scanLeft(0L)(_ + _).toArray
      val Inf = Long.MaxValue / 4
      val d = Array.fill(n + 1, m + 1)(Inf)
      val bk = Array.fill(n + 1, m + 1)(-1)
      d(0)(0) = 0L
      var i = 0
      while (i <= n) {
        var j = 0
        while (j <= m) {
          if (!(i == 0 && j == 0)) {
            var mi = 0
            while (mi < Moves.length) {
              val (di, dj, pen) = Moves(mi)
              if (i - di >= 0 && j - dj >= 0 && d(i - di)(j - dj) < Inf) {
                val la = pa(i) - pa(i - di)
                val lb = pb(j) - pb(j - dj)
                val c = d(i - di)(j - dj) + pen + 10L * math.abs(la - lb)
                if (c < d(i)(j)) { d(i)(j) = c; bk(i)(j) = mi }
              }
              mi += 1
            }
          }
          j += 1
        }
        i += 1
      }
      // backtrace, then reverse into bead order
      var beads = List.empty[(Int, Int, Int, Int, String, Long)]
      var ci = n; var cj = m
      while (ci > 0 || cj > 0) {
        val mi = bk(ci)(cj)
        val (di, dj, pen) = Moves(mi)
        val la = pa(ci) - pa(ci - di)
        val lb = pb(cj) - pb(cj - dj)
        beads = ((ci - di, di, cj - dj, dj, s"$di:$dj",
          pen + 10L * math.abs(la - lb))) :: beads
        ci -= di; cj -= dj
      }
      beads.zipWithIndex.map { case ((af, na, bf, nb, t, c), ix) =>
        (ix, af, na, bf, nb, t, c) }
    }
    side(a, "sa").join(side(b, "sb"), Seq("doc"))
      .select(col("doc"), explode(dpUdf(col("sa"), col("sb"))).as("x"))
      .select(col("doc").as(docCol), col("x._1").as("bead_ix"),
        col("x._2").as("a_from"), col("x._3").as("n_a"),
        col("x._4").as("b_from"), col("x._5").as("n_b"),
        col("x._6").as("bead"), col("x._7").as("cost"))
  }
}
