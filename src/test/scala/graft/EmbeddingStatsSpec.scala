package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.EmbeddingStats

class EmbeddingStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("covarianceMatrix matches the hand-computed population covariance") {
    val vecs = Seq(
      Array(1.0, 2.0, 0.0), Array(3.0, 0.0, 1.0), Array(5.0, 4.0, 2.0))
      .map(Tuple1(_)).toDF("embedding")
    val got = EmbeddingStats.covarianceMatrix(vecs, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // hand-computed: means (3, 2, 1); population covariance
    val data = Seq(Seq(1.0, 2.0, 0.0), Seq(3.0, 0.0, 1.0), Seq(5.0, 4.0, 2.0))
    val mu = Seq(3.0, 2.0, 1.0)
    for (i <- 0 until 3; j <- 0 until 3) {
      val exp = data.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / 3.0
      assert(math.abs(got((i, j)) - exp) < 1e-12,
        s"cov($i,$j) ${got((i, j))} != $exp")
      assert(got((i, j)) == got((j, i)), "covariance must be symmetric")
    }
  }

  test("covarianceMatrixExact: integer scatter ties out against the " +
      "double covariance and is invariant to partitioning") {
    // float32-lattice fixture (the embeddings table is FLOAT[]): values
    // are exact in both float and double, like the real data
    val data = (0 until 97).map { r =>
      Array.tabulate(5)(i =>
        math.floor(math.sin(r * 2.13 + i * 1.7) * 4096.0) / 8192.0)
    }
    val df = data.map(Tuple1(_)).toDF("embedding")
    val s = 20
    val exact = EmbeddingStats.covarianceMatrixExact(df, "embedding", s)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val dbl = EmbeddingStats.covarianceMatrix(df, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val n = data.length.toDouble
    val denom = n * n * math.pow(2.0, 2 * s)
    // m2/(n^2 * 2^2s) is the covariance of the QUANTIZED data: within
    // lattice-resolution error of the double-path covariance
    for (((i, j), m2) <- exact) {
      assert(math.abs(m2 / denom - dbl((i, j))) < 1e-5,
        s"exact/double mismatch at ($i,$j): ${m2 / denom} vs ${dbl((i, j))}")
    }
    // the property q146 buys: identical Longs under ANY merge order
    for (p <- Seq(1, 7, 32)) {
      val re = EmbeddingStats.covarianceMatrixExact(
        df.repartition(p), "embedding", s)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(re == exact, s"partitioning $p changed the exact scatter")
    }
  }

  test("symmetricEigen: exact 2x2 case, orthonormality, eigen residual") {
    // rotate diag(3, 1) by 45 degrees: [[2, 1], [1, 2]]
    val (vals, vecs) = EmbeddingStats.symmetricEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-10 && math.abs(vals(1) - 1.0) < 1e-10,
      s"eigenvalues ${vals.toSeq}")
    val s = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(s, s)).forall { case (a, b) =>
      math.abs(a - b) < 1e-10 }, s"${vecs(0).toSeq}")
    // residual ||A v - lambda v|| on a bigger random-ish symmetric matrix
    val d = 12
    val m = Array.tabulate(d, d) { (i, j) =>
      val x = math.sin(i * 7 + j * 3) + (if (i == j) d.toDouble else 0.0)
      x
    }
    val sym = Array.tabulate(d, d)((i, j) => 0.5 * (m(i)(j) + m(j)(i)))
    val (ev, evec) = EmbeddingStats.symmetricEigen(sym)
    for (k <- 0 until d) {
      val av = Array.tabulate(d)(i =>
        (0 until d).map(j => sym(i)(j) * evec(k)(j)).sum)
      val res = math.sqrt(av.zip(evec(k))
        .map { case (a, b) => (a - ev(k) * b) * (a - ev(k) * b) }.sum)
      assert(res < 1e-9, s"eigen residual $res at $k")
      for (l <- k + 1 until d) {
        val dot = evec(k).zip(evec(l)).map { case (a, b) => a * b }.sum
        assert(math.abs(dot) < 1e-9, s"eigenvectors $k,$l not orthogonal")
      }
    }
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b - 1e-12 },
      "eigenvalues must be sorted descending")
  }

  test("OPQ-lite payoff: PCA rotation before the PQ subspace split cuts " +
      "quantization error on cross-subspace-correlated data") {
    import graft.operators.Similarity
    import org.apache.spark.sql.DataFrame
    // variance lives in 2 directions SPREAD ACROSS ALL 16 dims (so every
    // raw 4-dim subspace sees mixed signal), plus tiny noise
    val d = 16
    val m = 4
    def normalize(a: Array[Double]) = {
      val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n)
    }
    val dir1 = normalize(Array.tabulate(d)(i => math.sin(i * 1.7 + 0.5)))
    val dir2 = normalize(Array.tabulate(d)(i => math.cos(i * 2.9 + 1.1)))
    val data = (0 until 300).map { r =>
      val a = math.sin(r * 2.13) * 10.0
      val b = math.cos(r * 1.37) * 4.0
      Array.tabulate(d)(i =>
        a * dir1(i) + b * dir2(i) + 0.02 * math.sin(r * 7 + i * 3))
    }
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    def pqMse(frame: DataFrame): Double = {
      val donors = Similarity.pqSubspaceCodebooks(frame, "vec_id",
        "embedding", m, nCodes = 8)
      val dmap = donors.toMap
      val sub = d / m
      val vecs = frame.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val codes = Similarity.pqEncode(frame, "vec_id", "embedding",
        donors, m).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      codes.map { case (id, cs) =>
        val v = vecs(id)
        cs.zipWithIndex.map { case (c, j) =>
          val dv = dmap(c)
          (0 until sub).map { i =>
            val t = v(j * sub + i) - dv(j * sub + i); t * t
          }.sum
        }.sum
      }.sum / codes.size
    }
    val cov = EmbeddingStats.covarianceMatrix(df, "embedding")
    val balanced = EmbeddingStats.opqRotation(cov, m)
    val rotated = df.select(col("vec_id"),
      EmbeddingStats.applyRotation(col("embedding"), balanced)
        .as("embedding"))
    val rawErr = pqMse(df)
    val rotErr = pqMse(rotated)
    assert(rotErr < 0.6 * rawErr,
      s"eigenvalue-allocated rotation must cut PQ error: raw $rawErr " +
        s"vs rotated $rotErr")
    // and the NAIVE PCA ordering is the cautionary tale: concentrating
    // all variance into subspace 0's few cells does NOT beat raw
    val naive = df.select(col("vec_id"),
      EmbeddingStats.applyRotation(col("embedding"),
        EmbeddingStats.pcaRotation(cov, d)).as("embedding"))
    assert(pqMse(naive) > rotErr,
      "balanced allocation must beat plain-PCA ordering for PQ")
  }

  test("opqTrain: alternate optimization cuts reconstruction error " +
      "beyond the eigenvalue-allocation init; rotation stays orthonormal; " +
      "deterministic") {
    // cross-correlated data rich enough that the eigenvalue-allocation
    // init is measurably suboptimal: six non-orthogonal spread
    // directions with graded scales, all smeared across every raw (and
    // every PCA-rotated) subspace
    val d = 16
    val m = 4
    def normalize(a: Array[Double]) = {
      val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n)
    }
    val dirs = (0 until 6).map(k =>
      normalize(Array.tabulate(d)(i => math.sin(i * (1.3 + k * 0.7) + k))))
    val scales = Array(10.0, 7.0, 5.0, 3.5, 2.5, 1.8)
    val data = (0 until 400).map { r =>
      Array.tabulate(d) { i =>
        var s = 0.02 * math.sin(r * 7 + i * 3)
        for (k <- 0 until 6)
          s += math.sin(r * (2.13 + k * 0.41) + k * k) * scales(k) * dirs(k)(i)
        s
      }
    }
    val df = data.map(Tuple1(_)).toDF("embedding")
    // iters=1 IS init-only: codebooks trained once in the init-rotated
    // space, no Procrustes update ever applied
    val init = EmbeddingStats.opqTrain(df, "embedding", m, nCodes = 8,
      iters = 1)
    val trained = EmbeddingStats.opqTrain(df, "embedding", m, nCodes = 8,
      iters = 8)
    // measured ~4.6% additional cut on this fixture — the modest-but-
    // real margin the OPQ paper reports for alternate optimization over
    // a good allocation init; the bar asserts >= 3%
    assert(trained.mse < 0.97 * init.mse,
      s"alternate optimization must cut error: init ${init.mse} vs " +
        s"trained ${trained.mse}")
    // orthonormality: R·Rᵀ = I within numerical tolerance
    val r = trained.rotation
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8,
        s"R rows $i,$j not orthonormal: $dot")
    }
    // no RNG anywhere: retraining reproduces the model exactly
    val again = EmbeddingStats.opqTrain(df, "embedding", m, nCodes = 8,
      iters = 8)
    assert(again.mse == trained.mse &&
      again.rotation.flatten.toSeq == trained.rotation.flatten.toSeq,
      "opqTrain must be deterministic")
    // and the Hadamard block stand-in is exactly orthonormal
    val h = EmbeddingStats.hadamardBlockRotation(16)
    for (i <- 0 until 16; j <- 0 until 16) {
      val dot = (0 until 16).map(k => h(i)(k) * h(j)(k)).sum
      assert(dot == (if (i == j) 1.0 else 0.0), s"H rows $i,$j: $dot")
    }
  }

  test("PCA pipeline: planted dominant direction recovered; rotation " +
      "preserves distances; top component captures the variance") {
    // 200 vectors in 16 dims: big variance along a planted unit
    // direction u, small isotropic noise elsewhere (deterministic)
    val d = 16
    val u = Array.tabulate(d)(i => math.sin(i * 1.7) + 0.3)
    val un = { val n = math.sqrt(u.map(x => x * x).sum); u.map(_ / n) }
    val data = (0 until 200).map { r =>
      val t = math.sin(r * 2.13) * 10.0 // spread along u
      Array.tabulate(d)(i => t * un(i) + 0.05 * math.cos(r * 3 + i * 5))
    }
    val df = data.map(Tuple1(_)).toDF("embedding")
    val cov = EmbeddingStats.covarianceMatrix(df, "embedding")
    val rot = EmbeddingStats.pcaRotation(cov, d)
    // top eigenvector aligns with the planted direction
    val cosTop = math.abs(rot(0).zip(un).map { case (a, b) => a * b }.sum)
    assert(cosTop > 0.99, s"top PC must align with planted direction: $cosTop")
    // full-rank rotation preserves pairwise distances (orthonormal)
    val y = data.map(v => rot.map(row =>
      row.zip(v).map { case (a, b) => a * b }.sum))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, z) => (x - z) * (x - z) }.sum
    for (Seq(i, j) <- Seq(Seq(0, 50), Seq(10, 150), Seq(3, 199))) {
      val before = d2(data(i), data(j))
      val after = d2(y(i), y(j))
      assert(math.abs(before - after) < 1e-9 * (1 + before),
        s"rotation must preserve distances: $before vs $after")
    }
    // top-1 projection captures nearly all variance
    val varTotal = y.head.indices.map { k =>
      val col = y.map(_(k)); val m = col.sum / col.length
      col.map(x => (x - m) * (x - m)).sum / col.length
    }
    assert(varTotal(0) / varTotal.sum > 0.95,
      s"top PC variance share ${varTotal(0) / varTotal.sum}")
  }
}
