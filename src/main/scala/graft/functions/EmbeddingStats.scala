package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding-space second-order statistics: distributed covariance, a
  * driver-side symmetric eigensolver, and the OPQ-initialization
  * rotation for product quantization — decorrelate via PCA, then
  * PERMUTE the eigen-directions so each PQ subspace receives balanced
  * variance (the eigenvalue allocation of Ge et al. 2013; plain PCA
  * ordering is spec-demonstrated to HURT PQ). Also the basis for
  * variance telemetry over an embedding column.
  *
  * Scale shape: covariance is ONE pass with a mergeable Aggregator
  * whose buffer is (n, Σx, upper-triangle Σxxᵀ) — d(d+3)/2 + 1 doubles,
  * partial-aggregated map-side, so a 100 TB corpus shuffles exactly one
  * ~16 KB buffer per task. d is driver-bounded (≤ 256) by contract:
  * the d×d matrix is eigen-decomposed ON THE DRIVER (cyclic Jacobi),
  * and the rotation is closure-captured back into a map-side kernel,
  * exactly the codebook discipline the PQ layer uses.
  */
object EmbeddingStats {

  /** Mergeable covariance buffer: [n, sx(d), sxx upper triangle]. */
  private class CovAgg(d: Int)
      extends Aggregator[Seq[Double], Array[Double], Array[Double]]
      with Serializable {
    private val len = 1 + d + d * (d + 1) / 2
    override def zero: Array[Double] = new Array[Double](len)
    override def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] = {
      require(v.length == d,
        s"covarianceMatrix: vector of dim ${v.length}, expected $d")
      buf(0) += 1.0
      var i = 0
      var t = 1 + d
      while (i < d) {
        val vi = v(i)
        buf(1 + i) += vi
        var j = i
        while (j < d) { buf(t) += vi * v(j); t += 1; j += 1 }
        i += 1
      }
      buf
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Double]): Array[Double] = buf
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Covariance matrix of a vector column as an (i, j, cov) relation
    * (full symmetric, d² rows — driver-sized by the d ≤ 256 contract).
    * cov(i,j) = Σxy/n − (Σx/n)(Σy/n), population normalization (÷ n),
    * matching a SQL oracle's `avg(v[i]·v[j]) − avg(v[i])·avg(v[j])`.
    */
  def covarianceMatrix(vecs: DataFrame, vecCol: String): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val clean = vecs.filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as("__v"))
    val first = clean.limit(1).collect()
    require(first.nonEmpty, "covarianceMatrix: empty input")
    val d = first(0).getSeq[Double](0).length
    require(d >= 1 && d <= 256,
      s"covarianceMatrix dim $d must be in [1, 256] — the matrix is " +
        "driver-decomposed by contract; reduce dimensionality first")
    val buf = clean.as[Seq[Double]]
      .select(udaf(new CovAgg(d),
        implicitly[Encoder[Seq[Double]]])(col("__v")).as("b"))
      .collect()(0).getSeq[Double](0)
    val n = buf(0)
    require(n > 0, "covarianceMatrix: no non-null vectors")
    val rows = for {
      i <- 0 until d
      j <- 0 until d
    } yield {
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      // upper-triangle offset of (lo, hi): rows 0..lo-1 contribute
      // (d - r) entries each
      val off = 1 + d + (lo * d - lo * (lo - 1) / 2) + (hi - lo)
      val cov = buf(off) / n - (buf(1 + i) / n) * (buf(1 + j) / n)
      (i, j, cov)
    }
    rows.toDF("i", "j", "cov")
  }

  /** Exact-integer covariance buffer over lattice-quantized entries:
    * [n, sx(d), sxy upper triangle], all Long. Integer addition is
    * associative, so the merged result is IDENTICAL under any partial-
    * merge order — the property the double-buffer [[CovAgg]] lacks.
    */
  private class CovAggExact(d: Int, scale: Double)
      extends Aggregator[Seq[Double], Array[Long], Array[Long]]
      with Serializable {
    private val len = 1 + d + d * (d + 1) / 2
    override def zero: Array[Long] = new Array[Long](len)
    override def reduce(buf: Array[Long], v: Seq[Double]): Array[Long] = {
      require(v.length == d,
        s"covarianceMatrixExact: vector of dim ${v.length}, expected $d")
      buf(0) += 1L
      var i = 0
      var t = 1 + d
      while (i < d) {
        val qi = math.floor(v(i) * scale + 0.5).toLong
        buf(1 + i) += qi
        var j = i
        while (j < d) {
          buf(t) += qi * math.floor(v(j) * scale + 0.5).toLong
          t += 1; j += 1
        }
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Cross-engine-EXACT covariance comparison form: quantize each entry
    * to the dyadic lattice q = floor(v·2^scaleBits + 0.5) (exact in
    * double arithmetic for float32-sourced embeddings, and half-up
    * identically in Spark and DuckDB), then emit the scatter statistic
    * m2(i,j) = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ as a BIGINT relation (i, j, m2),
    * upper triangle. Every quantity is an integer sum, so the value is
    * independent of partitioning, scheduling, and partial-merge order —
    * unlike [[covarianceMatrix]]'s double fold, whose last-ulp depends
    * on which task merges first. m2/(n²·2^(2·scaleBits)) recovers the
    * population covariance of the quantized data.
    *
    * Same scale shape as [[covarianceMatrix]]: ONE mergeable-Aggregator
    * pass, one ~16 KB Long buffer shuffled per task, d ≤ 256 driver
    * contract. Overflow discipline: per-row products are bounded by
    * 2^(2·scaleBits)·max|v|²; accumulation uses Math.addExact so an
    * overflow fails loudly instead of wrapping. With scaleBits = 20 and
    * unit-norm-ish embeddings (|v| ≤ 1) the Σ terms stay exact up to
    * n ≈ 2^22 rows per final buffer and the n·Σ combination (done in
    * BigInt, range-checked) up to the Long range — pick a smaller
    * scaleBits for larger corpora.
    */
  def covarianceMatrixExact(vecs: DataFrame, vecCol: String,
      scaleBits: Int = 20): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 30,
      s"covarianceMatrixExact scaleBits $scaleBits must be in [1, 30]")
    val spark = vecs.sparkSession
    import spark.implicits._
    val clean = vecs.filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as("__v"))
    val first = clean.limit(1).collect()
    require(first.nonEmpty, "covarianceMatrixExact: empty input")
    val d = first(0).getSeq[Double](0).length
    require(d >= 1 && d <= 256,
      s"covarianceMatrixExact dim $d must be in [1, 256]")
    val scale = math.pow(2.0, scaleBits)
    val buf = clean.as[Seq[Double]]
      .select(udaf(new CovAggExact(d, scale),
        implicitly[Encoder[Seq[Double]]])(col("__v")).as("b"))
      .collect()(0).getSeq[Long](0)
    val n = buf(0)
    require(n > 0, "covarianceMatrixExact: no non-null vectors")
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield {
      val off = 1 + d + (i * d - i * (i - 1) / 2) + (j - i)
      val m2 = BigInt(n) * BigInt(buf(off)) -
        BigInt(buf(1 + i)) * BigInt(buf(1 + j))
      require(m2.isValidLong,
        s"covarianceMatrixExact: m2($i,$j) exceeds Int64 — lower scaleBits")
      (i, j, m2.toLong)
    }
    rows.toDF("i", "j", "m2")
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (driver-
    * side, d ≤ 256): returns (eigenvalues, eigenvectors-as-rows), both
    * sorted by eigenvalue DESCENDING, each eigenvector sign-normalized
    * (first nonzero component positive) so the output is deterministic.
    */
  def symmetricEigen(m: Array[Array[Double]],
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > 1e-12) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val ev = Array.tabulate(d)(k => v(k)(i))
      val lead = ev.find(math.abs(_) > 1e-12).getOrElse(1.0)
      if (lead < 0) ev.map(-_) else ev
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  /** PCA rotation learned from a covariance relation ((i, j, cov) as
    * produced by [[covarianceMatrix]]): the top-`k` eigenvectors as
    * rows. Feed the result to [[applyRotation]] before a PQ subspace
    * split (OPQ-lite) or use the eigenvalue spectrum as variance
    * telemetry.
    */
  def pcaRotation(cov: DataFrame, k: Int): Array[Array[Double]] = {
    val entries = cov.select(col("i").cast("int"), col("j").cast("int"),
      col("cov").cast("double")).collect()
    val d = entries.map(_.getInt(0)).max + 1
    require(k >= 1 && k <= d, s"pcaRotation k $k must be in [1, $d]")
    val m = Array.ofDim[Double](d, d)
    entries.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    symmetricEigen(m)._2.take(k)
  }

  /** OPQ initialization rotation (the eigenvalue allocation of Ge et
    * al. 2013): PCA directions PERMUTED so each of the `m` PQ subspaces
    * receives balanced variance — greedy assignment, largest eigenvalue
    * first, to the subspace with the smallest current log-variance sum
    * that still has a free slot. Plain PCA ordering is actively HARMFUL
    * for PQ (spec-demonstrated: it concentrates the whole signal
    * manifold into subspace 0's few cells while the rest quantize
    * noise); the balanced permutation is what cuts quantization error.
    * Rows are ordered so rows [j·d/m, (j+1)·d/m) form subspace j.
    */
  def opqRotation(cov: DataFrame, m: Int): Array[Array[Double]] = {
    val entries = cov.select(col("i").cast("int"), col("j").cast("int"),
      col("cov").cast("double")).collect()
    val d = entries.map(_.getInt(0)).max + 1
    require(m >= 1 && d % m == 0,
      s"opqRotation: m=$m must divide dim=$d")
    val mat = Array.ofDim[Double](d, d)
    entries.foreach(r => mat(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val (vals, vecs) = symmetricEigen(mat)
    val slots = d / m
    val logSum = Array.fill(m)(0.0)
    val used = Array.fill(m)(0)
    val buckets = Array.fill(m)(List.empty[Int])
    (0 until d).foreach { e =>
      val g = (0 until m).filter(used(_) < slots).minBy(logSum(_))
      buckets(g) = buckets(g) :+ e
      used(g) += 1
      logSum(g) += math.log(math.max(vals(e), 1e-12))
    }
    buckets.flatMap(_.map(vecs(_)))
  }

  /** Dyadic-exact orthonormal rotation: a block-diagonal tiling of the
    * 4×4 scaled Walsh–Hadamard matrix H₄/2 (entries ±0.5, sign
    * (−1)^popcount(r AND c)). Every entry is a power of two, so
    * rotating float32-sourced vectors is EXACT double arithmetic — an
    * independent SQL engine reproduces the rotated values bit-for-bit.
    * Orthonormal (H₄·H₄ᵀ = 4·I), so L2 geometry is preserved. This is
    * the cross-engine-testable stand-in that lets an oracle-gated query
    * pin the ROTATION-PERSISTENCE machinery of the IVF-PQ index (the
    * learned [[opqTrain]] rotation uses the same machinery but has no
    * SQL-expressible derivation).
    */
  def hadamardBlockRotation(d: Int): Array[Array[Double]] = {
    require(d % 4 == 0, s"hadamardBlockRotation: d=$d must be a multiple of 4")
    Array.tabulate(d, d) { (i, j) =>
      if (i / 4 != j / 4) 0.0
      else if (Integer.bitCount((i % 4) & (j % 4)) % 2 == 0) 0.5
      else -0.5
    }
  }

  /** Trained OPQ model: `rotation` rows are the output basis (y = R·x);
    * `codebooks(j)(c)` is codeword c of subspace j (each of length
    * d/m); `mse` is the final mean reconstruction error on the training
    * sample.
    */
  final case class OpqModel(rotation: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], mse: Double)

  /** FULL OPQ alternate optimization (Ge et al. 2013, the non-parametric
    * algorithm the eigenvalue-allocation [[opqRotation]] only
    * initializes): iterate
    *
    *  1. fix R, train per-subspace codebooks on the rotated sample
    *     (Lloyd's k-means, deterministic Gonzalez farthest-point init,
    *     empty clusters reseeded to the farthest point);
    *  2. fix the codebooks, rebuild each point's reconstruction ŷ and
    *     update R by the orthogonal Procrustes solution: with
    *     M = Ŷ·Xᵀ = U·S·Vᵀ, the minimizer of ‖R·X − Ŷ‖_F over
    *     orthogonal R is R = U·Vᵀ (SVD via [[symmetricEigen]] of MᵀM;
    *     rank-deficient directions completed by Gram–Schmidt).
    *
    * DRIVER-SIDE on a bounded training sample (`maxRows` — the standard
    * OPQ practice: FAISS trains its OPQ matrix on a capped point
    * subset), d ≤ 256 by the same contract as [[covarianceMatrix]].
    * Apply the result at corpus scale by persisting `rotation` into the
    * IVF-PQ index (`writeIvfPqIndex(opqRotationOpt = ...)`) — the
    * training cost is one bounded collect, never a corpus pass.
    * Deterministic end to end: no RNG anywhere, so re-training on the
    * same sample reproduces the same model.
    */
  def opqTrain(vecs: DataFrame, vecCol: String, m: Int, nCodes: Int,
      iters: Int = 5, maxRows: Int = 65536,
      kmeansIters: Int = 10): OpqModel = {
    require(iters >= 1 && iters <= 20, s"opqTrain iters $iters not in [1,20]")
    require(nCodes >= 1, s"opqTrain nCodes $nCodes must be >= 1")
    val collected = vecs.filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>"))
      .limit(maxRows + 1).collect().map(_.getSeq[Double](0).toArray)
    // collect() order is scheduling-dependent and both the k-means init
    // and the Procrustes sums are order-sensitive — canonicalize so the
    // model is a pure function of the sample MULTISET
    val rows = collected.sortWith { (a, b) =>
      var i = 0
      while (i < a.length && i < b.length && a(i) == b(i)) i += 1
      if (i < a.length && i < b.length) a(i) < b(i)
      else a.length < b.length
    }
    require(rows.nonEmpty, "opqTrain: empty training sample")
    require(rows.length <= maxRows,
      s"opqTrain: training sample exceeds maxRows=$maxRows — OPQ trains " +
        "driver-side by contract; sample a shard first")
    val d = rows(0).length
    require(d >= 1 && d <= 256 && d % m == 0,
      s"opqTrain: dim $d must be in [1, 256] and divisible by m=$m")
    val sub = d / m
    val n = rows.length
    // init: eigenvalue-allocation rotation from the sample covariance
    var rot = opqRotation(covarianceMatrix(
      vecs.sparkSession.createDataFrame(
        vecs.sparkSession.sparkContext.parallelize(
          rows.toIndexedSeq.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType))))), "v"), m)
    var books: Array[Array[Array[Double]]] = null
    var mse = Double.PositiveInfinity
    def rotate(x: Array[Double]): Array[Double] =
      Array.tabulate(d) { r =>
        val row = rot(r); var s = 0.0; var i = 0
        while (i < d) { s += row(i) * x(i); i += 1 }; s
      }
    var it = 0
    while (it < iters) {
      val rx = rows.map(rotate)
      books = Array.tabulate(m)(j => trainSubspaceCodebook(
        rx.map(_.slice(j * sub, (j + 1) * sub)), nCodes, kmeansIters))
      // reconstructions in rotated space
      val recon = rx.map { y =>
        val out = new Array[Double](d)
        var j = 0
        while (j < m) {
          val cw = books(j)(nearestCode(y, j * sub, books(j)))
          System.arraycopy(cw, 0, out, j * sub, sub); j += 1
        }
        out
      }
      mse = rx.zip(recon).map { case (y, r2) =>
        var s = 0.0; var i = 0
        while (i < d) { val t = y(i) - r2(i); s += t * t; i += 1 }; s
      }.sum / n
      // Procrustes update: M = Ŷ·Xᵀ over the RAW sample
      if (it < iters - 1) {
        val mM = Array.ofDim[Double](d, d)
        var r = 0
        while (r < n) {
          val x = rows(r); val y = recon(r)
          var i = 0
          while (i < d) {
            val yi = y(i); var j2 = 0
            while (j2 < d) { mM(i)(j2) += yi * x(j2); j2 += 1 }
            i += 1
          }
          r += 1
        }
        rot = procrustesRotation(mM)
      }
      it += 1
    }
    OpqModel(rot, books, mse)
  }

  /** Lloyd's k-means over a driver-held point set with the Gonzalez
    * farthest-point init — deterministic, ties to the lowest index.
    */
  private def trainSubspaceCodebook(pts: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    val n = pts.length
    val kk = math.min(k, n)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }; s
    }
    // Gonzalez init from point 0
    val centers = scala.collection.mutable.ArrayBuffer(pts(0).clone)
    val minD = pts.map(p => d2(p, centers(0)))
    while (centers.length < kk) {
      var best = 0; var bd = -1.0
      var i = 0
      while (i < n) { if (minD(i) > bd) { bd = minD(i); best = i }; i += 1 }
      val c = pts(best).clone
      centers += c
      i = 0
      while (i < n) { val dd = d2(pts(i), c); if (dd < minD(i)) minD(i) = dd; i += 1 }
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centers.length)(new Array[Double](pts(0).length))
      val cnts = new Array[Int](centers.length)
      var i = 0
      while (i < n) {
        var bj = 0; var bd = Double.PositiveInfinity; var j = 0
        while (j < centers.length) {
          val dd = d2(pts(i), centers(j))
          if (dd < bd) { bd = dd; bj = j }; j += 1
        }
        cnts(bj) += 1
        var t = 0
        while (t < sums(bj).length) { sums(bj)(t) += pts(i)(t); t += 1 }
        i += 1
      }
      var j = 0
      while (j < centers.length) {
        if (cnts(j) > 0) {
          var t = 0
          while (t < sums(j).length) {
            centers(j)(t) = sums(j)(t) / cnts(j); t += 1
          }
        } // empty cluster: keep its previous center (deterministic)
        j += 1
      }
      it += 1
    }
    centers.toArray
  }

  private def nearestCode(y: Array[Double], off: Int,
      book: Array[Array[Double]]): Int = {
    var bj = 0; var bd = Double.PositiveInfinity; var j = 0
    while (j < book.length) {
      var s = 0.0; var i = 0
      while (i < book(j).length) {
        val t = y(off + i) - book(j)(i); s += t * t; i += 1
      }
      if (s < bd) { bd = s; bj = j }; j += 1
    }
    bj
  }

  /** Orthogonal Procrustes factor of M (= Ŷ·Xᵀ): R = U·Vᵀ from
    * M = U·S·Vᵀ, computed via [[symmetricEigen]] of MᵀM (V, S²) with
    * U = M·V/S; near-null directions (tiny singular values) are
    * completed by Gram–Schmidt so R is always a full orthonormal basis.
    */
  private def procrustesRotation(mM: Array[Array[Double]])
      : Array[Array[Double]] = {
    val d = mM.length
    val mtm = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += mM(k)(i) * mM(k)(j); k += 1 }; s
    }
    val (vals, vRows) = symmetricEigen(mtm) // vRows(k) = eigenvector k
    val scale = math.sqrt(math.max(vals(0), 1e-300))
    val uCols = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val vCols = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    for (k <- 0 until d) {
      val s = math.sqrt(math.max(vals(k), 0.0))
      // relative cutoff: U = M·v/σ amplifies the eigen residual by
      // σmax/σ, so near-null directions produce garbage columns — treat
      // them as null space (any orthogonal completion attains the same
      // Procrustes objective there)
      if (s > 1e-7 * scale) {
        val v = vRows(k)
        val u = Array.tabulate(d) { i =>
          var acc = 0.0; var j = 0
          while (j < d) { acc += mM(i)(j) * v(j); j += 1 }; acc / s
        }
        // progressive re-orthogonalization against accepted U columns;
        // a column that collapses under it is unreliable — null space
        for (c <- uCols) {
          var dot = 0.0; var i = 0
          while (i < d) { dot += u(i) * c(i); i += 1 }
          i = 0
          while (i < d) { u(i) -= dot * c(i); i += 1 }
        }
        val nrm = math.sqrt(u.map(x => x * x).sum)
        if (nrm > 0.3) {
          uCols += u.map(_ / nrm); vCols += v
        }
      }
    }
    // complete both bases identically in the null space
    completeBasis(uCols, d); completeBasis(vCols, d)
    // R = U·Vᵀ, returned as rows (output basis): R(i)(j) = Σ_k U(i,k)V(j,k)
    val r = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += uCols(k)(i) * vCols(k)(j); k += 1 }; s
    }
    // polish: U = M·V/S drifts off orthonormality by ~1e-7 when singular
    // values cluster (Jacobi residual amplified by 1/σ); one modified
    // Gram–Schmidt pass over the rows restores machine-eps orthogonality
    // without moving R materially
    var i = 0
    while (i < d) {
      var j = 0
      while (j < i) {
        var dot = 0.0; var k = 0
        while (k < d) { dot += r(i)(k) * r(j)(k); k += 1 }
        k = 0
        while (k < d) { r(i)(k) -= dot * r(j)(k); k += 1 }
        j += 1
      }
      var nrm = 0.0; var k = 0
      while (k < d) { nrm += r(i)(k) * r(i)(k); k += 1 }
      nrm = math.sqrt(nrm)
      require(nrm > 1e-8, "procrustes polish: degenerate row")
      k = 0
      while (k < d) { r(i)(k) /= nrm; k += 1 }
      i += 1
    }
    r
  }

  private def completeBasis(
      cols: scala.collection.mutable.ArrayBuffer[Array[Double]],
      d: Int): Unit = {
    var e = 0
    while (cols.length < d && e < d) {
      val cand = new Array[Double](d); cand(e) = 1.0
      for (c <- cols) {
        var dot = 0.0; var i = 0
        while (i < d) { dot += cand(i) * c(i); i += 1 }
        i = 0
        while (i < d) { cand(i) -= dot * c(i); i += 1 }
      }
      val nrm = math.sqrt(cand.map(x => x * x).sum)
      if (nrm > 1e-8) { cols += cand.map(_ / nrm) }
      e += 1
    }
    require(cols.length == d, "procrustes basis completion failed")
  }

  /** Map-side rotation kernel: y = R·x for a driver-held rotation (rows
    * of `rot` are the output basis). Closure-captured like the PQ
    * codebooks — no shuffle, no join.
    */
  def applyRotation(v: Column, rot: Array[Array[Double]]): Column = {
    val kernel = udf { (x: Seq[Double]) =>
      Array.tabulate(rot.length) { r =>
        val row = rot(r)
        var s = 0.0
        var i = 0
        val n = math.min(row.length, x.length)
        while (i < n) { s += row(i) * x(i); i += 1 }
        s
      }
    }
    kernel(v.cast("array<double>"))
  }
}
