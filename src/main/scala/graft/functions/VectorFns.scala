package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector kernel over `array<float|double>` columns for
  * similarity search / embedding dedup. Pure higher-order-function
  * compositions (`zip_with`, `aggregate`) — no UDF, no driver collect;
  * arithmetic is promoted to double for cross-engine reproducibility.
  *
  * Scale note: every function here is per-row; the only shuffle in an ANN
  * pipeline built from these is the final top-k (or the LSH bucket join),
  * which is exactly where it belongs.
  */
object VectorFns {

  private def d(c: Column): Column = c.cast("array<double>")

  /** HOF (pure-Catalyst) dot product — kept for reference/SQL-only use.
    * The hot paths below use JVM UDF kernels instead: interpreted
    * higher-order functions box per element and re-evaluate argument
    * subtrees (see SCALE.md), ~10× slower on 64-dim vectors.
    */
  def dotExpr(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private val cosineKernel = udf { (a: Seq[Double], b: Seq[Double]) =>
    // index-ordered double accumulation — same fold order as the HOF
    // variant, so results are bit-identical (oracle-stable).
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  private val l2Kernel = udf { (a: Seq[Double], b: Seq[Double]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val t = a(i) - b(i); s += t * t; i += 1 }
    math.sqrt(s)
  }

  def dot(a: Column, b: Column): Column = dotExpr(a, b)

  def norm2(a: Column): Column = sqrt(dotExpr(a, a))

  /** Cosine similarity; 0.0 when either norm is 0 (instead of NaN). */
  def cosine(a: Column, b: Column): Column = cosineKernel(d(a), d(b))

  def l2Distance(a: Column, b: Column): Column = l2Kernel(d(a), d(b))

  /** Deterministic pseudo-random hyperplane: unit-free ±1 components derived
    * from xxhash64(seed, dim-index). `rpHash(v, seed)` is the sign bit of
    * v·h — one bit of a random-hyperplane LSH signature (SimHash for dense
    * vectors, Charikar 2002).
    */
  def rpBit(v: Column, seed: Int): Column = {
    val signs = transform(sequence(lit(0), size(v) - 1),
      i => when(xxhash64(lit(seed), i) % 2 === 0, 1.0).otherwise(-1.0))
    val proj = aggregate(zip_with(d(v), signs, (x, s) => x * s), lit(0.0), (a, b) => a + b)
    when(proj >= 0, 1L).otherwise(0L)
  }

  /** `nBits`-bit random-hyperplane LSH bucket key for a dense vector.
    * Vectors in the same bucket are cosine-similar candidates; used to
    * restrict an O(n^2) similarity join to within-bucket pairs.
    */
  def rpBucket(v: Column, nBits: Int, seed: Int = 42): Column =
    (0 until nBits).map(b => shiftleft(rpBit(v, seed * 1000 + b), b))
      .reduce(_.bitwiseOR(_))
}
