package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Drift

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null) t else rootCause(t.getCause)

  test("levelShift: trailing vs leading full-window sums, edges " +
      "emit nothing, per-key isolation, refusals") {
    // key a: level steps 10 -> 50 at ts 4; w = 2
    val rows = Seq(
      ("a", 1L, 1L, 10L), ("a", 2L, 2L, 10L), ("a", 3L, 3L, 10L),
      ("a", 4L, 4L, 50L), ("a", 5L, 5L, 50L), ("a", 6L, 6L, 50L),
      // key b: too short for any full window pair
      ("b", 1L, 7L, 5L), ("b", 2L, 8L, 5L))
      .toDF("k", "ts", "id", "v")
    val got = Drift.levelShift(rows, "k", "ts", "id", "v", w = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // positions with BOTH windows full: ts 2, 3, 4
    assert(got == Map(
      ("a", 2L) -> ((20L, 60L, 40L)),
      ("a", 3L) -> ((20L, 100L, 80L)),
      ("a", 4L) -> ((60L, 100L, 40L))), s"got $got")
    val e = intercept[Exception] {
      Drift.levelShift(Seq(("a", 1L, 1L, Some(1L)),
        ("a", 2L, 2L, None)).toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v", w = 2).collect()
    }
    assert(rootCause(e).getMessage.contains("levelShift value"))
    intercept[IllegalArgumentException] {
      Drift.levelShift(rows, "k", "ts", "id", "v", w = 1)
    }
  }
}
