package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.geo.{Geometry, GeoFns}
import graft.operators.SpatialOps

class GeoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val unitSq = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
  val triangle = "POLYGON ((0 0, 4 0, 0 4, 0 0))"

  test("parse + containsXY: interior in, exterior out") {
    val ring = Geometry.parsePolygon(unitSq)
    assert(Geometry.containsXY(ring, 5, 5))
    assert(!Geometry.containsXY(ring, 15, 5))
    assert(!Geometry.containsXY(ring, -1, -1))
  }

  test("ringArea and centroid") {
    assert(Geometry.ringArea(Geometry.parsePolygon(unitSq)) == 100.0)
    assert(Geometry.ringArea(Geometry.parsePolygon(triangle)) == 8.0)
    val c = Geometry.centroid(Geometry.parsePolygon(unitSq))
    assert(c.x == 5.0 && c.y == 5.0)
  }

  test("bbox") {
    assert(Geometry.bbox(Geometry.parsePolygon(triangle)) == (0.0, 0.0, 4.0, 4.0))
  }

  test("pointInPolygonJoin tags points with containing region, drops misses") {
    val pts = Seq((1, 2.0, 2.0), (2, 15.0, 2.0), (3, 99.0, 99.0)).toDF("id", "x", "y")
    val polys = Seq(("A", unitSq), ("B", "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"))
      .toDF("region", "wkt")
    val got = SpatialOps.pointInPolygonJoin(pts, "x", "y", polys, "wkt")
      .select("id", "region").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "A"), (2, "B")))
  }

  test("tiledPointInPolygonJoin matches the broadcast join exactly") {
    val pts = (0 until 200).map(i => (i, (i % 37) * 1.1 + 0.05, (i % 23) * 1.7 + 0.05))
      .toDF("id", "x", "y")
    val polys = Seq(("A", unitSq), ("B", "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"),
      ("C", "POLYGON ((0 10, 40 10, 40 40, 0 40, 0 10))")).toDF("region", "wkt")
    def key(df: org.apache.spark.sql.DataFrame) = df.select("id", "region")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val broadcastJoin = key(SpatialOps.pointInPolygonJoin(pts, "x", "y", polys, "wkt"))
    val tiled = key(SpatialOps.tiledPointInPolygonJoin(pts, "x", "y", polys, "wkt", 7.0))
    assert(broadcastJoin.nonEmpty)
    assert(tiled == broadcastJoin)
  }

  test("tiledPointInPolygonJoin how=left keeps unmatched points with nulls") {
    val pts = Seq((1, 2.0, 2.0), (2, 99.0, 99.0)).toDF("id", "x", "y")
    val polys = Seq(("A", unitSq)).toDF("region", "wkt")
    val got = SpatialOps.tiledPointInPolygonJoin(pts, "x", "y", polys, "wkt", 10.0, how = "left")
      .collect().map(r => (r.getInt(0), r.getAs[String]("region"))).toSet
    assert(got == Set((1, "A"), (2, null)))
  }

  test("zonalStats: per-region sum/max/count") {
    val px = Seq((1.0, 1.0, 2.0), (2.0, 2.0, 3.0), (11.0, 1.0, 7.0)).toDF("x", "y", "v")
    val polys = Seq(("A", unitSq), ("B", "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"))
      .toDF("region", "wkt")
    val got = SpatialOps.zonalStats(px, "x", "y", "v", polys, "wkt", "region")
      .orderBy("region").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(("A", 5.0, 3.0, 2L), ("B", 7.0, 7.0, 1L)))
  }
}
