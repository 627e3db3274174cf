package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.expr.GeoMath
import graft.functions.TextFns
import graft.geo.Geometry
import graft.operators.Ops

/** Property-based invariants (SURVEY §5.2): the reference prints exactly
  * these conservation/normalization facts as its only runtime checks; here
  * they are laws. Driver-side generators exercise the pure kernels densely;
  * two DataFrame laws run on sampled inputs.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic sampler over a ScalaCheck generator (the scalatest
    * bridge artifact is not in the offline cache; sampling keeps the same
    * generator-driven coverage).
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val p = org.scalacheck.Gen.Parameters.default
      .withSize(50)
    (0 until n).flatMap(i => g.apply(p, org.scalacheck.rng.Seed(42L + i)))
  }
  private def forAll[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    samples(g, n).foreach(f)
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 60)(f: (A, B) => Unit): Unit =
    samples(Gen.zip(ga, gb), n).foreach { case (a, b) => f(a, b) }

  val coord = for {
    lat <- Gen.choose(-89.0, 89.0)
    lon <- Gen.choose(-179.0, 179.0)
  } yield (lat, lon)

  test("haversine: symmetric, zero on identity, bounded by half circumference") {
    forAll2(coord, coord) { (a, b) =>
      val d1 = GeoMath.haversineKm(a._1, a._2, b._1, b._2)
      val d2 = GeoMath.haversineKm(b._1, b._2, a._1, a._2)
      assert(math.abs(d1 - d2) < 1e-9)
      assert(d1 >= 0 && d1 <= math.Pi * GeoMath.EarthRadiusKm + 1e-6)
      assert(GeoMath.haversineKm(a._1, a._2, a._1, a._2) == 0.0)
    }
  }

  test("euToDouble inverts EU formatting for plain decimals") {
    forAll(Gen.choose(-1e6, 1e6)) { (x: Double) =>
      val r = math.rint(x * 100) / 100
      val eu = f"$r%.2f".replace(".", ",")
      assert(math.abs(GeoMath.euToDouble(
        org.apache.spark.unsafe.types.UTF8String.fromString(eu)) - r) < 1e-9)
    }
  }

  test("polygon area: rectangles have width*height, any ring area >= 0") {
    forAll2(Gen.choose(0.1, 100.0), Gen.choose(0.1, 100.0)) { (w: Double, h: Double) =>
      val ring = Geometry.parsePolygon(Geometry.rectWkt(0, 0, w, h))
      assert(math.abs(Geometry.ringArea(ring) - w * h) < 1e-6)
    }
  }

  test("intersection area is bounded by both operand areas") {
    val rect = for {
      x <- Gen.choose(0.0, 50.0); y <- Gen.choose(0.0, 50.0)
      w <- Gen.choose(1.0, 50.0); h <- Gen.choose(1.0, 50.0)
    } yield (x, y, x + w, y + h)
    forAll2(rect, rect) { (a, b) =>
      val ra = Geometry.parsePolygon(Geometry.rectWkt(a._1, a._2, a._3, a._4))
      val rb = Geometry.parsePolygon(Geometry.rectWkt(b._1, b._2, b._3, b._4))
      val inter = Geometry.intersectionArea(ra, rb)
      assert(inter >= -1e-9)
      assert(inter <= Geometry.ringArea(ra) + 1e-6)
      assert(inter <= Geometry.ringArea(rb) + 1e-6)
    }
  }

  test("minhash agreement is monotone in token overlap") {
    val base = (1 to 30).map(i => s"tok$i")
    forAll(Gen.choose(0, 30)) { (k: Int) =>
      val other = base.drop(k) ++ (1 to k).map(i => s"alt$i")
      val sig = (toks: Seq[String]) => {
        val sh = if (toks.length < 2) Seq(toks.mkString(" "))
          else toks.sliding(2).map(_.mkString(" ")).toSeq.distinct
        Array.tabulate(16)(i => sh.map(s => TextFns.hash64(s, i)).min)
      }
      val agree = sig(base).zip(sig(other)).count { case (a, b) => a == b }
      if (k == 0) assert(agree == 16)
      if (k == 30) assert(agree <= 4)
    }
  }

  test("DataFrame law: normalizePerGroup sums to 1 for any positive groups") {
    forAll(Gen.listOfN(30, Gen.zip(Gen.choose(0, 4), Gen.choose(0.1, 100.0))), n = 5) {
      (rows: List[(Int, Double)]) =>
      val df = rows.toDF("g", "v")
      val sums = Ops.normalizePerGroup(df, Seq("g"), "v", "p")
        .groupBy("g").agg(sum($"p").as("s")).collect().map(_.getDouble(1))
      sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
    }
  }

  test("DataFrame law: canonicalEdge makes edge aggregation direction-invariant") {
    forAll(Gen.listOfN(20, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 5))), n = 5) {
      (edges: List[(Int, Int)]) =>
      val fwd = edges.map { case (a, b) => (s"n$a", s"n$b", 1.0) }.toDF("s", "e", "c")
      val rev = edges.map { case (a, b) => (s"n$b", s"n$a", 1.0) }.toDF("s", "e", "c")
      def agg(df: org.apache.spark.sql.DataFrame) =
        Ops.canonicalEdge(df, "s", "e").groupBy("s", "e").agg(sum($"c").as("c"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(agg(fwd) == agg(rev))
    }
  }

  test("UTM: forward∘inverse is identity to 1e-9 deg across random zones") {
    val gen = for {
      zone <- Gen.choose(1, 60)
      south <- Gen.oneOf(true, false)
      dLon <- Gen.choose(-2.9, 2.9)
      lat <- Gen.choose(3.0, 83.0)
    } yield (if (south) 32700 + zone else 32600 + zone,
      -183.0 + 6.0 * zone + dLon, if (south) -lat else lat)
    forAll(gen, n = 120) { case (epsg, lon, lat) =>
      val (x, y) = graft.geo.Crs.fromWgs84(epsg, lon, lat)
      val (lon2, lat2) = graft.geo.Crs.toWgs84(epsg, x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"EPSG:$epsg ($lon, $lat) → ($lon2, $lat2)")
      // northern-hemisphere eastings stay inside the standard UTM band
      assert(x > 100000 && x < 900000, s"easting $x out of zone range")
    }
  }

  test("datum-bridge CRS families: forward∘inverse identity on random points") {
    // every family that crosses a geocentric bridge (Swiss, OSGB, NTF,
    // Gauss-Krüger) — the bridge inverse is algebraic-exact, so the
    // round-trip floor is the geodetic-latitude iteration (~2e-8 deg)
    val gen = Gen.oneOf(
      for { lon <- Gen.choose(6.0, 10.4); lat <- Gen.choose(45.9, 47.8) }
        yield (21781, lon, lat),
      for { lon <- Gen.choose(6.0, 10.4); lat <- Gen.choose(45.9, 47.8) }
        yield (2056, lon, lat),
      for { lon <- Gen.choose(-6.0, 1.7); lat <- Gen.choose(50.0, 58.5) }
        yield (27700, lon, lat),
      for { lon <- Gen.choose(-4.5, 7.5); lat <- Gen.choose(42.5, 50.5) }
        yield (27572, lon, lat),
      for { lon <- Gen.choose(6.5, 11.5); lat <- Gen.choose(47.5, 54.5) }
        yield (31467, lon, lat))
    forAll(gen, n = 150) { case (epsg, lon, lat) =>
      val (x, y) = graft.geo.Crs.fromWgs84(epsg, lon, lat)
      val (lon2, lat2) = graft.geo.Crs.toWgs84(epsg, x, y)
      assert(math.abs(lon2 - lon) < 3e-8 && math.abs(lat2 - lat) < 3e-8,
        s"EPSG:$epsg ($lon, $lat) → ($lon2, $lat2)")
    }
  }

  test("DataFrame law: saltedJoin equals the plain join for any salts") {
    val rnd = new scala.util.Random(7)
    for (salts <- Seq(1, 3, 16)) {
      val big = (0 until 2000).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(100).toLong, i.toLong))
        .toDF("k", "v", "rowkey")
      val small = (0L until 8L).map(k => (k, k * 5 + 1)).toDF("k", "w")
      val plain = big.join(small, "k").agg(count(lit(1)), sum($"v" * $"w"))
        .head()
      val salted = Ops.saltedJoin(big, small, "k", $"rowkey", salts)
        .agg(count(lit(1)), sum($"v" * $"w")).head()
      assert(plain == salted, s"salts=$salts: $plain vs $salted")
    }
  }

  test("DataFrame law: rrfFuse scores bounded and unanimous-top wins") {
    import graft.operators.Similarity
    // three runs over ids 1..20, each a permuted ranking with id 7 rank 1
    val rnd = new scala.util.Random(11)
    val runs = (0 until 3).map { _ =>
      val rest = rnd.shuffle((1L to 20L).filter(_ != 7L).toList)
      ((7L :: rest).zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) })
        .toDF("id", "rank")
    }
    val fused = Similarity.rrfFuse(runs, "id", "rank", kRrf = 60, topN = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // unanimous rank-1 doc wins, with the exact maximal score 3/(60+1)
    assert(fused.head._1 == 7L)
    assert(math.abs(fused.head._2 - 3.0 / 61.0) < 1e-12)
    // every fused score is bounded by nRuns/(k+1) and n_systems ≤ nRuns
    assert(fused.forall { case (_, s, n) => s <= 3.0 / 61.0 + 1e-12 && n <= 3 })
  }

  test("geodesic vs haversine: within 0.6% everywhere non-antipodal") {
    forAll2(coord, coord, n = 80) { case ((lat1, lon1), (lat2, lon2)) =>
      val h = GeoMath.haversineKm(lat1, lon1, lat2, lon2)
      val g = GeoMath.geodesicKm(lat1, lon1, lat2, lon2)
      if (h > 1.0 && h < 19000) { // skip identity and near-antipodal
        assert(math.abs(g - h) / h < 0.006, s"($lat1,$lon1)-($lat2,$lon2): h=$h g=$g")
        assert(g >= 0)
      }
    }
  }

  test("DataFrame law: chunkWindows tiles exactly — sizes sum to n + overlap") {
    // for tokens n >= 1, chunk count = ceil((n-w)/s)+1 (or 1), every chunk
    // is within [1, w] tokens, and the LAST chunk always ends at token n
    val gen = for {
      n <- Gen.choose(1, 120)
      w <- Gen.choose(2, 40)
      s <- Gen.choose(1, 40)
    } yield (n, w, math.min(s, w))
    samples(gen, 12).foreach { case (n, w, s) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val got = graft.operators.Curation.chunkWindows(df, "doc_id", "text", w, s)
        .orderBy("chunk_idx")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(4)))
      val expectChunks = if (n <= w) 1 else math.ceil((n - w).toDouble / s).toInt + 1
      assert(got.length == expectChunks, s"n=$n w=$w s=$s chunks=${got.length}")
      assert(got.forall { case (_, sz, _) => sz >= 1 && sz <= w })
      assert(got.last._3 == s"t$n", s"n=$n w=$w s=$s last tail=${got.last._3}")
    }
  }

  test("DataFrame law: temperatureMix budgets never exceed the total " +
      "and every take respects its domain budget") {
    val gen = for {
      nDomains <- Gen.choose(1, 5)
      masses <- Gen.listOfN(nDomains, Gen.choose(1, 40))
      budget <- Gen.choose(100L, 5000L)
      tau <- Gen.oneOf(0.5, 1.0, 2.0)
    } yield (masses, budget, tau)
    samples(gen, 10).foreach { case (masses, budget, tau) =>
      // domain i holds masses(i) docs of 10 tokens each
      val rows = masses.zipWithIndex.flatMap { case (m, i) =>
        (0 until m).map(j => (i * 1000L + j, s"dom$i", 10L))
      }
      val df = rows.toDF("doc_id", "source", "toks")
      val taken = graft.operators.Curation
        .temperatureMix(df, "doc_id", "toks", "source", budget, tau)
        .groupBy("source").agg(sum("toks").as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // Σ p_i = 1 up to rounding, so Σ floor(B·p_i) <= B; each domain's
      // take is further capped by floor-to-atom and by its inventory
      assert(taken.values.sum <= budget,
        s"masses=$masses B=$budget tau=$tau took ${taken.values.sum}")
      val w = masses.map(m => math.pow(m * 10.0, tau))
      val tot = w.sum
      masses.zipWithIndex.foreach { case (m, i) =>
        val dom = s"dom$i"
        val cap = math.min(
          math.floor(budget * w(i) / tot).toLong, m * 10L)
        assert(taken.getOrElse(dom, 0L) <= cap,
          s"masses=$masses B=$budget tau=$tau $dom took " +
            s"${taken.getOrElse(dom, 0L)} > cap $cap")
      }
    }
  }

  test("DataFrame law: repeatedSpans are disjoint, in-bounds, and " +
      "clipRepeatedSpans removes exactly their token count") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val gen = for {
      n <- Gen.choose(6, 30)
      ws <- Gen.listOfN(n, word)
    } yield ws
    samples(gen, 10).zipWithIndex.foreach { case (ws, i) =>
      val df = Seq((1L, ws.mkString(" ")), (2L, ws.reverse.mkString(" ")))
        .toDF("doc_id", "text")
      val spans = graft.operators.Curation
        .repeatedSpans(df, "doc_id", "text", n = 3, minCount = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      spans.groupBy(_._1).foreach { case (_, ss) =>
        val sorted = ss.sortBy(_._2)
        sorted.foreach { case (_, s, e) =>
          assert(s >= 0 && e > s && e <= ws.length, s"case $i span ($s,$e)")
        }
        sorted.sliding(2).foreach {
          case Array((_, _, e1), (_, s2, _)) =>
            assert(e1 < s2, s"case $i overlapping/adjacent spans $sorted")
          case _ =>
        }
      }
      val clipped = graft.operators.Curation
        .clipRepeatedSpans(df, "doc_id", "text", n = 3, minCount = 2)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      clipped.foreach { case (id, text, nr) =>
        val spanTok = spans.filter(_._1 == id).map(x => x._3 - x._2).sum
        assert(nr == spanTok, s"case $i doc $id removed $nr != span $spanTok")
        val keptTok = if (text.isEmpty) 0 else text.split(" ").length
        assert(keptTok + nr == ws.length,
          s"case $i doc $id kept $keptTok + removed $nr != ${ws.length}")
      }
    }
  }

  test("Ntv2 bilinear: exact on random globally-linear shift fields") {
    import graft.geo.Ntv2
    import java.nio.{ByteBuffer, ByteOrder}
    // a field linear in (row, col) is reproduced EXACTLY by bilinear
    // interpolation at any interior point — for random coefficients and
    // random probe points, the reader's interpolation must match the
    // analytic value (float32 storage keeps quarter-step coefficients
    // exact, so the law holds to double rounding)
    def rec(buf: ByteBuffer, name: String)(w: ByteBuffer => Unit): Unit = {
      buf.put(String.format("%-8s", name).getBytes("US-ASCII"))
      val p0 = buf.position(); w(buf)
      while (buf.position() < p0 + 8) buf.put(0.toByte)
    }
    val coefGen = Gen.choose(-16, 16).map(_ * 0.25)
    val probeGen = Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0))
    forAll2(Gen.zip(coefGen, coefGen, coefGen),
      Gen.listOfN(5, probeGen), n = 25) { case ((a0, ar, ac), probes) =>
      val nr = 7; val nc = 9
      val sLat = 180000.0; val latInc = 600.0
      val eLon = -7200.0; val lonInc = 450.0
      val total = 11 * 16 + 11 * 16 + nr * nc * 16
      val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      rec(buf, "NUM_OREC")(_.putInt(11)); rec(buf, "NUM_SREC")(_.putInt(11))
      rec(buf, "NUM_FILE")(_.putInt(1))
      rec(buf, "GS_TYPE")(_.put("SECONDS ".getBytes("US-ASCII")))
      rec(buf, "VERSION")(_.put("NTv2.0  ".getBytes("US-ASCII")))
      rec(buf, "SYSTEM_F")(_.put("A       ".getBytes("US-ASCII")))
      rec(buf, "SYSTEM_T")(_.put("B       ".getBytes("US-ASCII")))
      Seq("MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T")
        .foreach(k => rec(buf, k)(_.putDouble(6378137.0)))
      rec(buf, "SUB_NAME")(_.put("ONLY    ".getBytes("US-ASCII")))
      rec(buf, "PARENT")(_.put("NONE    ".getBytes("US-ASCII")))
      rec(buf, "CREATED")(_.put("20260813".getBytes("US-ASCII")))
      rec(buf, "UPDATED")(_.put("20260813".getBytes("US-ASCII")))
      rec(buf, "S_LAT")(_.putDouble(sLat))
      rec(buf, "N_LAT")(_.putDouble(sLat + (nr - 1) * latInc))
      rec(buf, "E_LONG")(_.putDouble(eLon))
      rec(buf, "W_LONG")(_.putDouble(eLon + (nc - 1) * lonInc))
      rec(buf, "LAT_INC")(_.putDouble(latInc))
      rec(buf, "LONG_INC")(_.putDouble(lonInc))
      rec(buf, "GS_COUNT")(_.putInt(nr * nc))
      for (r <- 0 until nr; c <- 0 until nc) {
        buf.putFloat((a0 + ar * r + ac * c).toFloat)
        buf.putFloat((a0 - ac * r + ar * c).toFloat)
        buf.putFloat(0f); buf.putFloat(0f)
      }
      val g = Ntv2.parse(buf.array())
      probes.foreach { case (fr, fc) =>
        val rf = fr * (nr - 1); val cf = fc * (nc - 1)
        val lat = (sLat + rf * latInc) / 3600
        val lon = -(eLon + cf * lonInc) / 3600
        val (dLat, dLonW) = g.shiftSeconds(lon, lat)
          .getOrElse(fail(s"interior point ($lon,$lat) refused"))
        assert(math.abs(dLat - (a0 + ar * rf + ac * cf)) < 1e-5,
          s"lat shift at ($rf,$cf): $dLat vs ${a0 + ar * rf + ac * cf}")
        assert(math.abs(dLonW - (a0 - ac * rf + ar * cf)) < 1e-5,
          s"lon shift at ($rf,$cf): $dLonW vs ${a0 - ac * rf + ar * cf}")
      }
    }
  }

  test("recallAtK law: equals |approx ∩ exact| / k per query, " +
      "0 for queries absent from approx") {
    import graft.operators.Similarity
    val caseGen = for {
      nq <- Gen.choose(1, 4)
      k <- Gen.choose(1, 6)
      exact <- Gen.sequence[Seq[Seq[Long]], Seq[Long]]((1 to nq).map(_ =>
        Gen.pick(k, 0L until 40L).map(_.toSeq)))
      approx <- Gen.sequence[Seq[Seq[Long]], Seq[Long]]((1 to nq).map(q =>
        if (q == nq) Gen.const(Seq.empty[Long]) // last query dropped
        else Gen.pick(k, 0L until 40L).map(_.toSeq)))
    } yield (k, exact, approx)
    forAll(caseGen, n = 20) { case (k, exact, approx) =>
      val eRows = exact.zipWithIndex.flatMap { case (ids, q) =>
        ids.map(i => (q.toLong, i)) }
      val aRows = approx.zipWithIndex.flatMap { case (ids, q) =>
        ids.map(i => (q.toLong, i)) }
      val got = Similarity.recallAtK(
          aRows.toDF("query_id", "vec_id"), eRows.toDF("query_id", "vec_id"),
          "query_id", "vec_id", k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val want = exact.zipWithIndex.map { case (ids, q) =>
        q.toLong -> ids.toSet.intersect(approx(q).toSet).size.toDouble / k
      }.toMap
      assert(got == want, s"k=$k got $got want $want")
    }
  }
}
