package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Geometry
import graft.multimodal.Multimodal

class OverlayMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clipConvex: rect ∩ rect = overlap rectangle area") {
    val a = Geometry.parsePolygon(Geometry.rectWkt(0, 0, 10, 10))
    val b = Geometry.parsePolygon(Geometry.rectWkt(5, 5, 15, 15))
    assert(Geometry.intersectionArea(a, b) == 25.0)
  }

  test("clipConvex: disjoint polygons have zero intersection") {
    val a = Geometry.parsePolygon(Geometry.rectWkt(0, 0, 10, 10))
    val b = Geometry.parsePolygon(Geometry.rectWkt(20, 20, 30, 30))
    assert(Geometry.intersectionArea(a, b) == 0.0)
  }

  test("clipConvex: triangle clipped by square") {
    val tri = Geometry.parsePolygon("POLYGON ((0 0, 20 0, 0 20, 0 0))")
    val sq = Geometry.parsePolygon(Geometry.rectWkt(0, 0, 10, 10))
    // triangle area 200; the clip keeps the square minus the cut corner:
    // 100 - (10*10/2) = 50... actually the hypotenuse x+y=20 passes through
    // (10,10): the full square lies under it, so intersection = 100.
    assert(Geometry.intersectionArea(tri, sq) == 100.0)
  }

  test("intersection picks the convex operand as clip; concave x concave fails loudly") {
    val concave = Geometry.parsePolygon("POLYGON ((0 0, 3 0, 3 1, 1 1, 1 3, 0 3, 0 0))")
    val sq = Geometry.parsePolygon(Geometry.rectWkt(0, 0, 2, 2))
    // L-shape ∩ 2x2 square: the square covers the notch; true area =
    // 2x1 strip + 1x1 corner = 3 (a convex-clip-on-the-wrong-side bug
    // would report 4)
    assert(Geometry.intersectionArea(concave, sq) == 3.0)
    assert(Geometry.intersectionArea(sq, concave) == 3.0, "symmetric operand swap")
    val e = intercept[IllegalArgumentException] {
      Geometry.intersectionArea(concave, concave)
    }
    assert(e.getMessage.contains("convex"))
  }

  test("touchesOrIntersects: edge-adjacent tiles touch, distant do not") {
    val a = Geometry.parsePolygon(Geometry.rectWkt(0, 0, 10, 10))
    val b = Geometry.parsePolygon(Geometry.rectWkt(10, 0, 20, 10))
    val c = Geometry.parsePolygon(Geometry.rectWkt(30, 0, 40, 10))
    assert(Geometry.touchesOrIntersects(a, b))
    assert(!Geometry.touchesOrIntersects(a, c))
  }

  test("multimodal fake decode: deterministic metadata, null-safe") {
    val df = Seq((1L, "hello world"), (2L, "")).toDF("id", "t")
      .select($"id", $"t".cast("binary").as("media"))
    val got = Multimodal.withImageMeta(df, "media").orderBy("id").collect()
    val r = got(0)
    assert(r.getAs[Int]("n_bytes") == 11)
    assert(r.getAs[Int]("width") == 1 + 11 % 64)
    assert(r.getAs[Int]("first_byte") == 'h'.toInt)
    assert(got(1).isNullAt(got(1).fieldIndex("width")), "empty payload -> null meta")
  }

  test("decodeBatched: codec init amortized per partition, not per row") {
    import graft.multimodal.Multimodal.{MediaRow, DecodedRow}
    val ds = spark.createDataset((1L to 100L).map(i =>
      MediaRow(i, s"payload-$i".getBytes)))(
      org.apache.spark.sql.Encoders.product[MediaRow]).repartition(4)
    val out = Multimodal.decodeBatched(ds).collect()
    assert(out.length == 100)
    assert(out.map(_.codec_inits).max == 1L,
      "codec must be initialized once per partition")
    assert(out.map(_.partition_id).distinct.length == 4)
    val r = out.find(_.doc_id == 1L).get
    assert(r.n_bytes == "payload-1".length)
  }

  test("decodeAudio: real WAV metadata round trip, garbage-safe") {
    // author a 16-bit stereo PCM WAV in memory with known parameters
    def wav(rate: Float, channels: Int, frames: Int): Array[Byte] = {
      val data = new Array[Byte](frames * channels * 2)
      java.util.Arrays.fill(data, 3.toByte)
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, wav(44100f, 2, 1000)),
      (2L, wav(8000f, 1, 160)),
      (3L, "not audio at all".getBytes),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "media")
    val got = Multimodal.withAudioMeta(df, "media").orderBy("id").collect()
    assert(got(0).getAs[Int]("sample_rate") == 44100)
    assert(got(0).getAs[Int]("channels") == 2)
    assert(got(0).getAs[Int]("bits") == 16)
    assert(got(0).getAs[Long]("frames") == 1000L)
    assert(math.abs(got(0).getAs[Double]("duration_sec") - 1000.0 / 44100) < 1e-9)
    assert(got(0).getAs[String]("container") == "wave")
    assert(got(0).getAs[Long]("pcm_sum") == 1000L * 2 * 2 * 3) // all bytes = 3
    assert(got(1).getAs[Int]("sample_rate") == 8000)
    assert(math.abs(got(1).getAs[Double]("duration_sec") - 0.02) < 1e-9)
    assert(got(2).isNullAt(got(2).fieldIndex("sample_rate")), "garbage -> null meta")
    assert(got(3).isNullAt(got(3).fieldIndex("sample_rate")), "null -> null meta")
  }

  test("decodeVideoMeta: AVI and MP4 container headers parse, garbage-safe") {
    import graft.multimodal.VideoContainers
    val avi = VideoContainers.synthAvi(width = 320, height = 180,
      frames = 250, rate = 25, scale = 1)
    val mp4 = VideoContainers.synthMp4(width = 640, height = 360,
      movTimescale = 600, movDuration = 6000, // 10 s
      mediaTimescale = 2400, sampleCount = 240, sampleDelta = 100)
    val df = Seq(
      (1L, avi),
      (2L, mp4),
      (3L, "definitely not a video file".getBytes),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "media")
    val got = Multimodal.withVideoMeta(df, "media").orderBy("id").collect()
    assert(got(0).getAs[String]("container") == "avi")
    assert(got(0).getAs[Int]("width") == 320 && got(0).getAs[Int]("height") == 180)
    assert(got(0).getAs[Double]("fps") == 25.0)
    // duration uses the container's TRUNCATED µs-per-frame: 1000000/25 * 250
    assert(got(0).getAs[Long]("duration_us") == 250L * 40000L)
    assert(got(0).getAs[Long]("n_frames") == 250L)
    assert(got(1).getAs[String]("container") == "mp4")
    assert(got(1).getAs[Int]("width") == 640 && got(1).getAs[Int]("height") == 360)
    assert(got(1).getAs[Double]("fps") == 24.0) // 2400 / 100
    assert(got(1).getAs[Long]("duration_us") == 10000000L)
    assert(got(1).getAs[Long]("n_frames") == 240L)
    assert(got(2).isNullAt(got(2).fieldIndex("container")), "garbage -> null meta")
    assert(got(3).isNullAt(got(3).fieldIndex("container")), "null -> null meta")
    // truncated payloads (half a header) must yield null, never throw
    val truncated = Seq((5L, avi.take(20)), (6L, mp4.take(10)))
      .toDF("id", "media")
    val t = Multimodal.withVideoMeta(truncated, "media").orderBy("id").collect()
    assert(t.forall(r => r.isNullAt(r.fieldIndex("container"))))
  }

  test("MJPEG AVI: real frame decode recovers planted gray levels") {
    import graft.multimodal.VideoContainers
    val avi = VideoContainers.synthMjpegAvi(32, 16, rate = 25, scale = 1,
      grays = Seq(32, 96, 160, 224))
    // the same bytes still parse as a container (q94 path unaffected)
    val meta = VideoContainers.parse(avi)
    assert(meta.exists(m => m._1 == "avi" && m._2 == 32 && m._3 == 16 &&
      m._6 == 4L), s"container meta: $meta")
    val df = Seq((1L, avi)).toDF("id", "media")
    val rows = Multimodal.withVideoFrames(df, "media").orderBy("frame_idx")
      .select("frame_idx", "frame_width", "frame_height", "mean_luma")
      .collect()
    assert(rows.length == 4)
    rows.zip(Seq(32, 96, 160, 224)).foreach { case (r, g) =>
      // dimensions come from the decoded raster, not the AVI header
      assert(r.getInt(1) == 32 && r.getInt(2) == 16)
      assert(math.abs(r.getDouble(3) - g) < 8,
        s"frame ${r.getInt(0)}: decoded mean ${r.getDouble(3)} vs planted $g")
    }
    // every=2 samples frames 0 and 2
    val sampled = Multimodal.withVideoFrames(df, "media", every = 2)
      .select("frame_idx").as[Int].collect().toSeq.sorted
    assert(sampled == Seq(0, 2))
    // headers-only AVI, garbage, and null payloads yield no frame rows
    val none = Seq(
      (2L, VideoContainers.synthAvi(160, 90, 10, 25, 1)),
      (3L, "not a video".getBytes),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "media")
    assert(Multimodal.withVideoFrames(none, "media").count() == 0)
  }

  test("corrupt u32 chunk sizes terminate, never hang or throw") {
    import graft.multimodal.VideoContainers
    // RIFF AVI whose first chunk declares size 0xFFFFFFF8 — truncated to
    // Int that is negative, which once made the walker's offset stationary
    // (infinite loop inside the executor task). Must now terminate fast
    // with null meta / zero frames.
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val evilAvi = "RIFF".getBytes ++ le32(0xFFFFFFF8L) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ le32(0xFFFFFFF8L) ++ "movi".getBytes ++
      "00dc".getBytes ++ le32(0xFFFFFFF8L) ++ Array.fill(16)(0x42.toByte)
    val evilMp4 = be32(20) ++ "ftyp".getBytes ++ "isom".getBytes ++
      be32(0) ++ "isom".getBytes ++
      be32(0xFFFFFFF8L) ++ "moov".getBytes ++ Array.fill(16)(0x42.toByte)
    assert(VideoContainers.parse(evilAvi).isEmpty)
    assert(VideoContainers.parse(evilMp4).isEmpty)
    assert(VideoContainers.aviFramePayloads(evilAvi).isEmpty ||
      VideoContainers.aviFramePayloads(evilAvi).forall(_.length < 64))
    // and through the Spark surface: null meta, zero frame rows
    val df = Seq((1L, evilAvi), (2L, evilMp4)).toDF("id", "media")
    val meta = Multimodal.withVideoMeta(df, "media").orderBy("id").collect()
    assert(meta.forall(r => r.isNullAt(r.fieldIndex("container"))))
    assert(Multimodal.withVideoFrames(df, "media").count() == 0)
  }

  test("sampleFrames returns n chunks of bounded size") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("id", "t")
      .select($"id", Multimodal.sampleFrames($"t".cast("binary"), lit(4), lit(3)).as("frames"))
    val frames = df.head.getSeq[Array[Byte]](1)
    assert(frames.length == 4)
    assert(frames.forall(_.length <= 3))
    assert(new String(frames.head) == "abc")
  }
}
