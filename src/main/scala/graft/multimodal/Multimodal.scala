package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video travel as opaque `binary`
  * columns plus typed metadata, processed by per-row kernels that at scale
  * run inside whole partitions (no driver collect, no shuffle unless the
  * caller aggregates).
  *
  * IMAGE decode/resize are REAL: the JDK ships PNG/JPEG/BMP/GIF ImageIO
  * codecs, so [[decodeImage]]/[[resizeImage]] parse and re-encode actual
  * payloads. AUDIO decode is REAL too: `javax.sound.sampled` ships
  * WAV/AIFF/AU codecs ([[decodeAudio]]). VIDEO container metadata is REAL
  * (pure-byte RIFF/ISO-BMFF parsing, [[decodeVideoMeta]]) and FRAME
  * PIXEL decode is REAL for MJPEG streams, whose frames are standalone
  * JPEGs ([[decodeMjpegFrames]]). The one remaining FAKE surface is
  * frame pixels of inter-frame codecs (H.264 etc. — genuinely impossible
  * without a codec library): [[fakeResize]]/[[sampleFrames]] keep that
  * contract (schema, batching, partition behavior, null handling) real
  * and testable, so swapping in a codec changes only a function body.
  */
object Multimodal {

  /** FAKE image decode (STUB — no codec in this container): derives
    * deterministic pseudo width/height from the payload instead of parsing
    * a real header. Real implementation would parse PNG/JPEG headers here.
    */
  val fakeDecodeImage = udf { (media: Array[Byte]) =>
    if (media == null || media.isEmpty) None
    else {
      val n = media.length
      Some((1 + n % 64, 1 + (n * 7) % 64, n, media(0).toInt & 0xff, media(n - 1).toInt & 0xff))
    }
  }

  /** Attach decoded metadata columns to a media DataFrame. */
  def withImageMeta(df: DataFrame, mediaCol: String): DataFrame =
    df.withColumn("__m", fakeDecodeImage(col(mediaCol)))
      .withColumn("width", col("__m._1"))
      .withColumn("height", col("__m._2"))
      .withColumn("n_bytes", col("__m._3"))
      .withColumn("first_byte", col("__m._4"))
      .withColumn("last_byte", col("__m._5"))
      .drop("__m")

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class DecodedRow(doc_id: Long, width: Int, height: Int,
      n_bytes: Int, partition_id: Int, codec_inits: Long)

  /** Batch-shaped decode — the Scala analog of `mapInPandas`: one
    * `mapPartitions` pass where the (stubbed) codec is initialized ONCE per
    * partition and reused across every row in it — the shape a real
    * libjpeg/ffmpeg binding needs (per-row init would dominate at scale).
    * Each output row carries the partition-local init count observed at
    * decode time, so a test can PROVE amortization: max(codec_inits) == 1;
    * a per-row-init regression would emit 1, 2, 3, ...
    */
  def decodeBatched(media: org.apache.spark.sql.Dataset[MediaRow])
      : org.apache.spark.sql.Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // STUB codec handle: a real implementation opens the native codec
      // context here, once per partition.
      var codecInits = 0L
      def initCodec(): Unit = { codecInits += 1 }
      initCodec()
      val pid = org.apache.spark.TaskContext.getPartitionId()
      rows.map { r =>
        val n = if (r.media == null) 0 else r.media.length
        DecodedRow(r.doc_id, 1 + n % 64, 1 + (n * 7) % 64, n, pid, codecInits)
      }
    }
  }

  /** REAL image decode on the JDK's ImageIO (PNG/JPEG/BMP/GIF readers ship
    * with every JVM — no external codec needed): header width/height +
    * container format + band-0 mean (luminance proxy). Undecodable or
    * empty payloads yield null metadata instead of failing the partition.
    * Runs per-row inside whole partitions; the stream is in-memory so
    * there is no I/O amortization to manage.
    */
  val decodeImage = udf { (media: Array[Byte]) =>
    if (media == null || media.isEmpty) None
    else {
      // createImageInputStream can return null (no SPI / cache dir issue)
      // — that's "undecodable", not a task failure; and the reader lookup
      // sits inside the same try/finally so iis can never leak.
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(media))
      if (iis == null) None
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val img = r.read(0)
            val raster = img.getRaster
            var sum = 0L; var n = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += raster.getSample(x, y, 0); n += 1
                x += 1
              }
              y += 1
            }
            Some((img.getWidth, img.getHeight, fmt,
              if (n == 0) 0 else (sum / n).toInt))
          } finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally iis.close()
    }
  }

  /** Attach REAL decoded metadata (see [[decodeImage]]). */
  def withRealImageMeta(df: DataFrame, mediaCol: String): DataFrame =
    df.withColumn("__m", decodeImage(col(mediaCol)))
      .withColumn("width", col("__m._1"))
      .withColumn("height", col("__m._2"))
      .withColumn("format", col("__m._3"))
      .withColumn("mean_band0", col("__m._4"))
      .drop("__m")

  /** 64-bit AVERAGE HASH (aHash) over the decoded band-0 luminance: the
    * image is block-averaged onto an 8×8 grid, each cell votes 1 iff its
    * floored mean exceeds the grid mean — here the UNWEIGHTED mean of
    * the 64 cell means, which differs from the classic global-pixel-mean
    * aHash when dimensions are not multiples of 8 (see the convention
    * note in the body) — the classic perceptual fingerprint
    * that survives re-encoding, resizing, and mild noise while exact
    * byte hashing survives nothing. Pairs within a small Hamming ball of
    * each other's aHash are near-duplicate IMAGES: feed the (id, ahash)
    * relation to [[graft.operators.Dedup.hammingPairs]] (same pigeonhole
    * machinery as text simhash dedup). Integer-exact per decoded pixel
    * grid, so identical bytes always hash identically; undecodable
    * payloads yield null.
    */
  val aHash64 = udf { (media: Array[Byte]) =>
    if (media == null || media.isEmpty) None
    else {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(media))
      if (iis == null) None
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val img = r.read(0)
            val raster = img.getRaster
            val w = img.getWidth
            val h = img.getHeight
            if (w == 0 || h == 0) None
            else {
              val sums = new Array[Long](64)
              val cnts = new Array[Long](64)
              var y = 0
              while (y < h) {
                val by = (y.toLong * 8 / h).toInt
                var x = 0
                while (x < w) {
                  val bx = (x.toLong * 8 / w).toInt
                  val c = by * 8 + bx
                  sums(c) += raster.getSample(x, y, 0)
                  cnts(c) += 1
                  x += 1
                }
                y += 1
              }
              // Convention: each cell's mean is the FLOOR of its pixel
              // sum over its pixel count, and the grid mean is the floor
              // of the UNWEIGHTED mean of those cell means (not the
              // global pixel mean — the two differ when width or height
              // is not a multiple of 8, where edge cells cover fewer
              // pixels). Deterministic and integer-exact either way; this
              // one lets an oracle replay the hash from planted cell
              // values without pixel-count bookkeeping.
              var total = 0L
              var filled = 0
              var c = 0
              while (c < 64) {
                if (cnts(c) > 0) { total += sums(c) / cnts(c); filled += 1 }
                c += 1
              }
              val mean = if (filled == 0) 0L else total / filled
              var hash = 0L
              c = 0
              while (c < 64) {
                if (cnts(c) > 0 && sums(c) / cnts(c) > mean)
                  hash |= (1L << c)
                c += 1
              }
              Some(hash)
            }
          } finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally iis.close()
    }
  }

  /** Attach the perceptual hash (see [[aHash64]]). */
  def withImageAHash(df: DataFrame, mediaCol: String): DataFrame =
    df.withColumn("ahash", aHash64(col(mediaCol)))

  /** REAL audio decode on `javax.sound.sampled` (the JDK ships WAV/AIFF/AU
    * codecs — no external dependency): container type, sample rate,
    * channels, bit depth, frame count, duration, plus an unsigned-byte sum
    * over the decoded PCM stream (proves the payload round-trips through
    * the codec, the audio analog of [[decodeImage]]'s band mean).
    * Null/undecodable payloads yield null metadata instead of failing the
    * partition.
    */
  val decodeAudio = udf { (media: Array[Byte]) =>
    if (media == null || media.isEmpty) None
    else {
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(media))
        val fmt = aff.getFormat
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(media))
        var pcmSum = 0L
        try {
          val buf = new Array[Byte](8192)
          var r = ais.read(buf)
          while (r > 0) {
            var i = 0
            while (i < r) { pcmSum += buf(i) & 0xff; i += 1 }
            r = ais.read(buf)
          }
        } finally ais.close()
        val frames = aff.getFrameLength.toLong
        Some((math.round(fmt.getSampleRate).toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, frames,
          if (fmt.getFrameRate > 0) frames / fmt.getFrameRate.toDouble else 0.0,
          aff.getType.toString.toLowerCase(java.util.Locale.ROOT), pcmSum))
      } catch { case _: Exception => None }
    }
  }

  /** Attach REAL decoded audio metadata (see [[decodeAudio]]). */
  def withAudioMeta(df: DataFrame, mediaCol: String): DataFrame =
    df.withColumn("__a", decodeAudio(col(mediaCol)))
      .withColumn("sample_rate", col("__a._1"))
      .withColumn("channels", col("__a._2"))
      .withColumn("bits", col("__a._3"))
      .withColumn("frames", col("__a._4"))
      .withColumn("duration_sec", col("__a._5"))
      .withColumn("container", col("__a._6"))
      .withColumn("pcm_sum", col("__a._7"))
      .drop("__a")

  /** REAL resize: ImageIO decode → bilinear Graphics2D scale → PNG
    * re-encode, all in-memory per row. Null/undecodable input → null.
    */
  val resizeImage = udf { (media: Array[Byte], scalePct: Int) =>
    if (media == null || media.isEmpty || scalePct <= 0) null
    else {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
        if (img == null) null
        else {
          val w = math.max(1, img.getWidth * scalePct / 100)
          val h = math.max(1, img.getHeight * scalePct / 100)
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      } catch { case _: Exception => null }
    }
  }

  /** FAKE resize (STUB): a real kernel would decode, scale, re-encode; the
    * fake truncates the payload proportionally — preserving the contract
    * that output bytes shrink with the scale factor.
    */
  val fakeResize = udf { (media: Array[Byte], scalePct: Int) =>
    if (media == null) null
    else media.take(math.max(1, media.length * scalePct / 100))
  }

  /** REAL video CONTAINER metadata, pure JDK byte parsing — no codec
    * needed, the same trick that made audio real (q84): AVI headers are
    * RIFF chunks and MP4 headers are ISO-BMFF boxes, both plain
    * length-prefixed structures.
    *
    *  - AVI: `avih` (width/height/total frames/µs-per-frame) + the first
    *    `vids` `strh` (dwRate/dwScale → exact fps).
    *  - MP4: `mvhd` (movie timescale/duration), first `tkhd`
    *    (16.16-fixed width/height), first `mdhd` + `stts` (media
    *    timescale, sample count and delta → exact fps).
    *
    * FRAME PIXEL decode remains the one stubbed surface (no video codec
    * ships with the JDK); everything this function returns is read from
    * real container bytes. Null/unparseable payloads yield null metadata
    * instead of failing the partition.
    * Returns (container, width, height, fps, duration_us, n_frames).
    */
  val decodeVideoMeta = udf { (media: Array[Byte]) =>
    if (media == null || media.length < 12) None
    else VideoContainers.parse(media)
  }

  /** Attach REAL video container metadata (see [[decodeVideoMeta]]). */
  def withVideoMeta(df: DataFrame, mediaCol: String): DataFrame =
    df.withColumn("__v", decodeVideoMeta(col(mediaCol)))
      .withColumn("container", col("__v._1"))
      .withColumn("width", col("__v._2"))
      .withColumn("height", col("__v._3"))
      .withColumn("fps", col("__v._4"))
      .withColumn("duration_us", col("__v._5"))
      .withColumn("n_frames", col("__v._6"))
      .drop("__v")

  /** REAL video FRAME decode for MJPEG AVIs, pure JDK: an MJPEG stream's
    * `movi` chunks are standalone JPEGs and the JDK ships a JPEG codec —
    * the same no-external-codec trick that made images (q74) and audio
    * (q84) real, now for moving pictures. Samples every `every`-th frame
    * (map-side frame-rate downsampling), decodes each to pixels, and
    * returns (frame_idx, width, height, mean_luma) per sampled frame —
    * width/height/mean come from the DECODED RASTER, not headers.
    * Non-AVI or non-JPEG payloads yield an empty array: frame decode for
    * inter-frame codecs (H.264 etc.) genuinely needs a codec library and
    * stays out of a pure JVM — container METADATA for those still works
    * via [[decodeVideoMeta]].
    */
  val decodeMjpegFrames = udf { (media: Array[Byte], every: Int) =>
    if (media == null || media.length < 12 || every <= 0)
      Array.empty[(Int, Int, Int, Double)]
    else {
      // inside the never-fail contract: a structurally corrupt container
      // must yield zero frames, not a failed partition
      val frames =
        try VideoContainers.aviFramePayloads(media)
        catch { case _: Exception => IndexedSeq.empty[Array[Byte]] }
      Range(0, frames.length, every).flatMap { i =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(frames(i)))
          if (img == null) None
          else {
            val raster = img.getRaster
            val bands = raster.getNumBands
            var sum = 0.0; var n = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                var c = 0
                while (c < bands) { sum += raster.getSample(x, y, c); c += 1 }
                n += bands
                x += 1
              }
              y += 1
            }
            Some((i, img.getWidth, img.getHeight, if (n == 0) 0.0 else sum / n))
          }
        } catch { case _: Exception => None }
      }.toArray
    }
  }

  /** Attach REAL per-frame pixel stats (see [[decodeMjpegFrames]]): one
    * output row per sampled frame with frame_idx/frame_width/frame_height/
    * mean_luma columns; payloads with no decodable frames drop out.
    */
  def withVideoFrames(df: DataFrame, mediaCol: String, every: Int = 1): DataFrame =
    df.withColumn("__f", explode(decodeMjpegFrames(col(mediaCol), lit(every))))
      .withColumn("frame_idx", col("__f._1"))
      .withColumn("frame_width", col("__f._2"))
      .withColumn("frame_height", col("__f._3"))
      .withColumn("mean_luma", col("__f._4"))
      .drop("__f")

  /** Frame sampling (video-as-binary): split the payload into `n` evenly
    * spaced fixed-size chunks — the Spark-side shape of "sample every k-th
    * frame". Returns array<binary>; explode downstream for per-frame rows.
    */
  val sampleFrames = udf { (media: Array[Byte], n: Int, frameSize: Int) =>
    if (media == null || media.isEmpty || n <= 0) Array.empty[Array[Byte]]
    else {
      val stride = math.max(1, media.length / n)
      (0 until n).map { i =>
        val start = math.min(i * stride, media.length - 1)
        media.slice(start, math.min(start + frameSize, media.length))
      }.toArray
    }
  }
}
