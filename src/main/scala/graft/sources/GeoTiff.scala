package graft.sources

import javax.imageio.{ImageIO, ImageTypeSpecifier, ImageWriteParam}
import javax.imageio.metadata.IIOMetadata
import javax.imageio.plugins.tiff.{TIFFDirectory, TIFFField, TIFFTag, TIFFTagSet}
import java.awt.Rectangle
import java.awt.image.BufferedImage
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S5/S8: real GeoTIFF raster scan and sink on the JDK's built-in TIFF
  * ImageIO plugin (JEP 262, `javax.imageio.plugins.tiff`) — no external
  * codec dependency.
  *
  * Reference behavior reproduced:
  *  - full + windowed band read, `rasterio.open(...).read(1)` and the
  *    index-slice window (code/lib/input_maps.py:105-106,132-133;
  *    code/lib/spatial_functions.py:303-306,379-388),
  *  - `array2raster` sink: PACKBITS compression, EPSG:4326 geotransform,
  *    north-up row order (code/lib/spatial_functions.py:190-222).
  *
  * Geo referencing is carried by the two standard GeoTIFF tags —
  * ModelPixelScale (33550) and ModelTiepoint (33922) — read and written
  * through `TIFFDirectory`; CRS identity (EPSG:4326) goes in the GeoKey
  * directory (34735).
  *
  * Scale posture: the DECODE IS DISTRIBUTED. `read` splits the raster
  * into row bands and decodes each band inside `mapPartitions` on the
  * executors (the TIFF plugin honors `ImageReadParam.sourceRegion`, so a
  * band read touches only its strips). The driver reads just the header
  * (size + geotransform). The output is the engine's standard pixel
  * relation `(row, col, value)` — every raster operator downstream
  * (zonal stats, rasterize, remap, upsample) is unchanged. The file
  * bytes are fetched per-executor through the Hadoop FileSystem API, so
  * hdfs/s3a work; one fetch per partition, amortized over its band.
  */
object GeoTiff {

  /** Geo transform: cell (row, col) center is
    * (x0 + (col+0.5)·resX, y0 − (row+0.5)·resY) — north-up raster, row 0
    * is the top (max-y) row, matching GDAL/rasterio.
    */
  final case class GeoInfo(rows: Int, cols: Int, x0: Double, y0: Double,
      resX: Double, resY: Double)

  // ------------------------------------------------------------------ read

  /** Header-only read: dimensions + geotransform — seeks the IFD through
    * the positioned-read stream, never fetches pixel data.
    */
  def info(spark: SparkSession, path: String): GeoInfo = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    require(st.isFile, s"$path: not a plain file")
    val in = fs.open(p)
    try {
      val reader = ImageIO.getImageReadersByFormatName("TIFF").next()
      reader.setInput(new FsImageInputStream(in, st.getLen))
      try decodeInfo(reader) finally reader.dispose()
    } finally in.close()
  }

  /** Full or windowed scan of band 1 → pixel relation
    * `(row int, col int, value double)`, decoded on the executors in
    * `bandRows`-row stripes. `window` is (rowMin, colMin, rowMax, colMax)
    * inclusive, the reference's index-slice read — stripes outside it are
    * never decoded (partition-level pruning), columns are sliced inside
    * the decode region.
    */
  def read(spark: SparkSession, path: String,
      window: Option[(Int, Int, Int, Int)] = None,
      bandRows: Int = 512, knownInfo: Option[GeoInfo] = None): DataFrame = {
    val gi = knownInfo.getOrElse(info(spark, path))
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val (r0, c0, r1, c1) = window.getOrElse((0, 0, gi.rows - 1, gi.cols - 1))
    require(r0 >= 0 && c0 >= 0 && r1 < gi.rows && c1 < gi.cols && r0 <= r1 && c0 <= c1,
      s"window ($r0,$c0,$r1,$c1) outside raster ${gi.rows}x${gi.cols}")
    val stripes = (r0 to r1 by bandRows).map(lo => (lo, math.min(lo + bandRows - 1, r1)))
    val rdd = spark.sparkContext.parallelize(stripes, stripes.length)
      .mapPartitions { it =>
        val stripeList = it.toArray
        if (stripeList.isEmpty) Iterator.empty
        else {
          // seekable stream straight over the (possibly remote) file: the
          // TIFF reader then fetches ONLY the strips intersecting each
          // sourceRegion — no task ever holds the whole file. The session
          // Hadoop conf (s3a credentials etc.) ships via the public
          // @DeveloperApi SerializableConfiguration.
          val p = new Path(path)
          val fs = p.getFileSystem(confSer.value)
          val len = fs.getFileStatus(p).getLen
          val in = fs.open(p)
          val reader = ImageIO.getImageReadersByFormatName("TIFF").next()
          reader.setInput(new FsImageInputStream(in, len))
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
            try reader.dispose() finally in.close()
          }
          stripeList.iterator.flatMap { case (lo, hi) =>
            val param = reader.getDefaultReadParam
            param.setSourceRegion(new Rectangle(c0, lo, c1 - c0 + 1, hi - lo + 1))
            val img = reader.read(0, param)
            val raster = img.getRaster
            for {
              rr <- (0 until raster.getHeight).iterator
              cc <- (0 until raster.getWidth).iterator
            } yield Row(lo + rr, c0 + cc, raster.getSampleDouble(cc, rr, 0))
          }
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("row", IntegerType, nullable = false),
      StructField("col", IntegerType, nullable = false),
      StructField("value", DoubleType, nullable = false))))
  }

  /** Pixel relation + x/y cell-center coordinates from the geotransform
    * (the shape every spatial-join consumer wants).
    */
  def readWithCoords(spark: SparkSession, path: String,
      window: Option[(Int, Int, Int, Int)] = None): DataFrame = {
    val gi = info(spark, path)
    read(spark, path, window, knownInfo = Some(gi))
      .withColumn("x", lit(gi.x0) + (col("col") + 0.5d) * gi.resX)
      .withColumn("y", lit(gi.y0) - (col("row") + 0.5d) * gi.resY)
  }

  private def decodeInfo(reader: javax.imageio.ImageReader): GeoInfo = {
    val w = reader.getWidth(0); val h = reader.getHeight(0)
    val dir = TIFFDirectory.createFromMetadata(reader.getImageMetadata(0))
    def doubles(tag: Int): Option[Array[Double]] =
      Option(dir.getTIFFField(tag)).map { f =>
        (0 until f.getCount).map(f.getAsDouble).toArray
      }
    val scale = doubles(33550)
    val tie = doubles(33922)
    (scale, tie) match {
      case (Some(s), Some(t)) if s.length >= 2 && t.length >= 6 =>
        // tiepoint (i,j,k)->(x,y,z); standard form anchors pixel (0,0)
        val x0 = t(3) - t(0) * s(0)
        val y0 = t(4) + t(1) * s(1)
        GeoInfo(h, w, x0, y0, s(0), s(1))
      case _ => GeoInfo(h, w, 0.0, h.toDouble, 1.0, 1.0) // pixel space
    }
  }

  // ----------------------------------------------------------------- write

  /** array2raster: pixel relation → single GeoTIFF, float32 samples,
    * PackBits (the reference's PACKBITS), geo tags for EPSG:4326.
    * Bounded driver-side assembly like the reference's GDAL write; refuses
    * rasters over ~2·10⁸ cells (800 MB float) — bigger canvases stay in
    * the band-partitioned parquet raster format (`InputMaps.writeRaster`).
    * Missing (row, col) cells become `background`.
    */
  def write(pixels: DataFrame, gi: GeoInfo, path: String,
      background: Float = 0f): Unit = {
    require(gi.rows.toLong * gi.cols <= 200000000L,
      s"refusing driver-side assembly of ${gi.rows}x${gi.cols} cells; " +
        "use InputMaps.writeRaster for canvases beyond 2e8 cells")
    val cm = new java.awt.image.ComponentColorModel(
      java.awt.color.ColorSpace.getInstance(java.awt.color.ColorSpace.CS_GRAY),
      false, false, java.awt.Transparency.OPAQUE,
      java.awt.image.DataBuffer.TYPE_FLOAT)
    val raster = cm.createCompatibleWritableRaster(gi.cols, gi.rows)
    if (background != 0f) {
      var r = 0
      while (r < gi.rows) {
        var c = 0
        while (c < gi.cols) { raster.setSample(c, r, 0, background); c += 1 }
        r += 1
      }
    }
    // stream rows driver-side in sorted stripes to bound peak memory
    val it = pixels.select(col("row").cast("int"), col("col").cast("int"),
      col("value").cast("float")).toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      require(!row.isNullAt(0) && !row.isNullAt(1),
        "pixel relation has null row/col — clean the canvas before writing")
      val r = row.getInt(0); val c = row.getInt(1)
      require(r >= 0 && r < gi.rows && c >= 0 && c < gi.cols,
        s"pixel ($r,$c) outside ${gi.rows}x${gi.cols} canvas")
      // null value = background (stay at the fill), mirroring GDAL nodata
      if (!row.isNullAt(2)) raster.setSample(c, r, 0, row.getFloat(2))
    }
    val floatImg = new BufferedImage(cm, raster, false, null)

    val writer = ImageIO.getImageWritersByFormatName("TIFF").next()
    val out = new ByteArrayOutputStreamExposed()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("PackBits")
    val meta = geoMetadata(writer.getDefaultImageMetadata(
      ImageTypeSpecifier.createFromRenderedImage(floatImg), param), gi)
    writer.write(null, new javax.imageio.IIOImage(floatImg, null, meta), param)
    ios.close(); writer.dispose()

    val p = new Path(path)
    val fs = p.getFileSystem(pixels.sparkSession.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(out.toByteArray) finally os.close()
  }

  /** Attach ModelPixelScale + ModelTiepoint + a minimal EPSG:4326 GeoKey
    * directory to the writer metadata.
    */
  private def geoMetadata(meta: IIOMetadata, gi: GeoInfo): IIOMetadata = {
    val dir = TIFFDirectory.createFromMetadata(meta)
    val geoSet = new TIFFTagSet(java.util.Arrays.asList(
      new TIFFTag("ModelPixelScaleTag", 33550, 1 << TIFFTag.TIFF_DOUBLE),
      new TIFFTag("ModelTiepointTag", 33922, 1 << TIFFTag.TIFF_DOUBLE),
      new TIFFTag("GeoKeyDirectoryTag", 34735, 1 << TIFFTag.TIFF_SHORT))) {}
    def dbl(tagNum: Int, vals: Array[Double]): TIFFField =
      new TIFFField(geoSet.getTag(tagNum), TIFFTag.TIFF_DOUBLE, vals.length, vals)
    dir.addTIFFField(dbl(33550, Array(gi.resX, gi.resY, 0.0)))
    dir.addTIFFField(dbl(33922, Array(0.0, 0.0, 0.0, gi.x0, gi.y0, 0.0)))
    // GeoKey directory: version 1.1.0, 3 keys — model type 2 (geographic),
    // raster type 1 (pixel-is-area), geographic CRS 4326
    val keys: Array[Char] = Array(
      1, 1, 0, 3,
      1024, 0, 1, 2,
      1025, 0, 1, 1,
      2048, 0, 1, 4326).map(_.toChar)
    dir.addTIFFField(new TIFFField(geoSet.getTag(34735), TIFFTag.TIFF_SHORT,
      keys.length, keys))
    dir.getAsMetadata
  }

  private class ByteArrayOutputStreamExposed extends java.io.ByteArrayOutputStream

  /** Seekable ImageIO stream over a Hadoop `FSDataInputStream` with a
    * small read-ahead buffer: positioned reads against hdfs/s3a/local,
    * no whole-file copy. The TIFF reader seeks to the IFD and then to
    * exactly the strips its sourceRegion needs.
    */
  private class FsImageInputStream(in: org.apache.hadoop.fs.FSDataInputStream,
      len: Long, bufSize: Int = 1 << 16)
      extends javax.imageio.stream.ImageInputStreamImpl {
    private val buf = new Array[Byte](bufSize)
    private var bufStart: Long = 0L
    private var bufLen: Int = 0

    private def fill(pos: Long): Unit = {
      val want = math.min(bufSize.toLong, len - pos).toInt
      if (want <= 0) { bufStart = pos; bufLen = 0 }
      else {
        in.readFully(pos, buf, 0, want)
        bufStart = pos; bufLen = want
      }
    }

    override def read(): Int = {
      bitOffset = 0
      if (streamPos >= len) -1
      else {
        if (streamPos < bufStart || streamPos >= bufStart + bufLen) fill(streamPos)
        val b = buf((streamPos - bufStart).toInt) & 0xff
        streamPos += 1
        b
      }
    }

    override def read(b: Array[Byte], off: Int, n: Int): Int = {
      bitOffset = 0
      if (streamPos >= len) -1
      else {
        val take = math.min(n.toLong, len - streamPos).toInt
        if (take >= bufSize) {
          in.readFully(streamPos, b, off, take) // large read: bypass buffer
        } else {
          if (streamPos < bufStart || streamPos + take > bufStart + bufLen) fill(streamPos)
          System.arraycopy(buf, (streamPos - bufStart).toInt, b, off, take)
        }
        streamPos += take
        take
      }
    }

    override def length(): Long = len
  }

}
