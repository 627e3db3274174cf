package graft.multimodal

/** Pure-JDK video CONTAINER header parsers (see `Multimodal.decodeVideoMeta`).
  *
  * Both formats are public, length-prefixed byte structures that need no
  * codec to read:
  *
  *  - AVI = RIFF (little-endian): `RIFF <size> AVI ` followed by chunks;
  *    `LIST` chunks nest. The `avih` MainAVIHeader carries µs-per-frame,
  *    total frames, width, height; each stream's `strh` carries its fourcc
  *    type and the dwRate/dwScale rational (exact fps for `vids`).
  *  - MP4 = ISO base media (big-endian): `<size><type>` boxes; `moov`,
  *    `trak`, `mdia`, `minf`, `stbl` nest. `mvhd` carries the movie
  *    timescale/duration, `tkhd` the 16.16-fixed presentation size,
  *    `mdhd` the media timescale and `stts` the (count, delta) sample
  *    table — fps = timescale / delta when sampling is uniform.
  *
  * All reads are bounds-checked; any structural violation returns None
  * (null metadata) rather than throwing — a corrupt payload must never
  * fail the partition.
  */
private[graft] object VideoContainers {

  type Meta = (String, Int, Int, Double, Long, Long)

  def parse(b: Array[Byte]): Option[Meta] =
    try {
      if (fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ") parseAvi(b)
      else if (b.length >= 12 && fourcc(b, 4) == "ftyp") parseMp4(b)
      else None
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------ AVI

  private def parseAvi(b: Array[Byte]): Option[Meta] = {
    var width = -1; var height = -1; var frames = -1L; var usPerFrame = -1L
    var fps = -1.0
    // walk chunks from offset 12 (after RIFF header), recursing into LISTs
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fourcc(b, off)
        // size is UNSIGNED 32-bit: keep it Long end-to-end. Truncating to
        // Int lets a corrupt size >= 2^31 go negative, making `off`
        // stationary — an infinite loop inside an executor task that the
        // caller's catch never sees (it never throws)
        val size = u32le(b, off + 4)
        val body = off + 8
        val end = math.min(to.toLong, body.toLong + size).toInt
        id match {
          case "LIST" if end - body >= 4 => walk(body + 4, end) // skip list type
          case "avih" if end - body >= 40 =>
            usPerFrame = u32le(b, body)
            frames = u32le(b, body + 16)
            width = u32le(b, body + 32).toInt
            height = u32le(b, body + 36).toInt
          case "strh" if end - body >= 28 && fourcc(b, body) == "vids" && fps < 0 =>
            val scale = u32le(b, body + 20)
            val rate = u32le(b, body + 24)
            if (scale > 0) fps = rate.toDouble / scale
          case _ =>
        }
        val next = body.toLong + size + (size & 1L) // chunks are word-aligned
        if (next > to) return // truncated/corrupt tail: stop, keep findings
        off = next.toInt
      }
    }
    walk(12, b.length)
    if (width < 0 || frames < 0) None
    else {
      // prefer the exact stream rational; fall back to µs-per-frame
      val f = if (fps > 0) fps
        else if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
      val durUs =
        if (usPerFrame > 0) frames * usPerFrame
        else if (f > 0) math.round(frames * 1e6 / f) else 0L
      Some(("avi", width, height, f, durUs, frames))
    }
  }

  // ------------------------------------------------------------------ MP4

  private def parseMp4(b: Array[Byte]): Option[Meta] = {
    var width = -1; var height = -1
    var mvTimescale = -1L; var mvDuration = -1L
    var mdTimescale = -1L; var sttsCount = -1L; var sttsDelta = -1L
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val size = u32be(b, off) // unsigned — Long arithmetic throughout
        if (size < 8) return // size64/odd boxes: stop rather than misparse
        val id = fourcc(b, off + 4)
        val body = off + 8
        val end = math.min(to.toLong, off.toLong + size).toInt
        id match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" => walk(body, end)
          case "mvhd" if end - body >= 20 && b(body) == 0 => // version 0
            mvTimescale = u32be(b, body + 12)
            mvDuration = u32be(b, body + 16)
          case "tkhd" if end - body >= 84 && b(body) == 0 && width < 0 =>
            width = (u32be(b, body + 76) >> 16).toInt  // 16.16 fixed
            height = (u32be(b, body + 80) >> 16).toInt
          case "mdhd" if end - body >= 20 && b(body) == 0 && mdTimescale < 0 =>
            mdTimescale = u32be(b, body + 12)
          case "stts" if end - body >= 16 && sttsDelta < 0 =>
            val entries = u32be(b, body + 4)
            if (entries >= 1) {
              sttsCount = u32be(b, body + 8)
              sttsDelta = u32be(b, body + 12)
            }
          case _ =>
        }
        val next = off.toLong + size
        if (next > to) return // truncated/corrupt tail box
        off = next.toInt
      }
    }
    walk(0, b.length)
    if (mvTimescale <= 0 || width < 0) None
    else {
      val fps = if (mdTimescale > 0 && sttsDelta > 0)
        mdTimescale.toDouble / sttsDelta else 0.0
      val durUs = mvDuration * 1000000L / mvTimescale
      Some(("mp4", width, height, fps, durUs, math.max(sttsCount, 0L)))
    }
  }

  // ------------------------------------------------------------- primitives

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  // ------------------------------------------------ synthesis (test/q94)

  /** Minimal valid AVI bytes: RIFF(AVI ) → LIST(hdrl){ avih, LIST(strl){
    * strh(vids) } } → LIST(movi){}. Used by specs and the q94 gate to
    * plant arithmetically-known headers; real players parse these.
    */
  def synthAvi(width: Int, height: Int, frames: Long, rate: Long,
      scale: Long): Array[Byte] = {
    val usPerFrame = 1000000L * scale / rate
    val avih = new Array[Byte](56)
    putU32le(avih, 0, usPerFrame)
    putU32le(avih, 16, frames)
    putU32le(avih, 24, 1L) // dwStreams
    putU32le(avih, 32, width.toLong)
    putU32le(avih, 36, height.toLong)
    val strh = new Array[Byte](56)
    strh(0) = 'v'; strh(1) = 'i'; strh(2) = 'd'; strh(3) = 's'
    putU32le(strh, 20, scale)
    putU32le(strh, 24, rate)
    putU32le(strh, 32, frames) // dwLength
    val strl = list("strl", chunk("strh", strh))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    val movi = list("movi", Array.empty[Byte])
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    chunkLe("RIFF", payload)
  }

  /** Minimal valid MP4 bytes: ftyp + moov{ mvhd, trak{ tkhd, mdia{ mdhd,
    * minf{ stbl{ stts } } } } }. 16.16-fixed size in tkhd, uniform stts.
    */
  def synthMp4(width: Int, height: Int, movTimescale: Long, movDuration: Long,
      mediaTimescale: Long, sampleCount: Long, sampleDelta: Long): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ beU32(0x200) ++
      "isomiso2".getBytes("US-ASCII"))
    val mvhdB = new Array[Byte](100) // version0 mvhd body
    putU32be(mvhdB, 12, movTimescale)
    putU32be(mvhdB, 16, movDuration)
    val tkhdB = new Array[Byte](84)
    putU32be(tkhdB, 76, width.toLong << 16)
    putU32be(tkhdB, 80, height.toLong << 16)
    val mdhdB = new Array[Byte](24)
    putU32be(mdhdB, 12, mediaTimescale)
    putU32be(mdhdB, 16, movDuration * mediaTimescale / movTimescale)
    val sttsB = new Array[Byte](16)
    putU32be(sttsB, 4, 1L)
    putU32be(sttsB, 8, sampleCount)
    putU32be(sttsB, 12, sampleDelta)
    val stbl = box("stbl", box("stts", sttsB))
    val minf = box("minf", stbl)
    val mdia = box("mdia", box("mdhd", mdhdB) ++ minf)
    val trak = box("trak", box("tkhd", tkhdB) ++ mdia)
    val moov = box("moov", box("mvhd", mvhdB) ++ trak)
    ftyp ++ moov
  }

  // ------------------------------------------------ MJPEG (frame layer)

  /** One solid-gray frame as a REAL JPEG via the JDK's ImageIO writer, at
    * explicit high quality so DC quantization error (±2 luma) stays far
    * inside the 64-level grid the gate query plants on.
    */
  def jpegGray(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(gray, gray, gray))
    g.fillRect(0, 0, width, height)
    g.dispose()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.92f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { ios.close(); w.dispose() }
    bos.toByteArray
  }

  /** A REAL MJPEG AVI: [[synthAvi]]'s header structure plus an `strf`
    * BITMAPINFOHEADER (biCompression 'MJPG') and a `movi` LIST whose
    * `00dc` chunks are genuine ImageIO JPEGs — frame f solid gray
    * `grays(f)`. Every layer is real bytes a player would accept: RIFF
    * structure, MJPG stream headers, JPEG payloads.
    */
  def synthMjpegAvi(width: Int, height: Int, rate: Long, scale: Long,
      grays: Seq[Int]): Array[Byte] = {
    val usPerFrame = 1000000L * scale / rate
    val avih = new Array[Byte](56)
    putU32le(avih, 0, usPerFrame)
    putU32le(avih, 16, grays.length.toLong)
    putU32le(avih, 24, 1L) // dwStreams
    putU32le(avih, 32, width.toLong)
    putU32le(avih, 36, height.toLong)
    val strh = new Array[Byte](56)
    strh(0) = 'v'; strh(1) = 'i'; strh(2) = 'd'; strh(3) = 's'
    strh(4) = 'M'; strh(5) = 'J'; strh(6) = 'P'; strh(7) = 'G'
    putU32le(strh, 20, scale)
    putU32le(strh, 24, rate)
    putU32le(strh, 32, grays.length.toLong) // dwLength
    val strf = new Array[Byte](40) // BITMAPINFOHEADER
    putU32le(strf, 0, 40L)
    putU32le(strf, 4, width.toLong)
    putU32le(strf, 8, height.toLong)
    strf(12) = 1 // biPlanes (u16le)
    strf(14) = 24 // biBitCount (u16le)
    strf(16) = 'M'; strf(17) = 'J'; strf(18) = 'P'; strf(19) = 'G'
    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    val movi = list("movi",
      grays.toArray.flatMap(g => chunk("00dc", jpegGray(width, height, g))))
    chunkLe("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  /** The video frame payloads of an AVI — the `##dc`/`##db` chunks of its
    * `movi` LIST, in stream order. For an MJPEG stream each payload is a
    * standalone JPEG.
    */
  def aviFramePayloads(b: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fourcc(b, off)
        val size = u32le(b, off + 4) // unsigned — same Long discipline as parseAvi
        val body = off + 8
        val end = math.min(to.toLong, body.toLong + size).toInt
        if (id == "LIST" && end - body >= 4)
          walk(body + 4, end, inMovi || fourcc(b, body) == "movi")
        else if (inMovi && id.length == 4 &&
            Character.isLetterOrDigit(id(0)) && Character.isLetterOrDigit(id(1)) &&
            id(2) == 'd' && (id(3) == 'c' || id(3) == 'b'))
          out += java.util.Arrays.copyOfRange(b, body, end)
        val next = body.toLong + size + (size & 1L) // chunks are word-aligned
        if (next > to) return // truncated/corrupt tail chunk
        off = next.toInt
      }
    }
    if (b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ")
      walk(12, b.length, inMovi = false)
    out.toIndexedSeq
  }

  private def putU32le(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def putU32be(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = ((v >> 24) & 0xff).toByte; b(off + 1) = ((v >> 16) & 0xff).toByte
    b(off + 2) = ((v >> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
  }

  private def beU32(v: Long): Array[Byte] = {
    val b = new Array[Byte](4); putU32be(b, 0, v); b
  }

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
    id.getBytes("US-ASCII") ++ leU32(body.length.toLong) ++ padded
  }

  private def chunkLe(id: String, body: Array[Byte]): Array[Byte] =
    chunk(id, body)

  private def list(tpe: String, inner: Array[Byte]): Array[Byte] =
    chunk("LIST", tpe.getBytes("US-ASCII") ++ inner)

  private def leU32(v: Long): Array[Byte] = {
    val b = new Array[Byte](4); putU32le(b, 0, v); b
  }

  private def box(tpe: String, body: Array[Byte]): Array[Byte] =
    beU32(body.length + 8L) ++ tpe.getBytes("US-ASCII") ++ body
}
