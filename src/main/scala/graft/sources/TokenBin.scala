package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Packed-token binary sink/source — the "last mile" between a
  * tokenized corpus and a trainer's data loader. Megatron-inspired
  * two-file layout (NOT byte-compatible with any external tool —
  * the format is fully specified here and gated by its own round-trip
  * oracle, q208):
  *
  *  - `part-NNNNN.bin`: every sequence's token ids concatenated,
  *    little-endian uint16 (ids must be in `[0, 65536)` — vocab-sized
  *    by construction; violations fail the write loudly);
  *  - `part-NNNNN.idx`: magic `GRFTBIN1`, then int64 sequence count,
  *    then per sequence `(seq_id int64, offset int64, n_tokens int64)`
  *    — offset in TOKENS into the shard's `.bin`, rows in write
  *    order.
  *
  * Why a binary layout at all: a trainer reads token streams
  * sequentially billions of times; parquet's general-purpose decode is
  * wasted there, while `(seek offset·2, read n·2)` is one syscall per
  * sequence and memory-maps cleanly. Writing stays fully distributed —
  * one `(bin, idx)` pair per partition (pre-`repartition` to the shard
  * count; at 100 TB that is tens of thousands of independent tasks) —
  * and reading parallelizes per shard with the idx consulted first, so
  * a sliced read touches only the token ranges it needs.
  */
object TokenBin {

  val magic: Array[Byte] = "GRFTBIN1".getBytes("US-ASCII")

  /** Write `(seqIdCol long, tokensCol array<int>)` as token-bin
    * shards, one `(bin, idx)` pair per partition.
    */
  def write(seqs: DataFrame, seqIdCol: String, tokensCol: String,
      path: String): Unit = {
    val spark = seqs.sparkSession
    val confSer = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    seqs.select(col(seqIdCol).cast("long"), col(tokensCol)).rdd
      .mapPartitionsWithIndex { (ix, it) =>
        val binPath = new Path(path, f"part-$ix%05d.bin")
        val idxPath = new Path(path, f"part-$ix%05d.idx")
        val fsx = binPath.getFileSystem(confSer.value)
        val bin = fsx.create(binPath, true)
        val entries = Vector.newBuilder[(Long, Long, Long)]
        var off = 0L
        try {
          it.foreach { r =>
            val id = r.getLong(0)
            // read as boxed values so a null array / null element is
            // refused loudly (naming the sequence) instead of NPEing
            // opaquely at unboxing
            val raw = r.getSeq[Any](1)
            require(raw != null, s"null token array in sequence $id — " +
              "filter or fill nulls before writing")
            val bb = ByteBuffer.allocate(raw.length * 2)
              .order(ByteOrder.LITTLE_ENDIAN)
            val toks = raw.map { e =>
              require(e != null, s"null token in sequence $id — " +
                "filter or fill nulls before writing")
              e.asInstanceOf[Int]
            }
            toks.foreach { t =>
              require(t >= 0 && t < 65536,
                s"token id $t in sequence $id outside uint16 — " +
                  "re-map the vocabulary before writing")
              bb.putShort((t & 0xFFFF).toShort)
            }
            bin.write(bb.array())
            entries += ((id, off, toks.length.toLong))
            off += toks.length
          }
        } finally bin.close()
        val es = entries.result()
        val ib = ByteBuffer.allocate(magic.length + 8 + es.length * 24)
          .order(ByteOrder.LITTLE_ENDIAN)
        ib.put(magic).putLong(es.length.toLong)
        es.foreach { case (id, o, n) => ib.putLong(id).putLong(o).putLong(n) }
        val idx = fsx.create(idxPath, true)
        try idx.write(ib.array()) finally idx.close()
        Iterator.single(es.length)
      }
      .count(): Unit
  }

  /** Scan token-bin shards back to `(seq_id long, tokens array<int>)`
    * — one task per shard, idx parsed first, token ranges sliced from
    * the bin. The written relation and the read-back relation are
    * value-identical (q208 gates it through the tokenization oracle).
    *
    * `idRange = Some((lo, hi))` is the sliced-read path: the idx (24
    * bytes/sequence) is still read whole, but only entries with
    * `lo <= seq_id <= hi` touch the `.bin` — bytes read scale with the
    * SLICE, not the shard, which is the point of the two-file layout.
    */
  def read(spark: SparkSession, path: String,
      idRange: Option[(Long, Long)] = None): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive: a streaming sink lays out batch-NNNNNN/ subdirs
    // (EventStream.tokenBinStream) — one listing serves both layouts
    val it = fs.listFiles(root, true)
    val sb = Seq.newBuilder[String]
    val committed = scala.collection.mutable.Map.empty[Path, Boolean]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".idx")) {
        // streaming batch dirs commit via _SUCCESS — skip uncommitted
        // (possibly partial) ones; plain write() dirs have no marker
        // convention and are always read
        val parent = s.getPath.getParent
        val ok = if (!parent.getName.startsWith("batch-")) true
          else committed.getOrElseUpdate(parent,
            fs.exists(new Path(parent, "_SUCCESS")))
        if (ok) sb += s.getPath.toString
      }
    }
    val shards = sb.result().sorted
    val confSer = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val rows = spark.sparkContext
      .parallelize(shards, math.max(1, shards.length))
      .flatMap { idxName =>
        val idxPath = new Path(idxName)
        val binPath = new Path(idxName.stripSuffix(".idx") + ".bin")
        val fsx = idxPath.getFileSystem(confSer.value)
        val idxLen = fsx.getFileStatus(idxPath).getLen.toInt
        val idxRaw = new Array[Byte](idxLen)
        val in = fsx.open(idxPath)
        try in.readFully(0L, idxRaw) finally in.close()
        val ib = ByteBuffer.wrap(idxRaw).order(ByteOrder.LITTLE_ENDIAN)
        val m = new Array[Byte](magic.length)
        ib.get(m)
        require(java.util.Arrays.equals(m, magic),
          s"$idxName: bad magic — not a token-bin idx")
        val n = ib.getLong.toInt
        val entries = (0 until n).map { _ =>
          (ib.getLong, ib.getLong, ib.getLong) }
          .filter { case (id, _, _) =>
            idRange.forall { case (lo, hi) => id >= lo && id <= hi } }
        if (entries.isEmpty) Iterator.empty
        else {
        val bin = fsx.open(binPath)
        try {
          entries.iterator.map { case (id, off, len) =>
            val buf = new Array[Byte](len.toInt * 2)
            bin.readFully(off * 2, buf)
            val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
            val toks = new Array[Int](len.toInt)
            var i = 0
            while (i < toks.length) { toks(i) = bb.getShort & 0xFFFF; i += 1 }
            org.apache.spark.sql.Row(id, toks.toSeq)
          }.toVector.iterator
        } finally bin.close()
        }
      }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("seq_id", LongType),
      StructField("tokens", ArrayType(IntegerType)))))
  }
}
