package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.10): media as opaque `binary`
  * columns with typed metadata, feature extraction as a per-partition
  * batch pass.
  *
  * The image decode path is REAL — `javax.imageio` ships with the JDK,
  * so PNG/JPEG/GIF/BMP payloads yield actual width/height/codec with no
  * added dependency, via a header-only probe (the reader reports
  * dimensions without rasterizing, so a 50 MB photo costs a few hundred
  * header bytes of work — the posture that matters when the blob column
  * is 100 TB). Non-image payloads (text, audio, unknown codecs) fall
  * back to byte-level features; audio/video decoding would slot into
  * the same per-partition probe with an external codec library.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, blob: Array[Byte], fmt: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, sha: String,
                           head_byte: Long, width: Long, height: Long,
                           codec: String)

  /** Wrap documents as a media table: utf-8 bytes stand in for media
    * payloads; `fmt` is the typed metadata column.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      lit("text/plain").as("fmt"))

  /** Header-only image probe: sniff a reader from the payload's magic
    * bytes, then ask it for dimensions — `getWidth(0)` parses the
    * header only (IHDR / SOF marker), never the raster. Returns None
    * for non-image payloads, truncated headers, or unknown codecs —
    * media columns in the wild are dirty, so any probe failure is a
    * clean fallback, never a task failure.
    */
  private def probeImage(blob: Array[Byte]): Option[(Long, Long, String)] = {
    // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
    // the factory defaults to a FileCacheImageInputStream, which creates
    // and deletes a disk temp file PER ROW — syscall churn for payloads
    // that are already byte arrays in memory
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getWidth(0).toLong, r.getHeight(0).toLong,
            r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** Decode one payload: image header probe for dimensions/codec,
    * byte-level features (digest, length, head byte) for every payload.
    * The digest is initialized by the caller once per partition and
    * reset per row — the execution shape any further codec needs.
    */
  private def decode(md: java.security.MessageDigest, m: MediaRow): MediaFeatures = {
    md.reset()
    val hex = md.digest(m.blob).map("%02x".format(_)).mkString
    val img = probeImage(m.blob)
    MediaFeatures(m.doc_id, m.blob.length.toLong, hex,
      m.blob.headOption.map(b => (b & 0xff).toLong).getOrElse(-1L),
      img.map(_._1).getOrElse(-1L), img.map(_._2).getOrElse(-1L),
      img.map(_._3).orNull)
  }

  /** Per-partition batched feature extraction (one codec init per
    * partition — the reason for mapPartitions, not map).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { it =>
      // codec init once per partition, streamed over the batch
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(decode(md, _))
    }.toDF()
  }

  /** Frame sampling over an opaque media payload — the video-style
    * access pattern: cut the blob into fixed `frameBytes` frames and
    * keep every `stride`-th, in pure codegen'd Column ops (sequence →
    * explode → BINARY substring; no UDF, no per-partition state
    * needed because slicing is not a codec). Emits each frame's byte
    * length and md5 instead of the raw frame, so downstream joins
    * move 48 bytes per frame, not the media — at 100 TB the sampled
    * frames feed a decode stage that runs on the md5-deduplicated
    * frame set, not the raw stream.
    */
  def frameSample(media: DataFrame, frameBytes: Int = 64,
                  stride: Int = 3): DataFrame = {
    require(frameBytes > 0 && stride > 0,
      s"frameBytes=$frameBytes and stride=$stride must be positive")
    val nFrames = expr(s"(length(blob) + ${frameBytes - 1}) div $frameBytes")
    media
      .withColumn("frame_idx",
        explode(when(nFrames > 0,
          sequence(lit(0L), nFrames - 1, lit(stride.toLong)))
          .otherwise(expr("array()").cast("array<bigint>"))))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("offset_bytes"),
        expr(s"substring(blob, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame"))
      .select(col("doc_id"), col("frame_idx"), col("offset_bytes"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
  }

  /** Cross-document frame-level dedup stats — the decode-budget
    * optimization [[frameSample]]'s contract enables: frames carrying
    * identical content (md5) need decoding ONCE corpus-wide, so the
    * real decode bill is the distinct-frame count, not the frame
    * count. Per document: sampled frames, distinct frames within the
    * doc, frames this doc OWNS (global first occurrence = min doc_id,
    * the x20/x69 canonical-owner rule at frame granularity), and the
    * owned fraction — duplicated media (re-uploads, shared intros,
    * watermark frames) shows up as owned_frac ≪ 1.
    *
    * Shape: one (md5) groupBy with partial aggregation, one md5
    * equi-join back, one per-doc aggregation. Nothing pairwise.
    */
  def frameDedup(media: DataFrame, frameBytes: Int = 64,
                 stride: Int = 1): DataFrame = {
    val frames = frameSample(media, frameBytes, stride)
      .select("doc_id", "frame_md5")
    val owners = frames.groupBy("frame_md5")
      .agg(min("doc_id").as("owner_id"))
    frames.join(owners, "frame_md5")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        countDistinct("frame_md5").as("n_distinct"),
        countDistinct(when(col("owner_id") === col("doc_id"),
          col("frame_md5"))).as("n_owned"))
      .withColumn("owned_frac",
        col("n_owned").cast("double") / col("n_distinct").cast("double"))
  }

  case class ResizeRow(doc_id: Long, orig_bytes: Long, resized_bytes: Long,
                       resized_md5: String)

  /** Media resize plumbing with a DETERMINISTIC STAND-IN scaler: the
    * container ships no raster codec, so the "resize" is byte
    * decimation (every `factor`-th byte) — a clearly-marked fake.
    * What is real and tested is the Spark-side shape a libjpeg/ffmpeg
    * binding would need: one codec/digest init per partition
    * (mapPartitions, the [[extractFeatures]] discipline), a typed row
    * schema, and size metadata out. Swapping in a true scaler changes
    * only the bytes→bytes function inside the loop.
    */
  def resizeStub(spark: SparkSession, media: DataFrame,
                 factor: Int = 4): DataFrame = {
    require(factor > 0, s"factor=$factor must be positive")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        md.reset()
        val out = Array.ofDim[Byte]((m.blob.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = m.blob(i * factor); i += 1 }
        ResizeRow(m.doc_id, m.blob.length.toLong, out.length.toLong,
          md.digest(out).map("%02x".format(_)).mkString)
      }
    }.toDF()
  }
}
