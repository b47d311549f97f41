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
}
