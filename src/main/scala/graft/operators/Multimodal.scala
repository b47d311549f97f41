package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.10): media as opaque `binary`
  * columns with typed metadata, feature extraction as a per-partition
  * batch pass.
  *
  * The decode step is a clearly-marked STUB — this container has no
  * image/audio codecs — but everything Spark-side is real: the schema
  * (`blob: binary` + metadata), the partition-batched execution shape
  * (`mapPartitions` over a typed Dataset, the Scala analogue of
  * `mapInPandas` batches), and deterministic feature output. A real
  * deployment swaps [[decodeStub]] for an actual codec; nothing else
  * changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, blob: Array[Byte], fmt: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, sha: String, head_byte: Long)

  /** Wrap documents as a media table: utf-8 bytes stand in for media
    * payloads; `fmt` is the typed metadata column.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      lit("text/plain").as("fmt"))

  /** STUB decode: a real implementation would decode the payload
    * (image → pixels, audio → samples) here. The stub derives
    * deterministic features from raw bytes so the plumbing is testable.
    * The "codec" (digest) is initialized by the caller once per
    * partition and reset per row — the execution shape a real decoder
    * needs.
    */
  private def decodeStub(md: java.security.MessageDigest, m: MediaRow): MediaFeatures = {
    md.reset()
    val hex = md.digest(m.blob).map("%02x".format(_)).mkString
    MediaFeatures(m.doc_id, m.blob.length.toLong, hex,
      m.blob.headOption.map(b => (b & 0xff).toLong).getOrElse(-1L))
  }

  /** Per-partition batched feature extraction (one codec init per
    * partition in a real decoder — the reason for mapPartitions, not map).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { it =>
      // codec init once per partition, streamed over the batch
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(decodeStub(md, _))
    }.toDF()
  }
}
