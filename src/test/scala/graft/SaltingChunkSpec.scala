package graft

import graft.operators.{Ingest, Salting}
import graft.sources.{ChunkDecode, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingChunkSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import SparkTestBase.sf
  import spark.implicits._

  test("salted two-phase aggregation equals direct aggregation") {
    val pts = Ingest.quantized(Ingest.sanitize(Tables.htaPoints(spark, sf)))
    val salted = Salting.saltedPointAgg(pts, Seq("metric"), "seq", 16)
      .as[(String, Double, Double, Long, Long)].collect().sortBy(_._1)
    val direct = pts.groupBy("metric").agg(
      min("value").as("min_v"), max("value").as("max_v"),
      sum("value_c").as("sum_c"), count(lit(1)).as("cnt"))
      .as[(String, Double, Double, Long, Long)].collect().sortBy(_._1)
    assert(salted.toSeq == direct.toSeq)
    // and the salt really splits keys (stage-1 cardinality > key count)
    val n1 = pts.withColumn("__salt", Salting.salt(col("seq"), 16))
      .select("metric", "__salt").distinct().count()
    assert(n1 > 5)
  }

  test("kafka wire adapter: JSON payload round-trips through fromKafkaPayload") {
    val chunks = ChunkDecode.encode(Tables.htaPoints(spark, sf), 100)
    // fake the Kafka frame shape: binary key/value, value = JSON chunk
    val kafkaShaped = chunks
      .select(col("metric").cast("binary").as("key"),
        to_json(struct(col("metric"), col("chunk_id"),
          col("time_delta"), col("value"))).cast("binary").as("value"))
      .withColumn("garbage", lit("{not json"))
    val withNoise = kafkaShaped.select(col("key"), col("value"))
      .unionByName(kafkaShaped.select(col("key"),
        col("garbage").cast("binary").as("value")))
    val decoded = ChunkDecode.decode(ChunkDecode.fromKafkaPayload(withNoise))
      .select("metric", "time", "value")
    val original = Tables.htaPoints(spark, sf).select("metric", "time", "value")
    assert(decoded.exceptAll(original).isEmpty &&
      original.exceptAll(decoded).isEmpty)
  }

  test("chunk encode is a real delta encoding; decode inverts it") {
    val chunks = ChunkDecode.encode(Tables.htaPoints(spark, sf), 100).cache()
    // wire shape: bounded chunks, deltas small except the first-absolute
    val sizes = chunks.select(size(col("time_delta"))).as[Int].collect()
    assert(sizes.max <= 100 && sizes.min >= 1)
    val firstDeltas = chunks.select(element_at(col("time_delta"), 1))
      .as[Long].collect()
    assert(firstDeltas.forall(_ > 1000000000000000000L)) // absolute epochs
    val decoded = ChunkDecode.decode(chunks)
      .select("metric", "time", "value")
    val original = Tables.htaPoints(spark, sf)
      .select("metric", "time", "value")
    assert(decoded.exceptAll(original).isEmpty &&
      original.exceptAll(decoded).isEmpty)
  }
}
