package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata-regeneration drift tripwire. Round 7 lost every
  * events-derived query (35 of 88) because the driver regenerated
  * `events.ts` as parquet `timestamp[us]` where earlier rounds shipped
  * `timestamp[ns]` (read as raw Long via the nanosAsLong conf) — the
  * breakage only surfaced inside the driver's own gate, as a wall of
  * identical analysis errors. These tests fail `sbt test` loudly
  * instead, with the drifted schema in the message, and pin
  * `Tables.events`' normalization across every physical encoding of
  * `ts` the generator has shipped or could ship.
  */
class SchemaDriftSpec extends AnyFunSuite {
  import SparkTestBase.{sf, spark}

  test("htaPoints canonical schema holds on the shipped testdata") {
    val pts = Tables.htaPoints(spark, sf)
    assert(
      pts.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        Seq(("metric", StringType), ("time", LongType),
          ("value", DoubleType), ("seq", LongType)),
      s"events-derived schema drifted:\n${pts.schema.treeString}")
    assert(pts.limit(1).count() == 1, "events.parquet is empty")
  }

  test("every TESTDATA table is readable with at least one row") {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      assert(Tables.read(spark, sf, t).limit(1).count() == 1,
        s"table $t unreadable or empty")
    }
  }

  test("events.ts normalizes identically across long-ns, ntz, and ltz") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    // µs instants incl. a sub-second tail — the normalized value must be
    // exact ns, not second- or ms-floored
    val us = Seq(1704067200000000L, 1704067200123456L, 1706659199999999L)
    val base = us.zipWithIndex
      .map { case (u, i) => (i.toLong, u, i.toLong, s"m$i", i * 1.5, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val variants = Map(
      "long" -> (col("us") * 1000L),
      "ntz" -> timestamp_micros(col("us")).cast(TimestampNTZType),
      "ltz" -> timestamp_micros(col("us")))
    val readBack = variants.map { case (name, tsCol) =>
      base.withColumn("ts", tsCol).drop("us")
        .write.mode("overwrite").parquet(s"$dir/$name/events.parquet")
      val got = Tables.events(spark, s"$dir/$name")
      assert(got.schema("ts").dataType == LongType,
        s"$name: ts not normalized to Long ns")
      name -> got.select("event_id", "ts").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
    }
    val expected = us.zipWithIndex.map { case (u, i) => (i.toLong, u * 1000L) }
    readBack.foreach { case (name, rows) =>
      assert(rows == expected, s"variant $name mismatched: $rows")
    }
  }
}
