package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the durable bench-output contract against the driver's
  * measured 2000-character stdout tail window (BENCH_r05–r07 tail
  * fields). No Spark session needed — the contract is pure string
  * shape.
  */
class BenchContractSpec extends AnyFunSuite {

  // worst-case values under the adaptive format: 9.999 renders as
  // "10.0" (4 chars — %.1f applies below 10 and rounds up), the
  // WIDEST a per-query value can EVER print — whole seconds from 10 s
  // ("1000" for 999.999) and a hard "9999" saturation above 9999.5 s
  // close every wider escape; the saturation test below proves the cap
  private def line = Bench.compactLine(
    SparkEntry.queries.keys.map(_ -> 9.999).toMap,
    999999.999, "/root/testdata/sf0.1")

  test("per-query values saturate at 4 chars; the total never saturates") {
    val worst = Bench.compactLine(
      SparkEntry.queries.keys.map(_ -> 123456789.999).toMap,
      123456789.999, "/root/testdata/sf0.1")
    // same length as the 9.999 line except the total field's width
    assert(worst.length == line.length +
      ("123456790.0".length - "1000000.0".length),
      s"a pathological per-query value escaped the 4-char cap:\n$worst")
    assert(worst.contains("\"value\":123456790.0"),
      "the headline total must report truthfully, never saturate")
  }

  test("compact bench line fits the 2000-char tail with the sbt success line") {
    // the tail must hold the whole line PLUS sbt's trailing
    // "[success] Total time: …" (~80 chars) and two newlines
    assert(line.length <= 1900,
      s"compact bench line is ${line.length} chars — the driver's " +
        "2000-char tail capture will truncate it; shorten keys or values")
  }

  test("query-id prefixes are unique, so short keys lose nothing") {
    val ids = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSeq
    assert(ids.distinct.length == ids.length,
      s"duplicate query-id prefixes: ${ids.diff(ids.distinct).distinct}")
  }

  test("compact line parses as JSON with every query present") {
    // minimal structural check without a JSON library: balanced braces,
    // one entry per query, marker present exactly once
    assert(line.startsWith("""{"metric":"total""""))
    assert(line.count(_ == '{') == 2 && line.count(_ == '}') == 2)
    assert(line.count(_ == ':') >= SparkEntry.queries.size)
    SparkEntry.queries.keys.foreach { k =>
      val short = "\"" + k.takeWhile(_ != '_') + "\":"
      assert(line.contains(short), s"missing $k as $short")
    }
  }
}
