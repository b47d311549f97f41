package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the durable bench-output contract against the driver's
  * measured 2000-character stdout tail window (BENCH_r05–r07 tail
  * fields). No Spark session needed — the contract is pure string
  * shape. Since round 12 the line keeps itself under budget at ANY
  * query count by dropping the FASTEST entries when it must (`nq`
  * reports the true count, so the omission is visible) — the horizon
  * tests below hold the contract well past the next rounds' growth.
  */
class BenchContractSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  // worst-case values under the adaptive format: 9.999 renders as
  // "10.0" (4 chars — %.1f applies below 10 and rounds up), the
  // WIDEST a per-query value can EVER print — whole seconds from 10 s
  // ("1000" for 999.999) and a hard "9999" saturation above 9999.5 s
  // close every wider escape; the saturation test below proves the cap
  private def line = Bench.compactLine(
    SparkEntry.queries.keys.map(_ -> 9.999).toMap, 999999.999, sf)

  test("per-query values saturate at 4 chars; the total never saturates") {
    val worst = Bench.compactLine(
      SparkEntry.queries.keys.map(_ -> 123456789.999).toMap,
      123456789.999, sf)
    assert(worst.contains("\"value\":123456790.0"),
      "the headline total must report truthfully, never saturate")
    // every EMITTED per-query value is the 4-char "9999" ceiling —
    // no pathological width escapes into the dict
    val dict = worst.substring(worst.indexOf("\"queries\":"))
    assert("\\d{5,}".r.findFirstIn(
      dict.replace("123456790.0", "")).isEmpty,
      s"a per-query value escaped the 4-char cap:\n$worst")
    assert(worst.length <= 1900)
  }

  test("compact bench line fits the 2000-char tail with the sbt success line") {
    // the tail must hold the whole line PLUS sbt's trailing
    // "[success] Total time: …" (~80 chars) and two newlines — and
    // the budget must hold even at all-worst-case per-query widths
    assert(line.length <= 1900,
      s"compact bench line is ${line.length} chars — the driver's " +
        "2000-char tail capture will truncate it")
  }

  test("query-id prefixes are unique, so short keys lose nothing") {
    val ids = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSeq
    assert(ids.distinct.length == ids.length,
      s"duplicate query-id prefixes: ${ids.diff(ids.distinct).distinct}")
  }

  test("compact line parses as JSON; realistic timings carry every query") {
    // realistic per-query values (sub-second) — the full registry must
    // fit the budget whole WITH the protocol field the real run emits,
    // so the driver's per-query record stays complete in the steady
    // state; the worst-case width tests above cover the degraded mode
    val real = Bench.compactLine(
      SparkEntry.queries.keys.map(_ -> 0.123).toMap, 42.0, sf,
      protocol = "min-of-3-interleaved")
    assert(real.startsWith("""{"metric":"total""""))
    assert(real.count(_ == '{') == 2 && real.count(_ == '}') == 2)
    assert(real.contains(s""""nq":${SparkEntry.queries.size}"""))
    assert(real.contains(""""protocol":"min-of-3-interleaved""""))
    SparkEntry.queries.keys.foreach { k =>
      val short = "\"" + k.takeWhile(_ != '_') + "\":"
      assert(real.contains(short), s"missing $k as $short")
    }
    assert(real.length <= 1900)
  }

  test("the tail window absorbs the line plus a trailing-noise margin") {
    // the round-15 artifact defect was TRAILING noise, not line width:
    // the compact line was printed before spark.stop(), and a
    // state-store maintenance daemon logged a ~1.2 KB stack trace
    // after it — the 2000-char tail kept the noise and cut the line's
    // head (BENCH_r15 parsed:null). Bench now prints the line after
    // setLogLevel(OFF) + stop(), so the only legitimate trailing bytes
    // are sbt's "[success] Total time: …" line (~80 chars) — but the
    // budget must also absorb a margin of unexpected junk, or the next
    // stray WARN line silently returns the evidence to parsed:null.
    val noiseMargin = 100 // sbt [success] (~80) + newlines + slack
    val real = Bench.compactLine(
      SparkEntry.queries.keys.map(_ -> 0.123).toMap, 42.0, sf,
      protocol = "min-of-3-interleaved")
    assert(real.length + noiseMargin <= 2000,
      s"compact line (${real.length} chars) + $noiseMargin noise " +
        "chars exceeds the 2000-char tail — the full line would be " +
        "cut at its head by any trailing output")
  }

  test("contract holds past 200 queries: slowest entries kept, omission visible in nq") {
    // the growth horizon the next rounds walk into: 220 synthetic
    // queries at distinct timings. The line must stay parseable and
    // under budget, keep the SLOWEST (most informative) entries, and
    // say how many queries really ran so the partial dict can never
    // read as "covered everything"
    val vals = (1 to 220)
      .map(i => (f"x$i%03d_synthetic_growth_padding", i.toDouble)).toMap
    val synth = Bench.compactLine(vals, vals.values.sum, sf)
    assert(synth.length <= 1900,
      s"synthetic 220-query line is ${synth.length} chars")
    assert(synth.startsWith("""{"metric":"total"""") &&
      synth.count(_ == '{') == 2 && synth.count(_ == '}') == 2,
      s"not a single JSON object:\n$synth")
    assert(synth.contains("\"nq\":220"),
      "nq must report the TRUE query count — the no-silent-caps marker")
    assert(synth.contains("\"x220\":220"),
      "the slowest query must survive the cut")
    assert(!synth.contains("\"x001\":"),
      "the fastest query is the one that yields under budget pressure")
  }
}
