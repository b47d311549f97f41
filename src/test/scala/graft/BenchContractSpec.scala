package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the durable bench-output contract against the driver's
  * measured 2000-character stdout tail window (BENCH_r05–r07 tail
  * fields). No Spark session needed — the contract is pure string
  * shape. Since round 12 the line keeps itself under budget at ANY
  * query count by dropping the FASTEST entries when it must; since
  * round 16 (the registry outgrew the all-entries steady state at
  * 178 keys) the dropped tier is also ACCOUNTED — `ndrop` entries
  * summing to `drop_sum` seconds, with `nq` the true count — so a
  * partial dict can never read as "covered everything" and the
  * line's numbers still close to the total. The horizon tests below
  * hold the contract well past the next rounds' growth.
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

  test("compact line parses as JSON; every query is carried or drop-accounted") {
    // the registry outgrew the all-entries steady state at 178 keys
    // (round 16): with realistic sub-second values the line now
    // either carries every query OR carries the slowest individually
    // plus explicit drop accounting — ndrop entries summing to
    // drop_sum seconds — so nothing is ever silently absent (nq -
    // ndrop = |dict|, and full per-query precision lives in
    // BENCH_FULL.json + the layer-1 JSON + the BENCH lines)
    val n = SparkEntry.queries.size
    // distinct realistic values so the kept/dropped boundary is exact
    val vals = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
      .map { case (k, i) => k -> (0.050 + i * 0.005) }.toMap
    val real = Bench.compactLine(vals, vals.values.sum, sf,
      protocol = "min-of-3-interleaved")
    assert(real.startsWith("""{"metric":"total""""))
    assert(real.count(_ == '{') == 2 && real.count(_ == '}') == 2)
    assert(real.contains(s""""nq":$n"""))
    assert(real.contains(""""protocol":"min-of-3-interleaved""""))
    assert(real.length <= 1900)
    val carried = "\"([qx][0-9]+)\":".r
      .findAllMatchIn(real.substring(real.indexOf("\"queries\":")))
      .map(_.group(1)).toSet
    if (carried.size < n) {
      // degraded mode: drop accounting present and consistent, and
      // the kept set is exactly the slowest entries
      val ndrop = "\"ndrop\":([0-9]+)".r.findFirstMatchIn(real)
        .map(_.group(1).toInt)
      assert(ndrop.contains(n - carried.size),
        s"ndrop must equal nq - |dict|:\n$real")
      assert(real.contains("\"drop_sum\":"), s"missing drop_sum:\n$real")
      val byShort = vals.map { case (k, v) => k.takeWhile(_ != '_') -> v }
      val keptMin = carried.map(byShort).min
      val dropMax = byShort.collect {
        case (k, v) if !carried(k) => v }.max
      assert(dropMax <= keptMin,
        "a slower query was dropped while a faster one was kept")
    }
    // either way, the slowest query always survives
    val slowest = vals.maxBy(_._2)._1.takeWhile(_ != '_')
    assert(carried(slowest), s"slowest query $slowest missing:\n$real")
  }

  test("drop accounting closes the sum: queries + drop_sum ≈ value") {
    val n = SparkEntry.queries.size
    val vals = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
      .map { case (k, i) => k -> (0.050 + i * 0.005) }.toMap
    val real = Bench.compactLine(vals, vals.values.sum, sf,
      protocol = "min-of-3-interleaved")
    val dict = real.substring(real.indexOf("\"queries\":"))
    val carriedSum = "\"[qx][0-9]+\":([0-9.]+)".r
      .findAllMatchIn(dict).map(_.group(1).toDouble).sum
    val dropSum = "\"drop_sum\":([0-9.]+)".r.findFirstMatchIn(real)
      .map(_.group(1).toDouble).getOrElse(0.0)
    // per-entry decisecond rounding bounds the discrepancy at
    // 0.05s per carried entry (+0.05 for drop_sum's own rounding)
    assert(math.abs(carriedSum + dropSum - vals.values.sum) <=
      0.05 * (n + 1),
      s"sum mismatch: carried $carriedSum + dropped $dropSum vs " +
        s"true ${vals.values.sum}:\n$real")
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
    // the dropped fast tier is accounted, not vanished
    assert(synth.contains("\"ndrop\":") && synth.contains("\"drop_sum\":"),
      s"over-budget line must carry drop accounting:\n$synth")
  }
}
