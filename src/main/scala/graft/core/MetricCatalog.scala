package graft.core

/** Per-metric configuration — the reference's config-JSON shape
  * (`/root/reference/src/async_hta_service.hpp:147-248`, importer
  * defaults `importer.py:61-91`; FIXTURES.md §4).
  */
final case class MetricConfig(
    name: String,
    input: Option[String], // transport name (F5 mapping), None = own name
    mode: String = "RW",
    intervalMin: Long,
    intervalMax: Long,
    intervalFactor: Long = 10L
) {
  def levels: List[Long] = {
    val l = Intervals.ladder(intervalMin, intervalFactor)
    l.takeWhile(_ <= intervalMax)
  }

  /** RO metrics are query-only: the ingest path rejects their writes
    * (the reference hands `mode` to HTA's open, ref `:242`-adjacent —
    * a read-only metric cannot accept a data chunk).
    */
  def writable: Boolean = mode != "RO"
}

/** The metric catalog: name → config plus the input→name rename map.
  *
  * Validation mirrors the reference's fatal config errors:
  *  - ambiguous input mapping (two metrics with the same `input`, or an
  *    input colliding with another metric's name) — ref `:120-133`;
  *  - reconfiguration may only ADD metrics, never change or remove
  *    existing ones — ref `:220-246` (add-only `directory->emplace`).
  */
final class MetricCatalog private (val metrics: Map[String, MetricConfig]) {

  /** Transport-name → logical-name map (identity entries omitted). */
  val inputMapping: Map[String, String] =
    metrics.values.flatMap(c => c.input.map(_ -> c.name)).toMap

  /** Metrics whose mode rejects writes (config-sized, broadcastable). */
  val readOnlyMetrics: Set[String] =
    metrics.values.filterNot(_.writable).map(_.name).toSet

  def mappedName(transport: String): String =
    inputMapping.getOrElse(transport, transport)

  /** Add-only reconfig: new metrics merge in; changing an existing
    * metric's config is rejected (Left), exactly like the reference's
    * warn-and-skip / fatal paths.
    */
  def reconfigure(added: Seq[MetricConfig]): Either[String, MetricCatalog] = {
    val changed = added.filter(c =>
      metrics.get(c.name).exists(_ != c))
    if (changed.nonEmpty)
      Left(s"reconfiguration may only add metrics; changed: ${changed.map(_.name).mkString(", ")}")
    else MetricCatalog.build(metrics.values.toSeq ++
      added.filterNot(c => metrics.contains(c.name)))
  }

  /** AMQP-style subscribe list: the transport name of every metric
    * (ref `:547-556`).
    */
  def subscribeList: Seq[String] =
    metrics.values.map(c => c.input.getOrElse(c.name)).toSeq.sorted
}

object MetricCatalog {
  def build(configs: Seq[MetricConfig]): Either[String, MetricCatalog] = {
    val dupNames = configs.groupBy(_.name).filter(_._2.size > 1).keys
    if (dupNames.nonEmpty)
      return Left(s"duplicate metric names: ${dupNames.mkString(", ")}")
    val inputs = configs.flatMap(c => c.input.map(_ -> c.name))
    val dupInputs = inputs.groupBy(_._1).filter(_._2.size > 1).keys
    if (dupInputs.nonEmpty)
      return Left(s"ambiguous input mapping: ${dupInputs.mkString(", ")}")
    val nameSet = configs.map(_.name).toSet
    val collisions = inputs.collect {
      case (in, logical) if nameSet.contains(in) && in != logical => in
    }
    if (collisions.nonEmpty)
      return Left(s"input collides with a metric name: ${collisions.mkString(", ")}")
    val badIv = configs.filter(c =>
      c.intervalMin <= 0 || c.intervalFactor <= 1 || c.intervalMax < c.intervalMin)
    if (badIv.nonEmpty)
      return Left(s"bad interval config: ${badIv.map(_.name).mkString(", ")}")
    val badMode = configs.filterNot(c => c.mode == "RW" || c.mode == "RO")
    if (badMode.nonEmpty)
      return Left(s"invalid mode (want RW|RO): ${
        badMode.map(c => s"${c.name}=${c.mode}").mkString(", ")}")
    Right(new MetricCatalog(configs.map(c => c.name -> c).toMap))
  }

  /** Parse the reference's config-JSON shape (FIXTURES.md §4) using the
    * json4s shipped with Spark.
    */
  def fromJson(json: String): Either[String, MetricCatalog] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    try {
      val root = JsonMethods.parse(json)
      val configs = (root \ "metrics") match {
        case JObject(fields) =>
          // prefix metrics are a hard config error, not an ignorable key
          // (ref async_hta_service.hpp:161-165: "adding prefix metrics
          // no longer supported"). Checked BEFORE the mapping closure:
          // a `return` inside `map` would compile to NonLocalReturnControl
          // and silently break under a widened catch or a lazy collection
          fields.collectFirst {
            case (name, v) if (v \ "prefix") == JBool(true) => name
          } match {
            case Some(name) =>
              return Left(s"prefix metrics are not supported: $name")
            case None => ()
          }
          fields.map { case (name, v) =>
          def longAt(k: String, dflt: Option[Long] = None): Long =
            (v \ k) match {
              case JInt(x) => x.toLong
              case JLong(x) => x
              // scientific notation ("interval_min": 3.6e12) parses as a
              // double — accept it when integral rather than claiming
              // the key is missing
              case JDouble(x) if x == math.rint(x) && math.abs(x) < 9.2e18 =>
                x.toLong
              case _ => dflt.getOrElse(
                throw new IllegalArgumentException(s"$name.$k missing"))
            }
          MetricConfig(
            name = name,
            input = (v \ "input") match {
              case JString(s) => Some(s); case _ => None
            },
            mode = (v \ "mode") match {
              case JString(s) => s; case _ => "RW"
            },
            intervalMin = longAt("interval_min"),
            intervalMax = longAt("interval_max"),
            intervalFactor = longAt("interval_factor", Some(10L)))
        }
        case _ => return Left("config has no metrics object")
      }
      build(configs)
    } catch {
      case e: Exception => Left(s"config parse error: ${e.getMessage}")
    }
  }
}
