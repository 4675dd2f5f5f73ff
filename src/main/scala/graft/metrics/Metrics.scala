package graft.metrics

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** The reference's pluggable metrics surface (`metrics.go:4-24`):
  * Counter / Gauge / Summary created through a MetricsProvider, so the
  * engine's instrumentation is deployment-agnostic. The reference ships
  * a Prometheus provider (`prometheus.go:44-127`); here the in-process
  * provider renders the (public, stable) Prometheus text exposition
  * format directly — no client library needed — and serving it over
  * HTTP/pushgateway is a deployment concern, like kasper's registry
  * handoff.
  */
trait Counter {
  def inc(labelValues: String*): Unit = add(1.0, labelValues: _*)
  def add(value: Double, labelValues: String*): Unit
}

trait Gauge {
  def set(value: Double, labelValues: String*): Unit
}

trait Summary {
  def observe(value: Double, labelValues: String*): Unit
}

trait MetricsProvider {
  def newCounter(name: String, help: String, labelNames: String*): Counter
  def newGauge(name: String, help: String, labelNames: String*): Gauge
  def newSummary(name: String, help: String, labelNames: String*): Summary
}

/** Default provider — all instruments discard (`noop_metrics.go`). */
object NoopMetricsProvider extends MetricsProvider {
  private object noop extends Counter with Gauge with Summary {
    override def add(value: Double, labelValues: String*): Unit = ()
    override def set(value: Double, labelValues: String*): Unit = ()
    override def observe(value: Double, labelValues: String*): Unit = ()
  }
  override def newCounter(name: String, help: String, labelNames: String*): Counter = noop
  override def newGauge(name: String, help: String, labelNames: String*): Gauge = noop
  override def newSummary(name: String, help: String, labelNames: String*): Summary = noop
}

/** Thread-safe in-process provider, queryable in tests/bench and
  * renderable as Prometheus text exposition. Every metric carries the
  * provider's `label` as a trailing `job` label value, mirroring the
  * reference's per-processor label (`prometheus.go:12-15`).
  */
final class InProcessMetricsProvider(val label: String) extends MetricsProvider {

  private final case class Key(name: String, labels: Seq[String])
  private final case class Stat(count: Long, sum: Double, min: Double, max: Double)

  private val metricMeta = new ConcurrentHashMap[String, (String, String, Seq[String])]()
  private val counters = new ConcurrentHashMap[Key, java.lang.Double]()
  private val gauges = new ConcurrentHashMap[Key, java.lang.Double]()
  private val summaries = new ConcurrentHashMap[Key, Stat]()

  override def newCounter(name: String, help: String, labelNames: String*): Counter = {
    metricMeta.put(name, ("counter", help, labelNames))
    new Counter {
      override def add(value: Double, labelValues: String*): Unit =
        counters.merge(Key(name, labelValues), value, (a, b) => a + b)
    }
  }

  override def newGauge(name: String, help: String, labelNames: String*): Gauge = {
    metricMeta.put(name, ("gauge", help, labelNames))
    new Gauge {
      override def set(value: Double, labelValues: String*): Unit =
        gauges.put(Key(name, labelValues), value)
    }
  }

  override def newSummary(name: String, help: String, labelNames: String*): Summary = {
    metricMeta.put(name, ("summary", help, labelNames))
    new Summary {
      override def observe(value: Double, labelValues: String*): Unit =
        summaries.merge(Key(name, labelValues), Stat(1, value, value, value),
          (a, b) => Stat(a.count + b.count, a.sum + b.sum,
            math.min(a.min, b.min), math.max(a.max, b.max)))
    }
  }

  def counterValue(name: String, labelValues: String*): Option[Double] =
    Option(counters.get(Key(name, labelValues))).map(_.doubleValue)
  def gaugeValue(name: String, labelValues: String*): Option[Double] =
    Option(gauges.get(Key(name, labelValues))).map(_.doubleValue)
  def summaryStats(name: String, labelValues: String*): Option[(Long, Double, Double, Double)] =
    Option(summaries.get(Key(name, labelValues))).map(s => (s.count, s.sum, s.min, s.max))

  /** Prometheus text exposition format (version 0.0.4) — the public
    * scrape contract; summaries render as `_count`/`_sum`.
    */
  def renderPrometheusText(): String = {
    def labelStr(names: Seq[String], values: Seq[String]): String = {
      val pairs = names.zip(values) :+ ("job" -> label)
      pairs.map { case (n, v) => s"""$n="${v.replace("\"", "\\\"")}"""" }.mkString("{", ",", "}")
    }
    val sb = new StringBuilder
    metricMeta.asScala.toSeq.sortBy(_._1).foreach { case (name, (kind, help, labelNames)) =>
      sb.append(s"# HELP $name $help\n# TYPE $name $kind\n")
      def rows[V](m: ConcurrentHashMap[Key, V])(f: (String, V) => String): Unit =
        m.asScala.toSeq.collect { case (k, v) if k.name == name =>
          f(labelStr(labelNames, k.labels), v)
        }.sorted.foreach(r => sb.append(r))
      kind match {
        case "counter" => rows(counters)((l, v) => s"$name$l $v\n")
        case "gauge" => rows(gauges)((l, v) => s"$name$l $v\n")
        case _ => rows(summaries)((l, s) =>
          s"${name}_count$l ${s.count}\n${name}_sum$l ${s.sum}\n")
      }
    }
    sb.toString
  }
}
