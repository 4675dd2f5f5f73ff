package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]`s for the kasper-derived aggregation
  * patterns (SURVEY §7.3): reusable in `Dataset.groupByKey(...).agg(...)`
  * and as registered UDAFs. Both are associative + commutative, so Spark
  * runs them with map-side partial aggregation (no raw-row shuffle).
  */
object Aggregators {

  /** Running count — the word-count store pattern
    * (`examples/word_count_example.go:47-67`) as a typed aggregation.
    */
  class RunningCount[IN] extends Aggregator[IN, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: IN): Long = b + 1
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
  def runningCount[IN]: RunningCount[IN] = new RunningCount[IN]

  /** Last-write-wins by a totally ordered version — store `Put` overwrite
    * semantics (`map.go:37-40`) as an aggregation. The version order must
    * be total (include a tie-break) for deterministic results.
    */
  class LastWriteWins[IN: Encoder](version: IN => (Long, Long))
      extends Aggregator[IN, Option[IN], IN] {
    private def later(a: IN, b: IN): IN = {
      val (va, vb) = (version(a), version(b))
      if (vb._1 > va._1 || (vb._1 == va._1 && vb._2 >= va._2)) b else a
    }
    override def zero: Option[IN] = None
    override def reduce(b: Option[IN], a: IN): Option[IN] =
      Some(b.fold(a)(later(_, a)))
    override def merge(a: Option[IN], b: Option[IN]): Option[IN] =
      (a, b) match {
        case (Some(x), Some(y)) => Some(later(x, y))
        case _ => a.orElse(b)
      }
    override def finish(r: Option[IN]): IN = r.get
    override def bufferEncoder: Encoder[Option[IN]] = Encoders.kryo[Option[IN]]
    override def outputEncoder: Encoder[IN] = implicitly[Encoder[IN]]
  }
}
