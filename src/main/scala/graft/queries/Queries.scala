package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.RelOps

/** The declared query surface (SURVEY.md §2B, KQ-1..KQ-28) plus the
  * beyond-parity training-data operators. Every entry here must have a
  * matching oracle in [[Oracles]] (or be explicitly rows-only).
  *
  * Determinism contract (SURVEY §7.4): every query ends in a total
  * `orderBy`; doubles that pass through aggregation are `round(_, 2)` so
  * Spark's and DuckDB's summation orders can't flip the hash.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  /** KQ-6 word-count over `part.p_name` — the kasper flagship example
    * (`examples/word_count_example.go:30-67`) in batch form.
    */
  def q06_wordcount(spark: SparkSession, dir: String): DataFrame =
    RelOps.wordCount(Tables(spark, dir).part, "p_name").orderBy("word")

  val all: Map[String, Q] = Map(
    "q06_wordcount" -> (q06_wordcount _)
  )
}

/** DuckDB-equivalent SQL for each query in [[Queries.all]]. Column names
  * and row order must match the Spark side exactly (driver hash-compares
  * after sorting columns by name).
  */
object Oracles {
  val all: Map[String, String] = Map(
    "q06_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |WHERE word <> ''
        |GROUP BY word ORDER BY word""".stripMargin
  )
}
