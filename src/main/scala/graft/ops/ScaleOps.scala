package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew- and shuffle-management operators for the 100 TB deployment
  * shape. The reference never needed these (single-threaded instances,
  * `README.md:75-76`); at cluster scale they are the difference between
  * a plan that finishes and one that hot-spots a single reducer.
  */
object ScaleOps {

  /** Two-phase salted aggregation for skewed grouping keys: rows fan out
    * over `buckets` sub-keys (map-side), partials combine per (key, salt),
    * then a second cheap aggregation merges the partials per key. Use for
    * decomposable aggregates (sum/count here) when one key dominates —
    * e.g. a boilerplate document hash or a null-ish tenant — and AQE's
    * skew handling can't help because the skew is *within one group*, not
    * one partition.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted count — same shape, count-specific merge. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count("*").as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("cnt"))
  }

  /** Write a table bucketed + sorted by its join key. Two tables bucketed
    * the same way join with ZERO shuffle (the Exchange disappears from
    * the plan — asserted in ScaleOpsSpec): the 100 TB co-located-join
    * path for repeatedly-joined fact/dim pairs, replacing kasper's
    * co-partitioned-topics requirement (`README.md:37-39`) with a
    * storage-level contract.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
