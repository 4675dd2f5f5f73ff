package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage timings for the IVF maintenance-loop surface (q223) — which
  * lifecycle step owns the wall time: build, each append, each
  * occupancy record, the triggered rebalance. The workload (slices +
  * build config) comes from [[graft.queries.Queries.ivfMonitorWorkload]]
  * so the profiler measures exactly what the declared query runs.
  * Dev tool, same spirit as [[Profile]].
  *
  * Usage: runMain graft.tools.MonitorProfile [sfDir]
  */
object MonitorProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-monitor-profile"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val (build, drift) = graft.queries.Queries.ivfMonitorWorkload(spark, sfDir)
    val built = timed("build")(build())
    val summary0 = timed("summary-built")(built.occupancySummary.head())
    println(s"  built: $summary0")
    val g1 = timed("append-0")(built.append(drift(0), "vec_id", "embedding"))
    val s1 = timed("summary-0")(g1.occupancySummary.head())
    println(s"  after batch 0: $s1")
    val g2 = timed("append-1")(g1.append(drift(1), "vec_id", "embedding"))
    val s2 = timed("summary-1")(g2.occupancySummary.head())
    println(s"  after batch 1: $s2")
    val reb = timed("rebalance")(g2.rebalance(1.5, trainCap = 2048))
    val s3 = timed("summary-reb")(reb.occupancySummary.head())
    println(s"  after rebalance: $s3")
    reb.close()
    spark.stop()
  }
}
