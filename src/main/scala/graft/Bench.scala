package graft

import org.apache.spark.sql.SparkSession

/** BENCH runner: every declared query against SPARK_GRAFT_SF_DIR, one
  * JSON line on stdout. Queries are forced through a noop sink (not
  * `count()`, which would let Catalyst prune away the very expressions
  * being measured).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // one tiny warmup so JVM/codegen startup isn't charged to the first query
    run("warmup", (s, d) => graft.queries.Queries.q14_sort_distinct(s, d))

    val results = graft.queries.Queries.all.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> run(name, fn)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // system load avg recorded so a load-skewed run is recognizable from
    // the artifact itself (round-1 adjudication had to re-run to tell)
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","load_avg":$loadAvg}""")
    spark.stop()
  }
}
