package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: print `executedPlan.toString.length` per query (the
  * string PlanCheckSpec renders) so a plan-size explosion is locatable
  * before it OOMs the suite. Usage:
  * `runMain graft.tools.PlanSize [sfDir] [query...]`.
  */
object PlanSize {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSet
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-plansize"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names.contains(name)) {
        val t0 = System.nanoTime()
        val res =
          try {
            val df = fn(spark, sfDir)
            val n = df.queryExecution.executedPlan.toString.length
            s"len=$n"
          } catch { case e: Throwable => s"FAILED: ${e.getClass.getSimpleName} ${e.getMessage}" }
        println(f"PLANSIZE $name%-38s $res (${(System.nanoTime() - t0) / 1e9}%.1f s)")
        graft.ops.ScaleOps.releaseAll(spark, blocking = true)
      }
    }
    spark.stop()
  }
}
