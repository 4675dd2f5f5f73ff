package graft

import org.apache.spark.sql.SparkSession

/** Plan-review tool: dump `explain("formatted")` for the named queries
  * (or all). Used each round to check pushdown/broadcast/codegen before
  * trusting bench numbers.
  *
  * Usage: runMain graft.Explain [sfDir] [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSet
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-explain"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names.contains(name)) {
        println(s"\n########## $name ##########")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
