package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one local session per suite, sf0.001 fixtures. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    graft.core.Graft.localSession("graft-test", cpus = 4)
  val sfDir = "/root/testdata/sf0.001"
}
