package graft.core

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions injects the kernel functions at session build") {
    val shared = spark // force the suite session into existence first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // a brand-new SparkSession over the same SparkContext: the builder
    // applies spark.sql.extensions on every new session instance, so the
    // kernels must resolve WITHOUT any registerFunctions call
    val fresh = Graft.configure(SparkSession.builder().master("local[2]"), 2)
      .getOrCreate()
    try {
      assert(fresh ne shared, "expected a fresh session instance")
      val cos = fresh.sql(
          "SELECT vector_cosine(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c")
        .head().getDouble(0)
      assert(cos == 1.0)
      val li = fresh.sql("SELECT lang_id(array('the', 'of', 'and')) AS l")
        .head().getString(0)
      assert(li == "en")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
