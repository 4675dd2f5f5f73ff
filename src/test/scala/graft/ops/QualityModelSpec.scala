package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("fitLinear recovers a planted linear relation exactly") {
    // y = 0.25 + 1.5·x1 − 2·x2 on binary-exact feature values → zero
    // residual, so the normal equations recover the weights to fp noise
    val rows = for {
      a <- Seq(0.0, 0.5, 1.0, 2.0)
      b <- Seq(0.0, 0.25, 1.0)
    } yield (a, b, 0.25 + 1.5 * a - 2.0 * b)
    val df = rows.toDF("x1", "x2", "y")
    val w = QualityModel.fitLinear(df, Seq(col("x1"), col("x2")), col("y"))
    assert(math.abs(w(0) - 0.25) < 1e-9)
    assert(math.abs(w(1) - 1.5) < 1e-9)
    assert(math.abs(w(2) + 2.0) < 1e-9)
  }

  test("fitLinear scans the corpus exactly once") {
    val acc = spark.sparkContext.longAccumulator("fit-rows-seen")
    // nondeterministic → Catalyst may not duplicate or collapse the call,
    // so the count is exact: one evaluation per input row
    val seen = udf { (x: Double) => acc.add(1L); x }.asNondeterministic()
    val df = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 5.0)).toDF("x", "y")
      .withColumn("x", seen(col("x")))
    val w = QualityModel.fitLinear(df, Seq(col("x")), col("y"))
    // every Gram/moment sum came out of ONE pass — each row was read once
    assert(acc.value == 3L, s"corpus rows read ${acc.value} times, expected 3")
    // the default ridge perturbs a 3-row system at the ~1e-9 level
    assert(math.abs(w(0) + 1.0) < 1e-6 && math.abs(w(1) - 2.0) < 1e-6)
  }

  test("collinear features survive via the ridge; degenerate inputs fail loudly") {
    // x2 = 2·x1 exactly → X'X is singular without the ridge
    val df = Seq((1.0, 2.0, 1.0), (2.0, 4.0, 2.0), (3.0, 6.0, 3.0)).toDF("x1", "x2", "y")
    val w = QualityModel.fitLinear(df, Seq(col("x1"), col("x2")), col("y"), ridge = 1e-6)
    // prediction is still right even though the split between w1/w2 is arbitrary
    val pred = 1.0 * w(1) + 2.0 * w(2) + w(0)
    assert(math.abs(pred - 1.0) < 1e-3)
    assert(intercept[IllegalArgumentException] {
      QualityModel.fitLinear(df.limit(0), Seq(col("x1")), col("y"))
    }.getMessage.contains("null"))
    assert(intercept[IllegalArgumentException] {
      QualityModel.fitLinear(df, Seq.empty, col("y"))
    }.getMessage.contains("feature"))
  }

  test("rows with null features drop from every Gram sum (no silent mis-fit)") {
    val clean = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 5.0)).toDF("x", "y")
    // a null-feature row with an extreme label: if any aggregate still
    // counted it (e.g. the intercept×intercept sum), weights would skew
    val dirty = Seq((Option(1.0), 1.0), (Option(2.0), 3.0), (Option(3.0), 5.0),
      (Option.empty[Double], 99.0)).toDF("x", "y")
    val wc = QualityModel.fitLinear(clean, Seq(col("x")), col("y"))
    val wd = QualityModel.fitLinear(dirty, Seq(col("x")), col("y"))
    wc.zip(wd).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("q60 scores reproduce the frozen fitted weights applied to the feature library") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val q60 = graft.queries.Queries.q60_quality_trained(spark, sfDir)
    assert(q60.count() == docs.count())
    // spot-check one document against a hand-evaluated score
    val w = QualityModel.Fitted
    val featCols = col("doc_id") +: QualityModel.features(col("text"))
      .zipWithIndex.map { case (c, i) => c.as(s"f$i") }
    val feats = docs.select(featCols: _*).filter(col("doc_id") === 0).head()
    val expected = w(0) + w(1) * feats.getDouble(1) + w(2) * feats.getDouble(2) +
      w(3) * feats.getDouble(3) + w(4) * feats.getDouble(4)
    val got = q60.filter(col("doc_id") === 0).head().getDouble(1)
    assert(math.abs(got - expected) < 1e-12)
  }
}
