package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class CalibrationSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))

  /** Deterministic labeled fixture: for each score on a grid, `m` rows
    * whose positive count matches σ(aTrue·s + bTrue) as closely as
    * integers allow.
    */
  private def planted(aTrue: Double, bTrue: Double, m: Int = 200) = {
    import spark.implicits._
    val rows = for {
      i <- -30 to 30
      s = i / 10.0
      k = math.round(m * sigmoid(aTrue * s + bTrue)).toInt
      j <- 0 until m
    } yield (s, j < k)
    rows.toDF("score", "y")
  }

  test("plattFit recovers planted parameters") {
    val df = planted(aTrue = 1.7, bTrue = -0.3)
    val (a, b) = Calibration.plattFit(df, col("score"), col("y"))
    a shouldBe 1.7 +- 0.05
    b shouldBe -0.3 +- 0.05
  }

  test("plattFit is bit-deterministic under repartitioning") {
    val df = planted(aTrue = 0.8, bTrue = 0.5, m = 50)
    val r1 = Calibration.plattFit(df.repartition(3), col("score"), col("y"))
    val r2 = Calibration.plattFit(df.repartition(17), col("score"), col("y"))
    r1 shouldBe r2
  }

  test("calibrationScore closed forms: perfect and fixed-confidence fixtures") {
    import spark.implicits._
    val perfect = Seq((1.0, true), (1.0, true), (0.0, false)).toDF("p", "y")
    val r0 = Calibration.calibrationScore(perfect, col("p"), col("y")).head()
    r0.getLong(0) shouldBe 3L
    r0.getDouble(1) shouldBe 0.0
    r0.getDouble(2) shouldBe 0.0
    // p = .75 on 4 rows, 3 positive: one bin, |3.0 - 3| / 4 = 0 ece;
    // brier = (3·.0625 + .5625) / 4 = .1875
    val even = Seq((0.75, true), (0.75, true), (0.75, true), (0.75, false))
      .toDF("p", "y")
    val r1 = Calibration.calibrationScore(even, col("p"), col("y")).head()
    r1.getDouble(1) shouldBe 0.0 +- 1e-12
    r1.getDouble(2) shouldBe 0.1875 +- 1e-12
    // same 4 rows but only 1 positive: ece = |3.0 - 1|/4 = 0.5
    val off = Seq((0.75, true), (0.75, false), (0.75, false), (0.75, false))
      .toDF("p", "y")
    Calibration.calibrationScore(off, col("p"), col("y"))
      .head().getDouble(1) shouldBe 0.5 +- 1e-12
  }

  test("Platt scaling reduces ECE on a miscalibrated scorer") {
    // truth is σ(3s); the raw scorer claims σ(s) — underconfident tails
    val df = planted(aTrue = 3.0, bTrue = 0.0)
    val raw = Calibration
      .calibrationScore(df, Calibration.plattProb(col("score"), 1.0, 0.0), col("y"))
      .head().getDouble(1)
    val (a, b) = Calibration.plattFit(df, col("score"), col("y"))
    val cal = Calibration
      .calibrationScore(df, Calibration.plattProb(col("score"), a, b), col("y"))
      .head().getDouble(1)
    a shouldBe 3.0 +- 0.1
    cal should be < raw / 3
  }

  test("plattFit survives degenerate inputs (one-class labels, constant scores)") {
    import spark.implicits._
    val oneClass = (1 to 50).map(i => (i / 10.0, true)).toDF("s", "y")
    val (_, b1) = Calibration.plattFit(oneClass, col("s"), col("y"), iters = 40)
    b1.isNaN shouldBe false
    sigmoid(b1) should be > 0.9 // all-positive: probabilities head to 1
    val constant = (1 to 50).map(i => (2.0, i % 2 == 0)).toDF("s", "y")
    val (a2, b2) = Calibration.plattFit(constant, col("s"), col("y"))
    (a2 * 2.0 + b2) shouldBe 0.0 +- 1e-6 // balanced labels at one score
  }
}
