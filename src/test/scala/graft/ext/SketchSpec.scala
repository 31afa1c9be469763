package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** HLL++ sketch accuracy: approx_count_distinct stays within its
  * documented relative error on a known-cardinality column.
  */
class SketchSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("approx_count_distinct (rsd 1%) within 3% of exact on 20k distinct keys") {
    import spark.implicits._
    val df = (1 to 60000).map(i => i % 20000).toDF("k")
    val Array(approx, exact) = df
      .agg(approx_count_distinct(col("k"), rsd = 0.01).as("a"),
        countDistinct(col("k")).as("e"))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    exact shouldBe 20000L
    math.abs(approx - exact).toDouble / exact should be < 0.03
  }
}
