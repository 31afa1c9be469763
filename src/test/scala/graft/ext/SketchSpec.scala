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

  test("percentile_approx (q62) within GK rank error of exact q40 per group") {
    // Bounds the rows-only q62 against the oracled exact q40 on the
    // driver fixture itself: for every (group, percentile), the approx
    // value's RANK within the group differs from the target rank by
    // at most accuracy-bound fraction of the group (GK guarantee is
    // 1/accuracy = 1e-4; assert a conservative 1e-3).
    val dir = "/root/testdata/sf0.01"
    // q62's hashed row now carries exact percentiles + within-window
    // booleans; the sketch's raw values are recomputed here with the
    // same spelling so the rank-error claim stays directly tested.
    graft.SparkEntry.queries("q62_approx_percentiles")(spark, dir)
      .collect().foreach { r =>
        withClue(s"q62 row $r: ") {
          r.getBoolean(3) shouldBe true
          r.getBoolean(4) shouldBe true
        }
      }
    val approx = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("a50"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("a90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    approx.keySet shouldBe orders.keySet
    for ((g, vals) <- orders; (q, got) <- Seq((0.5, approx(g)._1), (0.9, approx(g)._2))) {
      val n = vals.length
      val rank = vals.count(_ <= got).toDouble / n
      withClue(s"group $g p$q (n=$n, got=$got): ") {
        math.abs(rank - q) should be <= math.max(1e-3, 2.0 / n)
      }
    }
  }

  test("count-min sketch: one-sided error, eps*N bound, exact merge identity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Zipf-ish token stream: token t_i appears 1000/i times, i=1..50
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"t$i"))
    val df = rows.toDF("token")
    val n = rows.size.toLong
    val eps = 0.001
    def sketchOf(d: org.apache.spark.sql.DataFrame) =
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(
          d.agg(count_min_sketch(col("token"), lit(eps), lit(0.99), lit(42)))
            .head().getAs[Array[Byte]](0)))
    val cms = sketchOf(df)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (tok, cnt) =>
      val est = cms.estimateCount(tok)
      est should be >= cnt // CMS never undercounts
      est should be <= cnt + math.ceil(eps * n).toLong * 3 // generous eps*N bound
    }
    // merging per-partition sketches = the single-pass sketch, exactly
    // (same hash family, counters are sums): estimates must be equal
    val (h1, h2) = rows.splitAt(rows.size / 2)
    val merged = sketchOf(h1.toDF("token"))
    merged.mergeInPlace(sketchOf(h2.toDF("token")))
    exact.keys.foreach { tok =>
      merged.estimateCount(tok) shouldBe cms.estimateCount(tok)
    }
  }
}
