package graft.sink

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class ManifestTableSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("manifest-spec").toString

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    import spark.implicits._
    df.select(col("id")).as[Long].collect().toSeq.sorted
  }

  test("append accumulates; every version stays readable; overwrite resets") {
    import spark.implicits._
    val path = tmp()
    val v1 = ManifestTable.append((1L to 5L).toDF("id"), path)
    val v2 = ManifestTable.append((6L to 8L).toDF("id"), path)
    (v1, v2) shouldBe ((1, 2))
    ManifestTable.versions(spark, path) shouldBe Seq(1, 2)
    ids(ManifestTable.readVersion(spark, path, 1)) shouldBe (1L to 5L)
    ids(ManifestTable.readVersion(spark, path, 2)) shouldBe (1L to 8L)
    ids(ManifestTable.readLatest(spark, path)) shouldBe (1L to 8L)
    // overwrite replaces the head but time travel still works
    val v3 = ManifestTable.overwrite((100L to 101L).toDF("id"), path)
    v3 shouldBe 3
    ids(ManifestTable.readLatest(spark, path)) shouldBe Seq(100L, 101L)
    ids(ManifestTable.readVersion(spark, path, 2)) shouldBe (1L to 8L)
    // append after overwrite carries only the overwritten set
    ManifestTable.append(Seq(200L).toDF("id"), path)
    ids(ManifestTable.readLatest(spark, path)) shouldBe Seq(100L, 101L, 200L)
  }

  test("snapshot isolation: a reader's resolved version is immune to later commits") {
    import spark.implicits._
    val path = tmp()
    ManifestTable.append((1L to 3L).toDF("id"), path)
    val snapshot = ManifestTable.readVersion(spark, path, 1)
    ManifestTable.append((4L to 6L).toDF("id"), path)
    ids(snapshot) shouldBe (1L to 3L) // evaluated AFTER the new commit
  }

  test("unknown version and empty table fail loudly") {
    val path = tmp()
    an[IllegalArgumentException] should be thrownBy
      ManifestTable.readLatest(spark, path)
    import spark.implicits._
    ManifestTable.append(Seq(1L).toDF("id"), path)
    an[IllegalArgumentException] should be thrownBy
      ManifestTable.readVersion(spark, path, 7)
  }

  test("interleaved committers serialize onto distinct versions") {
    import spark.implicits._
    val path = tmp()
    // sequential but interleaved-by-intent commits from two frames;
    // version numbers must be dense and reads must see both
    val a = ManifestTable.append(Seq(1L).toDF("id"), path)
    val b = ManifestTable.append(Seq(2L).toDF("id"), path)
    val c = ManifestTable.append(Seq(3L).toDF("id"), path)
    Seq(a, b, c) shouldBe Seq(1, 2, 3)
    ids(ManifestTable.readLatest(spark, path)) shouldBe Seq(1L, 2L, 3L)
  }
}
