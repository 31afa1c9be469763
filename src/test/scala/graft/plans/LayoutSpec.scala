package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class LayoutSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("saltedJoin produces exactly the plain join's rows") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (i % 7, i)).toDF("k", "v")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .orderBy("k", "v").collect()
    val salted = Layout.saltedJoin(big, small, "k", salts = 8)
      .select("k", "v", "name").orderBy("k", "v").collect()
    salted shouldBe plain
  }

  test("saltedJoin left join keeps unmatched big-side rows") {
    import spark.implicits._
    val big = Seq((1, "x"), (2, "y"), (9, "z")).toDF("k", "v")
    val small = Seq((1, "a"), (2, "b")).toDF("k", "name")
    val out = Layout.saltedJoin(big, small, "k", salts = 4, joinType = "left")
      .orderBy("k").collect()
    out should have length 3
    out.map(_.getAs[String]("name")) shouldBe Array("a", "b", null)
  }

  test("bucketed tables join with zero shuffle") {
    import spark.implicits._
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 500).map(i => (i.toLong, s"r$i")).toDF("id", "rv")
    Layout.writeBucketed(left, "graft_bucketed_l", "id", 4)
    Layout.writeBucketed(right, "graft_bucketed_r", "id", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucketed_l")
        .join(spark.table("graft_bucketed_r"), Seq("id"))
      Layout.isShuffleFree(joined) shouldBe true
      joined.count() shouldBe 500
      // sanity: the same join on unbucketed frames DOES shuffle
      Layout.isShuffleFree(left.join(right, Seq("id"))) shouldBe false
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mortonCode: hand-computed interleave; monotone on the diagonal") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // x=3 (011), y=5 (101), bits=3: x bits -> positions 1,3,5 = 2+8,
    // y bits -> positions 0,2,4 = 1+16 -> 0b011011 = 27
    val out = Seq((3L, 5L), (0L, 0L), (7L, 7L), (1L, 0L), (0L, 1L))
      .toDF("x", "y")
      .select(Layout.mortonCode(col("x"), col("y"), 3).as("z"))
      .collect().map(_.getLong(0))
    out shouldBe Array(27L, 0L, 63L, 2L, 1L)
  }

  test("mortonCode is a bijection on the grid") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val grid = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val codes = grid.toDF("x", "y")
      .select(Layout.mortonCode(col("x"), col("y"), 4).as("z"))
      .collect().map(_.getLong(0))
    codes.toSet shouldBe (0L until 256L).toSet
  }

  test("rankScaled clamps into [0, 2^bits) with hi hitting the top code") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq(-5.0, 0.0, 50.0, 100.0, 250.0).toDF("v")
      .select(Layout.rankScaled(col("v"), 0.0, 100.0, 4).as("c"))
      .collect().map(_.getLong(0))
    out shouldBe Array(0L, 0L, 8L, 15L, 15L)
  }

  test("z-order layout: per-file bounding boxes tight on BOTH columns") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a 64x64 grid; z-order into 16 range partitions vs linear sort by x
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def fileBoxes(df: org.apache.spark.sql.DataFrame, dir: String): Array[(Long, Long)] = {
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    }
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val zBoxes = fileBoxes(
      Layout.zOrdered(grid, "x", "y", bits = 6, partitions = 16), s"$tmp/z")
    val linBoxes = fileBoxes(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")),
      s"$tmp/lin")
    // z-order: every file's box is a (near-)square tile — BOTH spans
    // bounded well under the full 63 (sample-based range boundaries get
    // a tile of slack); linear: x is tight but y spans the full range.
    // Same rows per file means the AREAS match — the skipping win is
    // the SHAPE: a square tile intersects far fewer 2-D boxes than a
    // full-width sliver of equal area.
    val zWorst = zBoxes.map { case (dx, dy) => math.max(dx, dy) }.max
    zWorst should be <= 31L
    linBoxes.map(_._2).max shouldBe 63L
    // a 2-D box predicate [0,15]^2 prunes z-files hardest: count files
    // whose bbox intersects the box (= what parquet stats pruning sees)
    def hitFiles(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .where(col("x0") <= 15 && col("x1") >= 0 &&
          col("y0") <= 15 && col("y1") >= 0)
        .count()
    hitFiles(s"$tmp/z") should be < hitFiles(s"$tmp/lin")
  }

  test("writeWithBloom: every row group carries a bloom; absent keys excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    // ids 0..9999 across 4 row groups (4 output partitions)
    val df = spark.range(10000).select(col("id").as("k"),
      (col("id") * 3).as("v")).repartition(4)
    Layout.writeWithBloom(df, s"$tmp/t", Seq("k"), expectedNdv = 10000L)
    val present = Seq(0L, 4321L, 9999L)
    val absent = Seq(-1L, 123456789L, -987654321L)
    val (groups, withBloom, might) =
      Layout.bloomAudit(spark, s"$tmp/t", "k", present ++ absent)
    groups should be >= 4
    withBloom shouldBe groups // every group wrote its bloom
    // a present key is found by SOME group's bloom (no false negatives)
    present.foreach(v => might(v) should be >= 1)
    // an absent key is definitely-absent in (at least nearly) every
    // group — blooms may false-positive, but at ndv=10000 the fpp is
    // ~1%, so three probes over a handful of groups all excluding is
    // the overwhelmingly likely deterministic outcome for this fixture
    absent.foreach(v => might(v) shouldBe 0)
    // and Spark's reader actually consults them: an absent-key point
    // lookup returns nothing (correctness) — the skipping itself is
    // the reader's job, the layout's job is carrying the structure
    spark.read.parquet(s"$tmp/t").where(col("k") === -1L).count() shouldBe 0L
  }
}
