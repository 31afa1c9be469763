package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class SkewJoinSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("saltedInnerJoin reproduces the plain inner join exactly") {
    import spark.implicits._
    // 1000 rows, 60% on key 0 (the hot key), rest spread over 1..9;
    // key 42 on the big side has no dim row (must drop), dim key 99
    // has no big rows (must not appear)
    val big = spark.range(1000).select(
      col("id"),
      when(col("id") % 10 < 6, 0L).otherwise(col("id") % 10).as("k"))
      .union(Seq((10000L, 42L)).toDF("id", "k"))
    val dim = (0L to 9L).map(k => (k, s"name$k")).toDF("k", "name")
      .union(Seq((99L, "orphan")).toDF("k", "name"))
    val salted = SkewJoin.saltedInnerJoin(big, dim, Seq("k"), salts = 8)
      .select(col("id"), col("k"), col("name"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val plain = big.join(dim, Seq("k")).select(col("id"), col("k"), col("name"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    salted shouldBe plain
    salted.length shouldBe 1000 // the orphan big row dropped
  }

  test("salting spreads the hot key across salt buckets") {
    import spark.implicits._
    val big = spark.range(8000).select(col("id"), lit(0L).as("k")) // ONE key
    val dim = Seq((0L, "hot")).toDF("k", "name")
    // reproduce the operator's salt internally to measure the spread:
    // every (key, salt) bucket should hold well under the unsalted
    // bucket's 8000 rows
    val salts = 16
    val saltCounts = big
      .withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
      .groupBy("k", "__salt").count()
      .collect().map(_.getLong(2))
    saltCounts.length shouldBe salts // all buckets populated
    // a perfectly even spread is 500/bucket; allow wide slack — the
    // assertion is "no single straggler bucket", not exact uniformity
    saltCounts.max should be < 2000L
    // and the full salted join still returns every row exactly once
    SkewJoin.saltedInnerJoin(big, dim, Seq("k"), salts)
      .count() shouldBe 8000L
  }

  test("forceShuffle keeps the salted path on a shuffled join with __salt in the key") {
    import spark.implicits._
    val big = spark.range(100).select(col("id"), (col("id") % 5).as("k"))
    val dim = (0L to 4L).map(k => (k, s"n$k")).toDF("k", "name")
    val plan = SkewJoin
      .saltedInnerJoin(big, dim, Seq("k"), salts = 4, forceShuffle = true)
      .queryExecution.executedPlan.toString
    plan should include("SortMergeJoin")
    plan should not include "BroadcastHashJoin"
    // the exchange partitions on (k, __salt), not k alone
    "hashpartitioning\\([^)]*__salt".r.findFirstIn(plan) should not be empty
  }
}
