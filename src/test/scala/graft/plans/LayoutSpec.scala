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
}
