package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.schema.TripSchemas

class EventReaderSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def lines = {
    import spark.implicits._
    Seq(
      Some("""{"trip_id":"a1","pickup_datetime":"2024-05-25 10:00:00"}"""),
      Some("""{broken json"""),
      Some("""{"pickup_datetime":"2024-05-25 10:00:00"}"""), // no trip_id
      None, // tombstone: null value must land in the DLQ, not vanish
      Some("""{"trip_id":"a2"}""")).toDF("value")
  }

  test("decodeJson and corruptRecords partition the input") {
    val good = EventReader.decodeJson(lines, TripSchemas.tripStartSchema)
    val bad = EventReader.corruptRecords(lines, TripSchemas.tripStartSchema)
    good.select("trip_id").collect().map(_.getString(0)).sorted shouldBe
      Array("a1", "a2")
    bad.count() shouldBe 3
    good.count() + bad.count() shouldBe lines.count()
  }

  test("round trip: toJsonStream → decodeEndStream preserves the quad") {
    import spark.implicits._
    val ends = EventReader.readTripEnds(spark, "/root/reference/data/trip_end.csv")
    val wire = EventReader.toJsonStream(ends, "trip_id", shards = 4)
    val decoded = EventReader.decodeEndStream(spark, wire)
    decoded.count() shouldBe 4999
    decoded.where($"rate_code".isNotNull).count() shouldBe (4999 - 531)
    // values survive, not just nullability
    val one = decoded.where($"trip_id" === ends.select("trip_id").head.getString(0))
      .head
    one.rate_code.get should be >= 1
  }
}
