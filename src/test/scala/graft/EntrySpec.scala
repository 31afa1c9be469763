package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The driver's t1 smoke contract: entry() must return rows on a session
  * that did NOT pre-configure the nanos-timestamp workaround.
  */
class EntrySpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("entry() returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    df.count() should be > 0L
  }

  test("every oracleSql key has a queries entry and benchQueries resolve") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.diff(qs) shouldBe empty
    SparkEntry.benchQueries.toSet.diff(qs) shouldBe empty
  }
}
