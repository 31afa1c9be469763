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

  test("q32: planted fixture roundtrip is byte-identical; features typed per contract") {
    // The q32 oracle re-decodes the PERSISTED payload bytes in SQL, so
    // the parquet roundtrip must hand DuckDB exactly the bytes the
    // Spark side decoded (tests run on the verify lane, so
    // plantedMedia persists and re-reads).
    val inMem = SparkEntry.plantedMediaRows
    val onDisk = SparkEntry.plantedMedia(spark).collect()
      .map(r => r.media_id -> r).toMap
    onDisk.size shouldBe inMem.size
    inMem.foreach { r =>
      val d = onDisk(r.media_id)
      d.kind shouldBe r.kind
      java.util.Arrays.equals(d.payload, r.payload) shouldBe true
    }
    val rows = SparkEntry.queries("q32_multimodal_features")(
      spark, "/root/testdata/sf0.001").collect()
    rows.length shouldBe 500 + inMem.size
    rows.foreach { r =>
      withClue(s"media_id=${r.getAs[Long]("media_id")}: ") {
        r.getAs[Boolean]("tol_ok") shouldBe true
        // lossy JPEG rows carry NULL features (oracle can't re-derive
        // them); every other row is an exact micro-unit long
        val isJpeg = Set(-9L, -10L, -11L).contains(r.getAs[Long]("media_id"))
        r.isNullAt(r.fieldIndex("f0u")) shouldBe isJpeg
        r.isNullAt(r.fieldIndex("f3u")) shouldBe isJpeg
      }
    }
  }
}
