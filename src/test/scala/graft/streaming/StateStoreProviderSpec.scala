package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{GraftSession, SparkTestBase}
import graft.core.TripCorrelation
import graft.schema._

/** The state-store provider option: name→class mapping, session wiring,
  * and a REAL keyed-state streaming run on RocksDB — the 100 TB scale
  * realization of SURVEY §2.7's keyed state (state bounded by local
  * disk, not executor heap). The RocksDB run must produce the same
  * lifecycle output as the default store: the provider is an engine
  * property, never a semantics property.
  */
class StateStoreProviderSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  test("providerClassFor maps short names; unknown falls back to the default store") {
    GraftSession.providerClassFor("rocksdb") shouldBe RocksDb
    GraftSession.providerClassFor("RocksDB") shouldBe RocksDb
    GraftSession.providerClassFor("hdfs") shouldBe Hdfs
    GraftSession.providerClassFor("nonsense") shouldBe Hdfs
  }

  test("configure wires the provider class into the session conf") {
    // the shared test session went through GraftSession.configure with
    // the env unset → default store
    spark.conf.get("spark.sql.streaming.stateStore.providerClass") shouldBe Hdfs
    // changelog checkpointing is pre-wired (inert on the default store)
    spark.conf.get(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    ) shouldBe "true"
  }

  test("fMGWS correlation on RocksDB: same lifecycle output as the default store") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(s: String) = Timestamp.valueOf(s)
    def start(id: String, pickup: String) = TripEvent.ofStart(
      TripStart(id, Some(1), Some(2), Some(1), Some(ts(pickup)),
        Some(ts(pickup)), Some(20.0)))
    def end(id: String, dropoff: String) = TripEvent.ofEnd(
      TripEnd(id, Some(ts(dropoff)), Some(1), Some(2), Some(3.0),
        Some(24.5), Some(2.0), Some(1), Some(1)))

    // the providerClass conf is read at query start — set per run, on
    // the shared session, restored afterwards
    val before = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    def run(provider: String, sinkName: String): Seq[(String, String)] = {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      val input = MemoryStream[TripEvent]
      val query = TripCorrelation.correlateStream(
          input.toDS(), faithful = true,
          timeoutMs = 60000L, watermarkDelay = "1 minute")
        .toDF().writeStream
        .format("memory").queryName(sinkName).outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft-ckpt-$sinkName").toString)
        .start()
      try {
        input.addData(start("t1", "2024-05-25 10:00:00"),
          end("t9", "2024-05-25 10:00:30")) // late end: dropped
        query.processAllAvailable()
        input.addData(end("t1", "2024-05-25 10:25:00")) // t1 completes
        query.processAllAvailable()
        input.addData(start("t2", "2024-05-25 10:30:00")) // never ends
        query.processAllAvailable()
        // watermark jumps far ahead → t2 evicted via EventTimeTimeout,
        // which exercises the provider's remove path too
        input.addData(start("t3", "2024-05-25 13:00:00"))
        query.processAllAvailable()
        input.addData(start("t4", "2024-05-25 13:30:00"))
        query.processAllAvailable()
        spark.table(sinkName).select("trip_id", "status")
          .as[(String, String)].collect().toSeq.sorted
      } finally query.stop()
    }

    try {
      val onRocks = run(RocksDb, "provider_rocks")
      val onDefault = run(Hdfs, "provider_hdfs")
      onRocks shouldBe onDefault
      onRocks should contain(("t1", TripSchemas.StatusCompleted))
      onRocks should contain(("t2", TripSchemas.StatusExpired))
      onRocks.map(_._1) should not contain "t9"
    } finally {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", before)
    }
  }
}
