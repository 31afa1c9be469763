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

  test("appendIdempotent commits each batch id once; replays skip") {
    import spark.implicits._
    val path = tmp()
    ManifestTable.appendIdempotent(Seq(1L).toDF("id"), path, batchId = 0)
      .shouldBe(Some(1))
    ManifestTable.appendIdempotent(Seq(2L).toDF("id"), path, batchId = 1)
      .shouldBe(Some(2))
    // checkpoint-recovery replay of batch 1: skipped, nothing changes
    ManifestTable.appendIdempotent(Seq(2L).toDF("id"), path, batchId = 1)
      .shouldBe(None)
    ManifestTable.committedBatchIds(spark, path) shouldBe Set(0L, 1L)
    ManifestTable.versions(spark, path) shouldBe Seq(1, 2)
    ids(ManifestTable.readLatest(spark, path)) shouldBe Seq(1L, 2L)
  }

  test("batch ledger survives retention: vacuum and compact carry ids") {
    import spark.implicits._
    val path = tmp()
    ManifestTable.appendIdempotent(Seq(1L).toDF("id"), path, batchId = 0)
    ManifestTable.appendIdempotent(Seq(2L).toDF("id"), path, batchId = 1)
    ManifestTable.appendIdempotent(Seq(3L).toDF("id"), path, batchId = 2)
    // vacuum away the manifests carrying #batch:0 and #batch:1 — the
    // ids must survive in the ledger sidecar, so a late checkpoint
    // replay of batch 0 still skips instead of double-committing
    ManifestTable.vacuum(spark, path, keepVersions = 1, graceMs = 0L)
    ManifestTable.versions(spark, path) shouldBe Seq(3)
    ManifestTable.committedBatchIds(spark, path) shouldBe Set(0L, 1L, 2L)
    ManifestTable.appendIdempotent(Seq(1L).toDF("id"), path, batchId = 0)
      .shouldBe(None)
    ids(ManifestTable.readLatest(spark, path)) shouldBe Seq(1L, 2L, 3L)
    // compact writes the full ledger onto its own manifest; a second
    // vacuum that keeps only the compacted head forgets nothing
    ManifestTable.compact(spark, path)
    ManifestTable.vacuum(spark, path, keepVersions = 1, graceMs = 0L)
    ManifestTable.committedBatchIds(spark, path) shouldBe Set(0L, 1L, 2L)
    ManifestTable.appendIdempotent(Seq(9L).toDF("id"), path, batchId = 2)
      .shouldBe(None)
    ids(ManifestTable.readLatest(spark, path)) shouldBe Seq(1L, 2L, 3L)
  }

  test("batch-id retention: old ids fold into a floor; ledger stays one file") {
    import spark.implicits._
    val path = tmp()
    (0L to 5L).foreach(b =>
      ManifestTable.appendIdempotent(Seq(b).toDF("id"), path, batchId = b))
    // compact with a 2-batch horizon: ids 0..3 fold into the floor,
    // 4 and 5 stay enumerated — and idempotence is UNCHANGED: every
    // old id still reads as committed (via the floor), every folded
    // replay still skips
    ManifestTable.compact(spark, path, batchIdRetention = 2L)
    ManifestTable.vacuum(spark, path, keepVersions = 1, graceMs = 0L)
    ManifestTable.committedBatchFloor(spark, path) shouldBe 3L
    ManifestTable.committedBatchIds(spark, path) shouldBe Set(4L, 5L)
    (0L to 5L).foreach { b =>
      ManifestTable.isBatchCommitted(spark, path, b) shouldBe true
      ManifestTable.appendIdempotent(Seq(99L).toDF("id"), path, batchId = b)
        .shouldBe(None)
    }
    ManifestTable.isBatchCommitted(spark, path, 6L) shouldBe false
    // repeated vacuums MERGE ledger sidecars instead of accumulating
    // one per vacuum: at most one ledger file ever
    ManifestTable.appendIdempotent(Seq(6L).toDF("id"), path, batchId = 6)
    ManifestTable.vacuum(spark, path, keepVersions = 1, graceMs = 0L)
    ManifestTable.appendIdempotent(Seq(7L).toDF("id"), path, batchId = 7)
    ManifestTable.vacuum(spark, path, keepVersions = 1, graceMs = 0L)
    val manifests = new java.io.File(s"$path/_manifests").listFiles()
      .map(_.getName).filter(_.endsWith(".ledger"))
    manifests.length should be <= 1
    // and nothing was forgotten across the merges
    (0L to 7L).foreach(b =>
      ManifestTable.isBatchCommitted(spark, path, b) shouldBe true)
  }

  test("compact collapses the head to one dir; vacuum drops history and orphans") {
    import spark.implicits._
    val path = tmp()
    ManifestTable.append((1L to 3L).toDF("id"), path)
    ManifestTable.append((4L to 5L).toDF("id"), path)
    val v3 = ManifestTable.compact(spark, path)
    v3 shouldBe 3
    ids(ManifestTable.readLatest(spark, path)) shouldBe (1L to 5L)
    // pre-compaction versions still readable until vacuum
    ids(ManifestTable.readVersion(spark, path, 2)) shouldBe (1L to 5L)
    // default grace window protects young dirs (everything here is
    // seconds old): manifests drop but no data dir may be reclaimed —
    // a racing committer's unpublished dir must survive retention...
    ManifestTable.vacuum(spark, path, keepVersions = 1) shouldBe empty
    // ...then graceMs=0 (no writer in flight) reclaims the orphans
    val deleted = ManifestTable.vacuum(spark, path, keepVersions = 1, graceMs = 0L)
    deleted.length shouldBe 2 // the two original append dirs
    ManifestTable.versions(spark, path) shouldBe Seq(3)
    ids(ManifestTable.readLatest(spark, path)) shouldBe (1L to 5L)
    an[IllegalArgumentException] should be thrownBy
      ManifestTable.readVersion(spark, path, 2) // vacuumed: fails loudly
    // the data root holds exactly the compacted dir
    val f = new org.apache.hadoop.fs.Path(path, "data")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(new org.apache.hadoop.fs.Path(path, "data")).length shouldBe 1
  }

  test("diff: multiset CDC between versions, both directions") {
    import spark.implicits._
    val path = tmp()
    ManifestTable.append(Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "v"), path)
    ManifestTable.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), path)
    val d = ManifestTable.diff(spark, path, 1, 2)
      .orderBy("id", "change").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // one of the duplicate (2,b) copies vanished; (3,c) appeared
    d.toSeq shouldBe Seq(("removed", 2L, "b"), ("added", 3L, "c"))
    // identical versions diff to empty
    ManifestTable.diff(spark, path, 2, 2).count() shouldBe 0
  }

  test("readAppended reads only the new dirs; refuses rewritten lineage") {
    import spark.implicits._
    val path = tmp()
    ManifestTable.append((1L to 3L).toDF("id"), path)
    ManifestTable.append((4L to 6L).toDF("id"), path)
    ids(ManifestTable.readAppended(spark, path, 1, 2)) shouldBe (4L to 6L)
    // same-version increment is empty (schema intact)
    ManifestTable.readAppended(spark, path, 2, 2).count() shouldBe 0
    ManifestTable.readAppended(spark, path, 2, 2).columns shouldBe Array("id")
    // overwrite breaks append-only lineage: fail loudly, point at diff
    ManifestTable.overwrite(Seq(9L).toDF("id"), path)
    an[IllegalArgumentException] should be thrownBy
      ManifestTable.readAppended(spark, path, 2, 3)
  }

  test("mergeSchema surfaces evolved columns as nulls for earlier files") {
    import spark.implicits._
    val path = tmp()
    ManifestTable.append(Seq((1L, "a")).toDF("id", "v"), path)
    ManifestTable.append(Seq((2L, "b", 9L)).toDF("id", "v", "extra"), path)
    val merged = ManifestTable.readLatest(spark, path, mergeSchema = true)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    merged.toSeq shouldBe Seq((1L, "a", -1L), (2L, "b", 9L))
  }

  test("RACING committers serialize: dense versions, no lost rows") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = tmp()
    // 8 threads commit concurrently; the rename CAS must serialize
    // them onto versions 1..8 with every batch surviving exactly once
    val futures = (1 to 8).map(i => Future {
      ManifestTable.append(Seq(i.toLong).toDF("id"), path)
    })
    val versions = Await.result(Future.sequence(futures), 120.seconds)
    versions.sorted shouldBe (1 to 8)
    ManifestTable.versions(spark, path) shouldBe (1 to 8)
    ids(ManifestTable.readLatest(spark, path)) shouldBe (1L to 8L)
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
