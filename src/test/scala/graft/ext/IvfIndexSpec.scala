package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The persisted IVF index: build-once cell partitioning must (a) give
  * the same answers as the in-memory probe and (b) actually prune —
  * the probed-cell filter has to reach the file listing as a
  * `PartitionFilters` entry, or the "read 1/4 of the index" scale
  * claim is fiction.
  */
class IvfIndexSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("persisted index reproduces in-memory ivfTopK; probe is partition-pruned") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = e.where(col("vec_id") < 8).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val query = e.where(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble)

    val dir = Files.createTempDirectory("ivf_index").toFile
    try {
      SimilaritySearch.writeIvfIndex(e, "vec_id", "embedding", centroids,
        dir.getAbsolutePath)
      val fromIndex = SimilaritySearch.ivfTopKFromIndex(spark,
        dir.getAbsolutePath, "vec_id", "embedding", query, 10, centroids,
        nProbe = 2, excludeId = Some(0L))
      val inMemory = SimilaritySearch.ivfTopK(e, "vec_id", "embedding",
        query, 10, centroids, nProbe = 2, excludeId = Some(0L))
      val a = fromIndex.select("vec_id").collect().map(_.getLong(0)).toSeq
      val b = inMemory.select("vec_id").collect().map(_.getLong(0)).toSeq
      a shouldBe b
      a should not be empty

      // the probe must reach the scan as a partition filter (pruned at
      // file listing), not a post-scan predicate over a full read
      val formatted = fromIndex.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(formatted)
      pf should not be empty
      pf.get.group(1) should include("cell")

      // and the pruning is real: the probed directories are a strict
      // subset of the cell partitions on disk
      val cellDirs = dir.listFiles().count(_.getName.startsWith("cell="))
      cellDirs should be > 2 // corpus spreads over more cells than we probe
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir)
    }
  }
}
