package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
}

trait SparkTestBase {
  lazy val spark: SparkSession = TestSpark.spark
}
