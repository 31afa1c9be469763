package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: enable with
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * to make the engine's native functions available to pure-SQL users
  * (`SELECT sig_match_count(a, b)`). Rules/strategies would be injected
  * here too — reference parity needs none (SURVEY.md §4), so functions
  * are the only injection so far.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(SigMatchCount.descriptor)
    ext.injectFunction(SortedIntersectCount.descriptor)
    ext.injectFunction(CommonPrefixChars.descriptor)
    ext.injectFunction(VectorOps.dotDescriptor)
    ext.injectFunction(VectorOps.sqdistDescriptor)
    ext.injectFunction(LangScores.descriptor)
    ext.injectFunction(BloomContains.descriptor)
    ext.injectFunction(DeflateSize.descriptor)
    UnicodeNormalize.descriptors.foreach(ext.injectFunction)
  }
}
