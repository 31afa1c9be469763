package graft

/** Physical-plan audit tool behind PLANS.md: prints the formatted plan
  * of selected driver queries so plan regressions (interpreted
  * fallback, lost pushdown, surprise shuffles) show up as a diff, not
  * a timing surprise.
  *
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01 q21_quality_score q22_lang_id"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(4, "graft-plan-audit")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
