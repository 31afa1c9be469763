package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.schema.TripSchemas

/** Daily fare KPIs (SURVEY.md §2.5 A1-A6).
  *
  * The reference computes the five metrics as five separate Spark jobs
  * over the same DataFrame (reference:
  * src/glue_scripts/daily_kpi_aggregation.py:113-117) — five scans. The
  * engine computes all of them in ONE `agg`: Catalyst plans a single
  * partial+final HashAggregate pair, so a 100 TB day is read once.
  *
  * All arithmetic stays in DoubleType; the reference's float32 cast
  * (daily_kpi_aggregation.py:93-96) is a published-value artifact, not a
  * semantic (BASELINE.md records both value sets).
  */
object KpiAggregation {

  /** The five fare KPIs as aggregate columns over `fare_amount`.
    *
    * The fare sum accumulates as DECIMAL(38,12): decimal addition is
    * exact and therefore associative, so the result is independent of
    * partition/merge order, unlike a double sum whose low bits depend
    * on accumulation order. Each fare is rounded once at 12 decimals
    * going in (≈1e-12 relative — fares are dollars; the reference's
    * own published KPIs carry float64 noise far above that), the sum
    * is cast back to double at output, and the average derives from it
    * by one double division — any engine doing the same fixed math
    * bit-matches. At scale this also removes run-to-run jitter in
    * published KPI documents.
    */
  def kpiColumns(fare: Column): Seq[Column] = {
    val exactSum = sum(fare.cast("decimal(38,12)")).cast("double")
    Seq(
      exactSum.as("total_fare"),
      count(lit(1)).as("count_trips"),
      (exactSum / count(fare)).as("average_fare"),
      max(fare).as("max_fare"),
      min(fare).as("min_fare")
    )
  }

  /** A6 generalized form: per-date KPIs over completed trips. One
    * shuffle on `date`; map-side partial aggregation makes the shuffle
    * five doubles per date per task regardless of input size.
    */
  def dailyKpis(trips: DataFrame): DataFrame = {
    val ks = kpiColumns(col("fare_amount"))
    trips
      .where(col("status") === TripSchemas.StatusCompleted)
      .groupBy(col("date"))
      .agg(ks.head, ks.tail: _*)
  }

  /** The reference's exact job: one day, global aggregate
    * (F1 partition prune + F2 status filter + A1-A5).
    */
  def kpisForDate(trips: DataFrame, date: String): DataFrame = {
    val ks = kpiColumns(col("fare_amount"))
    trips
      .where(col("date") === to_date(lit(date)) &&
        col("status") === TripSchemas.StatusCompleted)
      .agg(ks.head, ks.tail: _*)
  }

  /** Streaming generalization of A6 (SURVEY.md §2.7): incremental daily
    * KPIs over the completed-trip stream via a watermarked 1-day tumbling
    * window. The reference computes "daily" as a nightly batch job; this
    * is the same logical query kept continuously up to date, with the
    * watermark bounding aggregation state. Output (Update mode) upserts
    * one row per day.
    *
    * `eventCol` defaults to `pickup_datetime` so a cross-midnight trip
    * lands in the SAME day the batch path assigns it (`TripRecord.date`
    * derives from pickup, README.md:34) — bucketing on dropoff would make
    * the streaming and nightly documents disagree for every trip that
    * crosses midnight. The watermark delay must therefore cover trip
    * duration plus delivery skew (completions arrive after pickup).
    */
  def dailyKpisStream(
      completedTrips: DataFrame,
      watermarkDelay: String = "1 day",
      eventCol: String = "pickup_datetime"): DataFrame = {
    val ks = kpiColumns(col("fare_amount"))
    completedTrips
      .where(col("status") === TripSchemas.StatusCompleted)
      .withWatermark(eventCol, watermarkDelay)
      .groupBy(window(col(eventCol), "1 day").as("w"))
      .agg(ks.head, ks.tail: _*)
      .select(to_date(col("w.start")).as("date"),
        col("total_fare"), col("count_trips"), col("average_fare"),
        col("max_fare"), col("min_fare"))
  }

  /** P8: previous-day string, `yyyy-MM-dd` (reference:
    * daily_kpi_aggregation.py:33-36 — `datetime.now() - timedelta(1)`).
    * Pass a different `asOf` for deterministic tests.
    */
  def previousDay(asOf: Column = current_date()): Column =
    date_format(date_sub(asOf.cast("date"), 1), "yyyy-MM-dd")

  /** A7: `describe(include='all')` analog (reference: eda.ipynb cells
    * 6-7). Spark's own `df.summary()` is the direct passthrough; this
    * variant is the deterministic, oracle-friendly form — one row per
    * column with count/mean/stddev/min/max, computed in a single pass
    * (one agg, 5·k aggregate expressions, then an unpivot).
    *
    * Pass `fixedPointScale = Some(s)` for fixed-point data (money with
    * s=2, integral keys with any s): the first and second moments then
    * accumulate as exact decimals — `sum(x)` at scale s and `sum(x·x)`
    * at scale 2s — and mean/stddev derive from them by a fixed double
    * expression, making the output independent of accumulation order.
    */
  def numericSummary(
      df: DataFrame,
      columns: Seq[String],
      fixedPointScale: Option[Int] = None): DataFrame = {
    val aggs = columns.flatMap { c =>
      val (mean, sd) = fixedPointScale match {
        case Some(sc) =>
          // exact decimal moments: x fits (18, sc); x·x fits (37, 2·sc).
          // The variance operand is clamped at 0: for high-mean/low-
          // variance data the s2 - s1²/n subtraction can land a hair
          // negative once the exact decimals hit double, and sqrt of
          // that is NaN. n = 1 yields NULL (sample stddev undefined),
          // mirrored in the q13 oracle.
          val xd = col(c).cast(s"decimal(18,$sc)")
          val s1 = sum(xd).cast("double")
          val s2 = sum(xd * xd).cast("double")
          val n = count(col(c)).cast("double")
          val variance = greatest(s2 - s1 * s1 / n, lit(0.0)) / (n - lit(1.0))
          (s1 / n, when(n > 1.0, sqrt(variance)))
        case None =>
          (avg(col(c)), stddev_samp(col(c)))
      }
      Seq(
        count(col(c)).as(s"${c}__count"),
        mean.as(s"${c}__mean"),
        sd.as(s"${c}__stddev"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = columns.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__count").as("count"),
        col(s"${c}__mean").as("mean"),
        col(s"${c}__stddev").as("stddev"),
        col(s"${c}__min").as("min"),
        col(s"${c}__max").as("max"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** KPI output document: the nested JSON envelope the reference
    * publishes (reference: daily_kpi_aggregation.py:120-125; schema in
    * FIXTURES.md §4). One row per day.
    */
  def kpiDocument(dailyKpis: DataFrame): DataFrame =
    dailyKpis.select(
      date_format(col("date"), "yyyy-MM-dd").as("date"),
      struct(
        date_format(col("date"), "yyyy-MM-dd").as("trip_date"),
        col("total_fare"),
        col("count_trips"),
        col("average_fare"),
        col("max_fare"),
        col("min_fare")
      ).as("metrics"),
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("timestamp")
    )
}
