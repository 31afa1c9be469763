package graft.schema

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Canonical schemas of the trip-event domain.
  *
  * Derived from the reference's CSV headers and Lambda projections
  * (reference: data/trip_start.csv:1, data/trip_end.csv:1,
  * src/lambda_functions/trip_processor.py:43-52,66-76). All money /
  * measure columns are DoubleType — the reference's float32 cast
  * (src/glue_scripts/daily_kpi_aggregation.py:93-96) is a precision bug
  * we deliberately do not copy (SURVEY.md §6).
  */
object TripSchemas {

  val tripStartSchema: StructType = StructType(Seq(
    StructField("trip_id", StringType, nullable = false),
    StructField("pickup_location_id", IntegerType, nullable = true),
    StructField("dropoff_location_id", IntegerType, nullable = true),
    StructField("vendor_id", IntegerType, nullable = true),
    StructField("pickup_datetime", TimestampType, nullable = true),
    StructField("estimated_dropoff_datetime", TimestampType, nullable = true),
    StructField("estimated_fare_amount", DoubleType, nullable = true)
  ))

  val tripEndSchema: StructType = StructType(Seq(
    StructField("trip_id", StringType, nullable = false),
    StructField("dropoff_datetime", TimestampType, nullable = true),
    StructField("rate_code", IntegerType, nullable = true),
    StructField("passenger_count", IntegerType, nullable = true),
    StructField("trip_distance", DoubleType, nullable = true),
    StructField("fare_amount", DoubleType, nullable = true),
    StructField("tip_amount", DoubleType, nullable = true),
    StructField("payment_type", IntegerType, nullable = true),
    StructField("trip_type", IntegerType, nullable = true)
  ))

  /** Physical schema of `data/trip_end.csv` — Spark binds explicit CSV
    * schemas POSITIONALLY, so field order must match the file's header
    * order (reference: data/trip_end.csv:1), and the telemetry quad is
    * stored as `5.0`-style floats that IntegerType cannot parse: read as
    * DoubleType first, cast in a projection (FIXTURES.md §2).
    */
  val tripEndCsvSchema: StructType = StructType(Seq(
    StructField("dropoff_datetime", TimestampType, nullable = true),
    StructField("rate_code", DoubleType, nullable = true),
    StructField("passenger_count", DoubleType, nullable = true),
    StructField("trip_distance", DoubleType, nullable = true),
    StructField("fare_amount", DoubleType, nullable = true),
    StructField("tip_amount", DoubleType, nullable = true),
    StructField("payment_type", DoubleType, nullable = true),
    StructField("trip_type", DoubleType, nullable = true),
    StructField("trip_id", StringType, nullable = false)
  ))

  /** The four end-side telemetry columns that are null together in the
    * reference data; a null quad marks an incomplete end event that must
    * not complete a trip (SURVEY.md F4).
    */
  val telemetryQuad: Seq[String] =
    Seq("rate_code", "passenger_count", "payment_type", "trip_type")

  /** Wire schema of trip-end JSON payloads: the telemetry quad is
    * emitted as `5.0`-style floats (the CSV's physical encoding survives
    * `to_json`), so the stream decoder must accept DoubleType and cast —
    * an IntegerType `from_json` would silently null the quad and mark
    * every completion telemetry-incomplete.
    */
  val tripEndWireSchema: StructType = StructType(
    tripEndSchema.fields.map { f =>
      if (telemetryQuad.contains(f.name)) f.copy(dataType = DoubleType) else f
    })

  /** Unified stored-trip record schema (reference: README.md:73-80,
    * DynamoDB TripData item shape) — derived from the [[TripRecord]]
    * encoder so it can never drift from the case class.
    */
  lazy val tripRecordSchema: StructType =
    org.apache.spark.sql.Encoders.product[TripRecord].schema

  val StatusStarted = "Started"
  val StatusCompleted = "Completed"
  val StatusExpired = "Expired" // engine extension: evicted by state timeout
}

/** Typed row of a trip-start event. */
final case class TripStart(
    trip_id: String,
    pickup_location_id: Option[Int],
    dropoff_location_id: Option[Int],
    vendor_id: Option[Int],
    pickup_datetime: Option[Timestamp],
    estimated_dropoff_datetime: Option[Timestamp],
    estimated_fare_amount: Option[Double])

/** Typed row of a trip-end event. */
final case class TripEnd(
    trip_id: String,
    dropoff_datetime: Option[Timestamp],
    rate_code: Option[Int],
    passenger_count: Option[Int],
    trip_distance: Option[Double],
    fare_amount: Option[Double],
    tip_amount: Option[Double],
    payment_type: Option[Int],
    trip_type: Option[Int]) {

  /** F4: the all-or-nothing telemetry quad — an end event with a null
    * quad never completes a trip (SURVEY.md §2.3 F4).
    */
  def telemetryComplete: Boolean =
    rate_code.isDefined && passenger_count.isDefined &&
      payment_type.isDefined && trip_type.isDefined
}

/** Union event for the streaming correlator: exactly one of start/end
  * is set; `kind` tags the originating stream (SURVEY.md S5).
  * `event_ts` is the event-time column (pickup time for starts, dropoff
  * time for ends) — the watermark/timeout clock for streaming state
  * eviction (SURVEY.md §2.7: event-time, never wall-clock, so backlog
  * replay does not spuriously expire trips).
  */
final case class TripEvent(
    trip_id: String,
    kind: String, // "start" | "end"
    start: Option[TripStart],
    end: Option[TripEnd],
    event_ts: Option[Timestamp])

object TripEvent {
  val KindStart = "start"
  val KindEnd = "end"
  def ofStart(s: TripStart): TripEvent =
    TripEvent(s.trip_id, KindStart, Some(s), None, s.pickup_datetime)
  def ofEnd(e: TripEnd): TripEvent =
    TripEvent(e.trip_id, KindEnd, None, Some(e), e.dropoff_datetime)
}

/** Correlated trip record (the DynamoDB TripData analog). */
final case class TripRecord(
    trip_id: String,
    pickup_location_id: Option[Int],
    dropoff_location_id: Option[Int],
    vendor_id: Option[Int],
    pickup_datetime: Option[Timestamp],
    estimated_dropoff_datetime: Option[Timestamp],
    estimated_fare_amount: Option[Double],
    dropoff_datetime: Option[Timestamp],
    rate_code: Option[Int],
    passenger_count: Option[Int],
    trip_distance: Option[Double],
    fare_amount: Option[Double],
    tip_amount: Option[Double],
    payment_type: Option[Int],
    trip_type: Option[Int],
    date: Option[java.sql.Date],
    status: String)

object TripRecord {
  /** Project a start event into a fresh Started record, deriving `date`
    * from pickup time (reference: README.md:34,44; SURVEY.md §1.3 —
    * deployed behavior, not the committed Lambda which omitted it).
    */
  def ofStart(s: TripStart): TripRecord = TripRecord(
    trip_id = s.trip_id,
    pickup_location_id = s.pickup_location_id,
    dropoff_location_id = s.dropoff_location_id,
    vendor_id = s.vendor_id,
    pickup_datetime = s.pickup_datetime,
    estimated_dropoff_datetime = s.estimated_dropoff_datetime,
    estimated_fare_amount = s.estimated_fare_amount,
    dropoff_datetime = None, rate_code = None, passenger_count = None,
    trip_distance = None, fare_amount = None, tip_amount = None,
    payment_type = None, trip_type = None,
    date = s.pickup_datetime.map(TripRecord.utcDay),
    status = TripSchemas.StatusStarted
  )

  /** Calendar day of an instant in UTC — matching the batch path's
    * to_date() under the pinned UTC session timezone.
    * `Timestamp.toLocalDateTime` would use the JVM default zone and
    * diverge from batch bucketing on any non-UTC machine.
    */
  private def utcDay(t: Timestamp): java.sql.Date =
    java.sql.Date.valueOf(
      t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate)

  /** Eviction record for a robust-mode buffered end whose start never
    * arrived: end fields only, `date` derived from dropoff time, status
    * Expired — so the fare is visible in the eviction side output
    * instead of silently vanishing with the state.
    */
  def ofEndOnly(e: TripEnd): TripRecord = TripRecord(
    trip_id = e.trip_id,
    pickup_location_id = None, dropoff_location_id = None, vendor_id = None,
    pickup_datetime = None, estimated_dropoff_datetime = None,
    estimated_fare_amount = None,
    dropoff_datetime = e.dropoff_datetime,
    rate_code = e.rate_code,
    passenger_count = e.passenger_count,
    trip_distance = e.trip_distance,
    fare_amount = e.fare_amount,
    tip_amount = e.tip_amount,
    payment_type = e.payment_type,
    trip_type = e.trip_type,
    date = e.dropoff_datetime.map(TripRecord.utcDay),
    status = TripSchemas.StatusExpired
  )

  /** Merge an end event onto a stored record — the put_item overwrite
    * analog (reference: trip_processor.py:65-78). Last-write-wins.
    */
  def complete(r: TripRecord, e: TripEnd): TripRecord = r.copy(
    dropoff_datetime = e.dropoff_datetime,
    rate_code = e.rate_code,
    passenger_count = e.passenger_count,
    trip_distance = e.trip_distance,
    fare_amount = e.fare_amount,
    tip_amount = e.tip_amount,
    payment_type = e.payment_type,
    trip_type = e.trip_type,
    status = TripSchemas.StatusCompleted
  )
}
