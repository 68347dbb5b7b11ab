package graft.schema

import org.apache.spark.sql.types._

/** Schema of the LTSS state-change table.
  *
  * Mirrors the reference's single `ltss` table
  * (reference: custom_components/ltss/models.py:27-44, README.md:104-110):
  * `time timestamptz (PK), entity_id varchar(255) (PK), state varchar(255),
  * attributes JSONB, location geometry(POINT,4326) NULL`.
  *
  * The `location` column is conditional in the reference (only when the
  * PostGIS extension is present, custom_components/ltss/__init__.py:303-328);
  * here that is the `enableLocation` flag selecting between two StructTypes.
  */
object LtssSchema {

  /** POINT as a (lon, lat) struct — SRID 4326 (WGS84) implied, matching the
    * reference's `Geometry("POINT", srid=4326)` (models.py:44). */
  val locationType: StructType = StructType(Seq(
    StructField("lon", DoubleType, nullable = true),
    StructField("lat", DoubleType, nullable = true),
  ))

  /** Base 4-column layout (no PostGIS analog available). */
  val baseSchema: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("entity_id", StringType, nullable = false),
    StructField("state", StringType, nullable = true),
    StructField("attributes", StringType, nullable = true), // JSON text ≙ JSONB
  ))

  /** 5-column layout with the optional geo column (models.py:35-44). */
  val withLocationSchema: StructType =
    StructType(baseSchema.fields :+ StructField("location", locationType, nullable = true))

  def schema(enableLocation: Boolean): StructType =
    if (enableLocation) withLocationSchema else baseSchema

  /** Input state-change event shape (HA `state_changed` analog; the driver's
    * `events` table maps onto this — see FIXTURES.md §B). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true),
  ))
}

/** Typed row of the LTSS table (variant with location). */
final case class LtssRow(
    time: java.sql.Timestamp,
    entity_id: String,
    state: String,
    attributes: String,
    location: Option[GeoPoint],
)

final case class GeoPoint(lon: Double, lat: Double)

/** Typed input event (the HA `state_changed` analog). */
final case class StateEvent(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Option[Double],
    props: String,
)
