package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}

/** The 6-column input contract as a typed boundary (SURVEY §1.3: typed
  * `Dataset[T]` where the schema is fixed — the generated-data contract —
  * untyped `DataFrame` everywhere schemas are dynamic).
  */
final case class DeliveryRecord(
    Delivery_ID: String,
    Pickup_DateTime: Timestamp,
    Delivery_Timestamp: Timestamp,
    Package_Type: String,
    Distance: Double,
    Delivery_Zone: String)

object DeliveryRecord {
  /** Compile-time-checked view of a conforming frame (fails analysis on a
    * missing/mistyped column — the engine's schema enforcement point).
    */
  def typed(df: DataFrame): Dataset[DeliveryRecord] = {
    import df.sparkSession.implicits._
    df.as[DeliveryRecord]
  }
}
