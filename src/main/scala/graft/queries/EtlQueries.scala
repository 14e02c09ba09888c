package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.etl.Transform
import Sql.D

/** The reference's ETL surface (SURVEY §2.1-§2.3) exercised as graded
  * queries over the driver's `orders` table: a deterministic 6-column
  * delivery input is derived arithmetically from `o_orderkey`/`o_custkey`
  * (both engines compute it identically), then run through the REAL
  * library transform chain (`graft.etl.Transform`) while the DuckDB oracle
  * re-states the same semantics in SQL. This hash-checks every
  * correctness-critical reference behavior — factor tables with defaults,
  * regex branch order, closed hour bounds, `"MM.SS"` display, strict-`>`
  * status, the composite-key broadcast left join and its null path — at
  * sf scale.
  */
object EtlQueries {

  val Packages: Seq[String] =
    Seq("Small", "Medium", "Large", "Extra Large", "Special")
  val Zones: Seq[String] =
    Seq("Urban", "Suburban", "Rural", "Industrial", "Shopping Center")

  /** Index 0 is null → exercises P14/P11 null branch on matched rows. */
  val Conditions: Seq[String] = Seq(
    null, "Light rain", "Heavy snow", "Fog", "Patchy light rain with fog",
    "Sunny", "Patchy light drizzle", "Blizzard", "Sleet showers", "Mist",
    "Overcast")

  private def pickByIndex(k: Column, items: Seq[String]): Column =
    items.zipWithIndex.foldLeft(lit(null).cast(StringType)) {
      case (acc, (s, i)) =>
        when(k === i, if (s == null) lit(null).cast(StringType) else lit(s))
          .otherwise(acc)
    }

  // ------------------------------------------------------------------
  // Spark side
  // ------------------------------------------------------------------

  /** Deterministic 6-column delivery input derived from `orders`. The
    * pickup time spreads over all 24 hours ((key % 1440) minutes past the
    * order date); delivery = pickup + (20 + key % 341) minutes, i.e. the
    * reference's uniform(20,360)-whole-minute domain.
    */
  def deliveries(s: SparkSession, dir: String): DataFrame = {
    val key = col("o_orderkey")
    val pickupSec = unix_timestamp(col("o_orderdate")) + pmod(key, lit(1440)) * 60
    val durMin = lit(20) + pmod(key, lit(341))
    Tables(s, dir, "orders").select(
      concat(lit("SC"), (key + 1000).cast("string")).as("Delivery_ID"),
      timestamp_seconds(pickupSec).as("Pickup_DateTime"),
      timestamp_seconds(pickupSec + durMin * 60).as("Delivery_Timestamp"),
      pickByIndex(pmod(key, lit(5)), Packages).as("Package_Type"),
      (pmod(key, lit(4900)).cast("double") / 100.0 + 1.0).as("Distance"),
      pickByIndex(pmod(col("o_custkey"), lit(5)), Zones).as("Delivery_Zone"),
      key.as("_k"))
  }

  /** Hourly weather lookup derived from the distinct order dates: ~24 rows
    * per date with every 5th (day+hour) slot missing (→ null after the
    * left join) and a null-condition slot (index 0). Tiny by construction
    * — exactly the shape the library broadcast-joins.
    */
  def weatherTable(s: SparkSession, dir: String): DataFrame = {
    val dates = Tables(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("date")).distinct()
    dates
      .select(col("date"), explode(sequence(lit(0), lit(23))).as("Hour"))
      .where(pmod(dayofmonth(col("date")) + col("Hour"), lit(5)) =!= 0)
      .withColumn("Weather_Condition",
        pickByIndex(
          pmod(dayofmonth(col("date")) * 31 + col("Hour") * 7, lit(11)),
          Conditions))
  }

  /** Full 13-column pipeline with a per-row inline weather assignment
    * (join-free variant — isolates the scalar surface P1-P13).
    */
  def fullPipeline(s: SparkSession, dir: String): DataFrame =
    deliveries(s, dir)
      .transform(Transform.addTemporalFeatures)
      .withColumn("Weather_Condition",
        pickByIndex(pmod(col("_k"), lit(Conditions.length)), Conditions))
      .transform(Transform.calculateDuration)
      .transform(Transform.determineDelayStatus)
      .drop("_k")
      .orderBy("Delivery_ID")

  /** Full pipeline through the REAL broadcast left join (J1) against the
    * derived weather table, null path included.
    */
  def weatherJoinPipeline(s: SparkSession, dir: String): DataFrame =
    deliveries(s, dir).drop("_k")
      .transform(Transform.addTemporalFeatures)
      .transform(Transform.enrichWithWeather(Some(weatherTable(s, dir))))
      .transform(Transform.calculateDuration)
      .transform(Transform.determineDelayStatus)
      .orderBy("Delivery_ID")

  private def temporal(s: SparkSession, dir: String): DataFrame =
    deliveries(s, dir)
      .transform(Transform.addTemporalFeatures)
      .select(col("Delivery_ID"), col("Hour"), col("Weekday"))
      .orderBy("Delivery_ID")

  private def durationDisplay(s: SparkSession, dir: String): DataFrame =
    deliveries(s, dir)
      .transform(Transform.calculateDuration)
      .select(col("Delivery_ID"), col("Actual_Delivery_Time_Minutes"),
        col("Actual_Delivery_Time_Display"))
      .orderBy("Delivery_ID")

  /** P7-P11 exposed individually — pinpoints a wrong factor table. */
  private def factors(s: SparkSession, dir: String): DataFrame =
    deliveries(s, dir)
      .transform(Transform.addTemporalFeatures)
      .withColumn("Weather_Condition",
        pickByIndex(pmod(col("_k"), lit(Conditions.length)), Conditions))
      .select(
        col("Delivery_ID"),
        Transform.factorLookup(col("Package_Type"), Transform.PackageFactors, 1.0)
          .as("package_factor"),
        Transform.factorLookup(col("Delivery_Zone"), Transform.ZoneFactors, 1.0)
          .as("zone_factor"),
        Transform.peakFactor(col("Hour")).as("peak_factor"),
        Transform.dayFactor(col("Weekday")).as("day_factor"),
        Transform.weatherFactor(col("Weather_Condition")).as("weather_factor"))
      .orderBy("Delivery_ID")

  /** S1 — seeded generator, graded against a GOLDEN SNAPSHOT: the
    * seeded rand stream has no DuckDB twin, but it can match ITSELF, so
    * the query reduces the pinned (rows=10000, seed=42) output to an
    * order-independent content fingerprint (row count + sum and xor of
    * per-row hashes; sum is mod-reduced so 10k terms can't overflow
    * ANSI bigint addition) and the oracle re-states the committed
    * golden values as constants. Any accidental change to seeding,
    * distributions, or column derivations fails the hash loudly —
    * where the old rows-only check passed anything with 10000 rows.
    */
  private def generator(s: SparkSession, dir: String): DataFrame = {
    val rowHash = xxhash64(
      col("Delivery_ID"),
      unix_timestamp(col("Pickup_DateTime")),
      unix_timestamp(col("Delivery_Timestamp")),
      col("Package_Type"), col("Distance"), col("Delivery_Zone"))
    // partitions pinned: rand(seed) streams derive from (seed,
    // partitionId), so the fingerprint is only stable if the partition
    // count doesn't float with the session's core count
    graft.etl.Generator.deliveries(s, rows = 10000, seed = 42L, partitions = 32)
      .agg(count(lit(1)).as("n_rows"),
        sum(pmod(rowHash, lit(100000000000000L))).as("hash_sum"),
        expr("bit_xor(" +
          "xxhash64(Delivery_ID, unix_timestamp(Pickup_DateTime), " +
          "unix_timestamp(Delivery_Timestamp), Package_Type, Distance, " +
          "Delivery_Zone))").as("hash_xor"))
  }

  /** Golden fingerprint of `Generator.deliveries(rows=10000, seed=42)`
    * — recorded from the committed generator; the graded oracle.
    */
  private val generatorOracle: String =
    """SELECT CAST(10000 AS BIGINT) AS n_rows,
  CAST(496248693372412042 AS BIGINT) AS hash_sum,
  CAST(8206647550908345066 AS BIGINT) AS hash_xor"""

  // ------------------------------------------------------------------
  // DuckDB oracle side — generated from the SAME constants
  // ------------------------------------------------------------------

  private val deliveriesCte: String = s"""deliveries AS (
  SELECT
    'SC' || CAST(o_orderkey + 1000 AS VARCHAR) AS "Delivery_ID",
    o_orderdate + (o_orderkey % 1440) * INTERVAL 1 MINUTE AS "Pickup_DateTime",
    o_orderdate + ((o_orderkey % 1440) + 20 + (o_orderkey % 341)) * INTERVAL 1 MINUTE AS "Delivery_Timestamp",
    ${Sql.caseByIndex("o_orderkey % 5", Packages)} AS "Package_Type",
    CAST(o_orderkey % 4900 AS DOUBLE) / ${D("100")} + ${D("1")} AS "Distance",
    ${Sql.caseByIndex("o_custkey % 5", Zones)} AS "Delivery_Zone",
    o_orderkey AS _k
  FROM orders
)"""

  private val temporalCte: String =
    """tmp1 AS (
  SELECT *, CAST(hour("Pickup_DateTime") AS INT) AS "Hour",
         dayname("Pickup_DateTime") AS "Weekday"
  FROM deliveries
)"""

  private val inlineWeatherCte: String = s"""tmp2 AS (
  SELECT *, ${Sql.caseByIndex(s"_k % ${Conditions.length}", Conditions)} AS "Weather_Condition"
  FROM tmp1
)"""

  private val joinWeatherCtes: String = s"""dates AS (
  SELECT DISTINCT CAST(o_orderdate AS DATE) AS date FROM orders
),
weather AS (
  SELECT date, CAST(h AS INT) AS "Hour",
         ${Sql.caseByIndex("(date_part('day', date) * 31 + h * 7) % 11", Conditions)} AS "Weather_Condition"
  FROM dates, generate_series(0, 23) t(h)
  WHERE (date_part('day', date) + h) % 5 <> 0
),
tmp2 AS (
  SELECT t.*, w."Weather_Condition"
  FROM tmp1 t LEFT JOIN weather w
    ON CAST(t."Pickup_DateTime" AS DATE) = w.date AND t."Hour" = w."Hour"
)"""

  private val durationCtes: String = {
    val minutes = s"""CAST(_secs AS DOUBLE) / ${D("60")}"""
    s"""tmp2s AS (
  SELECT *, date_diff('second', "Pickup_DateTime", "Delivery_Timestamp") AS _secs
  FROM tmp2
),
tmp3 AS (
  SELECT *,
    ${Sql.round2(minutes)} AS "Actual_Delivery_Time_Minutes",
    CAST(CAST(FLOOR($minutes) AS BIGINT) AS VARCHAR) || '.' || lpad(CAST(_secs % 60 AS VARCHAR), 2, '0') AS "Actual_Delivery_Time_Display"
  FROM tmp2s
)"""
  }

  private def pfSql = Sql.caseByKey("\"Package_Type\"",
    Packages.map(p => p -> Transform.PackageFactors(p)), 1.0)
  private def zfSql = Sql.caseByKey("\"Delivery_Zone\"",
    Zones.map(z => z -> Transform.ZoneFactors(z)), 1.0)
  private def peakSql =
    s"""CASE WHEN "Hour" BETWEEN 7 AND 9 THEN ${D(1.3)} WHEN "Hour" BETWEEN 17 AND 19 THEN ${D(1.4)} ELSE ${D(1.0)} END"""
  private def daySql =
    s"""CASE WHEN "Weekday" IN ('Monday','Friday') THEN ${D(1.2)} WHEN "Weekday" IN ('Saturday','Sunday') THEN ${D(0.9)} ELSE ${D(1.0)} END"""
  private def wfSql =
    s"""CASE WHEN "Weather_Condition" IS NULL THEN ${D(1.0)} WHEN regexp_matches("Weather_Condition", '(?i)rain|drizzle') THEN ${D(1.2)} WHEN regexp_matches("Weather_Condition", '(?i)snow|blizzard|sleet') THEN ${D(1.8)} WHEN regexp_matches("Weather_Condition", '(?i)fog|mist') THEN ${D(1.1)} ELSE ${D(1.0)} END"""

  private val statusCtes: String = {
    val theo = Sql.round2(
      s"""(${D(30.0)} + "Distance" * ${D(0.8)}) * ($pfSql) * ($zfSql) * ($peakSql) * ($daySql) * ($wfSql)""")
    s"""tmp4 AS (
  SELECT *, $theo AS "Theoretical_Time_Minutes" FROM tmp3
)"""
  }

  private val thirteenCols: String =
    Seq("Delivery_ID", "Pickup_DateTime", "Delivery_Timestamp", "Package_Type",
      "Distance", "Delivery_Zone", "Hour", "Weekday", "Weather_Condition",
      "Actual_Delivery_Time_Minutes", "Actual_Delivery_Time_Display",
      "Theoretical_Time_Minutes").map(c => s""""$c"""").mkString(", ")

  private val statusSelect: String = s"""SELECT $thirteenCols,
  CASE WHEN "Actual_Delivery_Time_Minutes" > "Theoretical_Time_Minutes" * ${D(1.2)} THEN 'Delayed' ELSE 'On-time' END AS "Status"
FROM tmp4 ORDER BY "Delivery_ID""""

  private val deliveriesOracle: String = s"""WITH $deliveriesCte
SELECT "Delivery_ID", "Pickup_DateTime", "Delivery_Timestamp", "Package_Type", "Distance", "Delivery_Zone"
FROM deliveries ORDER BY "Delivery_ID""""

  private val temporalOracle: String = s"""WITH $deliveriesCte, $temporalCte
SELECT "Delivery_ID", "Hour", "Weekday" FROM tmp1 ORDER BY "Delivery_ID""""

  private val durationOracle: String = s"""WITH $deliveriesCte, tmp1 AS (SELECT * FROM deliveries), tmp2 AS (SELECT * FROM tmp1), $durationCtes
SELECT "Delivery_ID", "Actual_Delivery_Time_Minutes", "Actual_Delivery_Time_Display"
FROM tmp3 ORDER BY "Delivery_ID""""

  private val factorsOracle: String = s"""WITH $deliveriesCte, $temporalCte, $inlineWeatherCte
SELECT "Delivery_ID",
  ($pfSql) AS package_factor,
  ($zfSql) AS zone_factor,
  ($peakSql) AS peak_factor,
  ($daySql) AS day_factor,
  ($wfSql) AS weather_factor
FROM tmp2 ORDER BY "Delivery_ID""""

  private val fullOracle: String =
    s"""WITH $deliveriesCte, $temporalCte, $inlineWeatherCte, $durationCtes, $statusCtes
$statusSelect"""

  private val weatherJoinOracle: String =
    s"""WITH $deliveriesCte, $temporalCte, $joinWeatherCtes, $durationCtes, $statusCtes
$statusSelect"""

  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(
    QueryDef("etl_deliveries",
      (s, d) => deliveries(s, d).drop("_k").orderBy("Delivery_ID"),
      Some(deliveriesOracle)),
    QueryDef("etl_temporal", temporal, Some(temporalOracle)),
    QueryDef("etl_duration_display", durationDisplay, Some(durationOracle)),
    QueryDef("etl_factors", factors, Some(factorsOracle)),
    QueryDef("etl_full_pipeline", fullPipeline _, Some(fullOracle)),
    QueryDef("etl_weather_join", weatherJoinPipeline _, Some(weatherJoinOracle)),
    QueryDef("etl_generator", generator, Some(generatorOracle)))
}
