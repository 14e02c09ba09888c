package graft.etl

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — distributed synthetic delivery generator.
  *
  * Mirrors `/root/reference/supercourier_etl/core/extract.py:82-119`
  * (sequential `SC{1000+i}` ids, pickup uniform in [anchor−30d, anchor],
  * delivery = pickup + uniform(20,360) whole minutes, categorical sampling
  * with the reference's probability vectors, distance uniform(1,50) @ 2 dp)
  * with two deliberate upgrades for Spark scale:
  *
  *   - `spark.range(0, n, 1, parts)` replaces the reference's 10k-row
  *     chunk loop — partitioning IS the chunking, so generation is
  *     embarrassingly parallel across executors at any n.
  *   - seeded `rand(seed)` makes every run (and every re-execution of the
  *     plan, e.g. a multi-format write fan-out) produce identical data;
  *     the reference is unseeded and non-deterministic.
  */
object Generator {

  /** Probability vectors from `core/extract.py:94-95,110,112`. */
  val PackageTypes: Seq[(String, Double)] = Seq(
    "Small" -> 0.40, "Medium" -> 0.30, "Large" -> 0.15,
    "Extra Large" -> 0.10, "Special" -> 0.05)
  val Zones: Seq[(String, Double)] = Seq(
    "Urban" -> 0.35, "Suburban" -> 0.25, "Rural" -> 0.20,
    "Industrial" -> 0.10, "Shopping Center" -> 0.10)

  /** Inverse-CDF categorical pick over a uniform [0,1) column. */
  def categorical(r: Column, items: Seq[(String, Double)]): Column = {
    val cum = items.scanLeft(0.0) { case (acc, (_, p)) => acc + p }.tail
    items.init.zip(cum.init).foldRight(lit(items.last._1)) {
      case (((name, _), hi), acc) => when(r < hi, lit(name)).otherwise(acc)
    }
  }

  /** Sized so ~2M rows land per partition but small n still uses all
    * cores — holds up whether n is 1e3 or 1e10 on a 1000-executor cluster.
    */
  def partitionsFor(spark: SparkSession, rows: Long): Int = {
    val byDefault = spark.sparkContext.defaultParallelism
    val bySize = math.max(1L, rows / 2000000L)
    math.max(byDefault.toLong, bySize).min(Int.MaxValue).toInt
  }

  /** `partitions <= 0` → [[partitionsFor]] (the deployment default).
    * Pass an explicit count when the BYTES must be reproducible across
    * environments: `rand(seed)` derives each partition's stream from
    * (seed, partitionId), so the output is a function of the partition
    * count — same n + seed + partitions ⇒ identical rows anywhere.
    */
  def deliveries(
      spark: SparkSession,
      rows: Long,
      seed: Long = 42L,
      anchor: Instant = Instant.parse("2025-09-26T00:00:00Z"),
      partitions: Int = -1): DataFrame = {
    val anchorSec = anchor.getEpochSecond
    val windowSec = 30L * 24 * 3600
    // Each rand() is materialized in its own projection FIRST: a
    // nondeterministic expression referenced from several branches of a
    // when-chain is re-evaluated per reference (advancing the RNG and
    // skewing the distribution) if inlined. CollapseProject never merges
    // multiply-referenced nondeterministic columns, so this is safe.
    val nParts = if (partitions > 0) partitions else partitionsFor(spark, rows)
    val withRand = spark.range(0, rows, 1, nParts)
      .select(col("id"), rand(seed).as("_r0"), rand(seed + 1).as("_r1"),
        rand(seed + 2).as("_r2"), rand(seed + 3).as("_r3"),
        rand(seed + 4).as("_r4"))
    val pickupSec =
      lit(anchorSec - windowSec) + floor(col("_r0") * windowSec).cast("long")
    // int(uniform(20, 360)) truncates the half-open [20, 360) → 20..359
    // (`generator.py` duration domain); ×340, not ×341, or 360 leaks in
    val durSec = (lit(20L) + floor(col("_r1") * 340).cast("long")) * 60
    withRand.select(
      concat(lit("SC"), (col("id") + 1000).cast("string")).as("Delivery_ID"),
      timestamp_seconds(pickupSec).as("Pickup_DateTime"),
      timestamp_seconds(pickupSec + durSec).as("Delivery_Timestamp"),
      categorical(col("_r2"), PackageTypes).as("Package_Type"),
      Transform.round2(lit(1.0) + col("_r3") * 49.0).as("Distance"),
      categorical(col("_r4"), Zones).as("Delivery_Zone"))
  }
}
