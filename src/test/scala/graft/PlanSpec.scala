package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Transform
import graft.queries.{EtlQueries, Tables}

/** Physical-plan assertions — the 100 TB design contract: the intended
  * join strategies, pushdowns and (absence of) shuffles must actually
  * appear in the executed plan, not just be hoped for.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("weather join is a broadcast hash join, never sort-merge") {
    val plan = planOf(EtlQueries.weatherJoinPipeline(spark, Sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "tiny weather side must broadcast")
  }

  test("ETL scalar chain is shuffle-free (no Exchange before the sink)") {
    // the transform chain itself — no orderBy, inline weather
    val df = EtlQueries.deliveries(spark, Sf)
      .transform(Transform.addTemporalFeatures)
      .withColumn("Weather_Condition", lit("Sunny"))
      .transform(Transform.calculateDuration)
      .transform(Transform.determineDelayStatus)
    val plan = planOf(df)
    assert(!plan.contains("Exchange"),
      s"scalar ETL chain must not shuffle:\n${plan.take(2000)}")
  }

  test("filter pushdown reaches the parquet scan (q1 shipdate)") {
    val df = Tables(spark, Sf, "lineitem")
      .where(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
      .select(col("l_orderkey"))
    val plan = planOf(df)
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      plan.take(2000))
  }

  test("column pruning: temporal query reads only the 2 needed columns") {
    val plan = planOf(
      EtlQueries.deliveries(spark, Sf).transform(Transform.addTemporalFeatures)
        .select("Delivery_ID", "Hour", "Weekday"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(plan)
    assert(readSchema.contains("o_orderkey") && readSchema.contains("o_orderdate"))
    assert(!readSchema.contains("o_totalprice") && !readSchema.contains("o_custkey"),
      readSchema)
  }

  test("whole-stage codegen covers the ETL scalar chain") {
    val df = EtlQueries.fullPipeline(spark, Sf)
    df.collect() // finalize THIS QueryExecution's adaptive plan (count()
                 // would build a separate one) — codegen stages appear then
    // codegen stages print as "*(n)" in the executed plan tree
    assert(planOf(df).contains("*(1)"), planOf(df).take(1500))
  }

  test("broadcast dims in q5: no sort-merge join against nation/region") {
    val plan = planOf(SparkEntry.queries("q5_nation_revenue")(spark, Sf))
    assert(plan.contains("BroadcastHashJoin"))
  }
}
