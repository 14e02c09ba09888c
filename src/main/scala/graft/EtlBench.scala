package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.etl._

/** E4 twin of the reference's `benchmarks.py` scenario matrix: timed
  * full generate→transform→load runs (all file writes included) after
  * one 10-row warm-up. Row counts via GRAFT_ETL_ROWS (comma-separated),
  * default the reference's 1e3..1e6 (1e7 optional — single-node disk
  * bound).
  */
object EtlBench {
  def main(args: Array[String]): Unit = {
    val rowCounts = sys.env.getOrElse("GRAFT_ETL_ROWS", "1000,10000,100000,1000000")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("graft_etl_bench").toString
    def run(rows: Long, format: String, out: String): Double = {
      val cfg = PipelineConfig(SourceConfig.Generate(rows),
        OutputConfig(s"$base/$out", format))
      // singleFile=false: a benchmark of the engine, not of coalesce(1)
      new Pipeline(spark, cfg, new WeatherSource.Stub(), singleFile = false)
        .run()._1
    }

    run(10, "preview", "warmup") // benchmarks.py:37-43

    val results = rowCounts.map { n =>
      val d = run(n, "all_but_xlsx", s"r$n")
      System.err.println(f"[etl-bench] $n%9d rows all_but_xlsx $d%8.2f s")
      n -> d
    }
    val qs = results.map { case (n, d) => s""""$n":$d""" }.mkString("{", ",", "}")
    println(s"""{"metric":"etl_all_but_xlsx","unit":"sec","runs":$qs}""")
    spark.stop()
  }
}
