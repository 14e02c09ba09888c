package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Deterministic per-query cost readout: run each named query once under
  * a SparkListener and report job / stage / task counts plus shuffle and
  * input bytes. Wall-clock on this host carries non-stationary ambient
  * noise (±40% between calibration runs — see OPTIMIZATION_r09.md), so
  * structural metrics are the primary before/after evidence for the
  * optimization rounds: a removed job, a fused shuffle, or shared
  * intermediate shows up here exactly, regardless of machine load.
  *
  * Usage: `runMain graft.MetricsBench <sfDir> <outJson> q1,q2,...`
  * Session shape matches graft.Bench (local[$SPARK_GRAFT_CPUS], same
  * confs, noop sink, sweep between queries).
  */
object MetricsBench {
  private class Acc extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val input = new AtomicLong
    val spillDisk = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(m.inputMetrics.bytesRead)
        spillDisk.addAndGet(m.diskBytesSpilled)
      }
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outJson, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val rows = names.split(",").map(_.trim).filter(_.nonEmpty).flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        sweep()
        val acc = new Acc
        spark.sparkContext.addSparkListener(acc)
        val t0 = System.nanoTime()
        val res = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Right((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable => Left(e.toString.take(200)) }
        // drain listener-bus events before reading the counters: the bus
        // flush API is private[spark], so poll until the task counter is
        // quiet for 300 ms (max 3 s)
        var last = -1
        var quiet = 0
        var tries = 0
        while (quiet < 1 && last != acc.tasks.get && tries < 10) { // settle loop, 3 s cap
          tries += 1
          last = acc.tasks.get
          Thread.sleep(300)
          if (acc.tasks.get == last) quiet += 1
        }
        spark.sparkContext.removeSparkListener(acc)
        val line = res match {
          case Right(sec) =>
            f"""{"query":"$name","jobs":${acc.jobs.get},"stages":${acc.stages.get},"tasks":${acc.tasks.get},"shuffle_read_mb":${acc.shufRead.get / 1e6}%.1f,"shuffle_write_mb":${acc.shufWrite.get / 1e6}%.1f,"input_mb":${acc.input.get / 1e6}%.1f,"spill_disk_mb":${acc.spillDisk.get / 1e6}%.1f,"wall_sec":$sec%.2f}"""
          case Left(err) =>
            s"""{"query":"$name","error":${"\"" + err.replace("\\", "\\\\").replace("\"", "\\\"") + "\""}}"""
        }
        System.err.println(s"[metrics] $line")
        line
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
      rows.mkString("[\n", ",\n", "\n]\n"))
    spark.stop()
  }
}
