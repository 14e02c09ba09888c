package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Checkpoints.round]] routing: local mode cuts lineage via
  * `localCheckpoint` (no checkpoint dir involved); the
  * `spark.graft.reliableCheckpoint` / `SPARK_GRAFT_RELIABLE_CHECKPOINT`
  * switch routes round state to RELIABLE `Dataset.checkpoint` against a
  * checkpoint directory — the cluster profile where an executor loss
  * must not lose locally-checkpointed round state.
  */
class CheckpointsSpec extends SparkSpec {

  test("round() default path localCheckpoints (no checkpoint dir needed)") {
    assert(sys.props.get("spark.graft.reliableCheckpoint").isEmpty)
    val df = Checkpoints.round(spark.range(100).toDF("v")
      .withColumn("w", col("v") * 2))
    assert(df.count() === 100)
    // localCheckpoint leaves the reliable checkpoint dir untouched
    assert(spark.sparkContext.getCheckpointDir.isEmpty ||
      !df.queryExecution.analyzed.toString.contains("ReliableCheckpoint"))
    Checkpoints.free(df)
  }

  test("reliable switch routes round() through Dataset.checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft_relckpt").toString
    sys.props("spark.graft.reliableCheckpoint") = dir
    try {
      val df = Checkpoints.round(spark.range(50).toDF("v")
        .withColumn("w", col("v") + 1))
      assert(df.count() === 50)
      assert(df.agg(sum(col("w"))).head().getLong(0) === (1L to 50L).sum)
      // the reliable path must have set the context checkpoint dir and
      // written RDD checkpoint data under it
      val set = spark.sparkContext.getCheckpointDir
      assert(set.nonEmpty && set.get.contains(
        new java.io.File(dir).getName))
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      assert(wrote >= 1, s"no rdd-* checkpoint data under $dir")
    } finally sys.props.remove("spark.graft.reliableCheckpoint")
  }
}
