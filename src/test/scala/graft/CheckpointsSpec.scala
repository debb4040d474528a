package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Both durability levels of Checkpoints.materialize: the default
  * executor-local path and the spark.graft.checkpointDir-driven
  * reliable path (the cluster deploy posture) — one config flips every
  * call site (q94/q104/q123/q89/q107/q124). */
class CheckpointsSpec extends SparkSpec {

  test("default path: local checkpoint truncates lineage, values intact") {
    import spark.implicits._
    val df = (1 to 100).toDF("x").withColumn("y", col("x") * 2)
    val m = Checkpoints.materialize(df)
    assert(m.collect().map(_.getInt(1)).sum === (1 to 100).map(_ * 2).sum)
    // lineage is cut: the plan bottoms out in a materialized RDD scan,
    // not the original LocalRelation pipeline
    assert(m.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.startsWith("LogicalRDD")),
      m.queryExecution.optimizedPlan.toString)
  }

  test("spark.graft.checkpointDir flips the same call to a reliable checkpoint") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val m = Checkpoints.materialize((1 to 50).toDF("x"))
      assert(m.as[Int].collect().sorted.toSeq === (1 to 50).toSeq)
      // blocks landed under the configured directory (survivable storage)
      val files = Files.walk(Paths.get(dir))
      try assert(files.filter(Files.isRegularFile(_)).count() > 0,
        s"expected reliable checkpoint files under $dir")
      finally files.close()
      // repeated materializations share one checkpoint root
      Checkpoints.materialize((1 to 5).toDF("x")).collect()
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(dir)))
    } finally spark.conf.unset(Checkpoints.DirConf)
  }
}
