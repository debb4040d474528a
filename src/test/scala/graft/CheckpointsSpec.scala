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

  test("checkpointed registry queries are value-identical under both durability paths") {
    // The deploy-posture parity ask: every query whose plan runs
    // through Checkpoints.materialize must produce the same rows
    // whether the materialization is executor-local (localCheckpoint,
    // the local[n] default) or reliable (checkpoint() into
    // spark.graft.checkpointDir, the 1000-executor posture). A
    // representative slice across the checkpointed families — the
    // iterative graph programs, the cell-blocked dedup, and the
    // banding audit — runs under BOTH configs; rows canonicalize to
    // sorted string form and must match exactly. (The full-registry
    // reliable-path sweep at sf0.01 is recorded in BENCHNOTES.)
    val names = Seq("q94_pagerank", "q123_triangle_census",
      "q89_semantic_dedup", "q146_recall_sweep")
    val sf = "/root/testdata/sf0.001"
    def canon(name: String): Seq[String] = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect().map(_.toSeq.map(v =>
        if (v == null) "NULL" else v.toString).mkString("|")).sorted.toSeq
    }
    val local = names.map(n => n -> canon(n)).toMap
    val dir = Files.createTempDirectory("graft-ckpt-parity").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      names.foreach { n =>
        assert(canon(n) === local(n),
          s"$n diverged between local and reliable checkpoint paths")
      }
      // the reliable path actually engaged: checkpoint files landed
      val files = Files.walk(Paths.get(dir))
      try assert(files.filter(Files.isRegularFile(_)).count() > 0,
        s"expected reliable checkpoint files under $dir")
      finally files.close()
    } finally spark.conf.unset(Checkpoints.DirConf)
  }
}
