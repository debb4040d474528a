package graft

import org.apache.spark.sql.DataFrame

/** Loop-invariant materialization with a configurable durability level.
  *
  * Iterative and multi-reference queries (q94 PageRank, q104 recursive
  * BFS, q123 triangle census, q89 SemDeDup, q107 covariance, q124
  * index insert) truncate lineage by checkpointing a frame that would
  * otherwise re-execute per reference or per iteration.
  * `localCheckpoint()` stores the blocks on executors only — fast, but
  * LOSSY under executor failure: on a real cluster a lost executor
  * takes its blocks with it and the lineage needed to recompute them
  * is gone, failing the job. Setting [[Checkpoints.DirConf]]
  * (`spark.graft.checkpointDir`) to an HDFS/S3 path switches every
  * such site to a reliable `checkpoint()` into that directory — the
  * GraphX/Pregel deployment posture for 1000-executor runs. Unset
  * (the default) keeps the fast local path, right for local[n] and
  * tests. One config flips every call site.
  */
object Checkpoints {

  /** When set to a directory, [[materialize]] writes reliable
    * checkpoints there instead of executor-local blocks. */
  val DirConf = "spark.graft.checkpointDir"

  /** Materializes `df` and truncates its lineage: reliable
    * `checkpoint()` when [[DirConf]] is set, `localCheckpoint()`
    * otherwise. Both paths are eager and preserve the physical
    * partitioning of the input plan (LogicalRDD keeps
    * outputPartitioning), so a join keyed on the checkpointed frame's
    * partitioning key still avoids a re-shuffle. */
  def materialize(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val dir = session.conf.get(DirConf, "")
    if (dir.isEmpty) df.localCheckpoint()
    else {
      val sc = session.sparkContext
      // setCheckpointDir appends a per-app UUID subdir; only (re)set
      // when the configured root changed so repeated materializations
      // share one checkpoint directory
      if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
      df.checkpoint()
    }
  }
}
