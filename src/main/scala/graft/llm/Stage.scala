package graft.llm

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for the iterative / multi-
  * referenced tables in the dedup chain (shingle tables, signature
  * tables, connected-components labels).
  *
  * Default mode is `localCheckpoint(eager = true)`: blocks live on
  * executors, no distributed-FS round trip — right for local mode and
  * for clusters where losing an executor may rerun the job.
  *
  * At cluster scale, set
  * {{{ spark.conf.set(Stage.ReliableConf, "true")
  *     spark.sparkContext.setCheckpointDir("hdfs://…/checkpoints") }}}
  * and every call site switches to reliable `checkpoint()`: blocks are
  * written to the checkpoint dir (HDFS / object store) and survive
  * executor loss — required for the long-running CC loop, where one
  * lost executor mid-iteration would otherwise invalidate truncated
  * lineage with nothing to recompute from.
  */
object Stage {
  val ReliableConf = "spark.graft.checkpoint.reliable"

  /** Materialize `df` eagerly and truncate its lineage, honoring the
    * [[ReliableConf]] session switch. */
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption(ReliableConf).contains("true"))
      df.checkpoint()
    else df.localCheckpoint(true)
}
