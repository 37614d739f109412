package graft.ops

import org.apache.spark.sql.Dataset

/** The ONE cut-point for "materialize this intermediate and let every
  * downstream consumer reuse the blocks".
  *
  * Default mode (`local`) is the lazy `localCheckpoint` pattern the
  * repo sanctions everywhere: blocks live on executors, lineage is
  * truncated (no plan growth across iterations, no re-execution of the
  * subtree per consumer), and the ContextCleaner reclaims the blocks
  * once the result frames go unreferenced — unlike a `persist()` with
  * no release point, nothing pins a CacheManager entry for the session
  * lifetime.
  *
  * The trade `localCheckpoint` makes is FAILURE RECOVERY: truncated
  * lineage means a lost executor's blocks cannot be recomputed — the
  * query fails instead. Irrelevant at local[n] (one JVM: if the
  * "executor" died, so did the query), routine at cluster scale, where
  * thousands of executors make block loss an expected event. For that
  * deployment, set
  *
  *   spark.graft.checkpoint.mode = reliable
  *
  * and the SAME call sites route through a reliable `checkpoint()`:
  * partitions are written to `spark.graft.checkpoint.dir` (any
  * HDFS/object-store path; defaults to a local temp dir so the mode is
  * testable without a cluster), and a lost executor re-READS from
  * storage instead of failing the query. Costs one write+read of the
  * staged data — the standard durability price; lineage above the cut
  * is still dropped either way, which is the point of the cut.
  *
  * Results are mode-invariant (StageSpec pins local == reliable for a
  * representative pipeline), so the conf is purely an ops decision.
  */
object Stage {

  /** "local" (default) or "reliable". */
  val ModeKey = "spark.graft.checkpoint.mode"

  /** Reliable-mode storage root; set once per session. */
  val DirKey = "spark.graft.checkpoint.dir"

  def cut[T](ds: Dataset[T], eager: Boolean): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "local" => ds.localCheckpoint(eager)
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = spark.conf.get(DirKey,
            java.nio.file.Files
              .createTempDirectory("graft_reliable_ckpt").toString)
          sc.setCheckpointDir(dir)
        }
        ds.checkpoint(eager)
      case other =>
        throw new IllegalArgumentException(
          s"$ModeKey must be 'local' or 'reliable', got '$other'")
    }
  }

  /** `.stage()` ≙ lazy cut (compute on first action, then reuse);
    * `.stageEager()` ≙ materialize NOW (for cut-points whose blocks
    * must exist before a dependent `unpersist`, or inside a try whose
    * finally releases the inputs). */
  implicit final class StageOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def stage(): Dataset[T] = cut(ds, eager = false)
    def stageEager(): Dataset[T] = cut(ds, eager = true)
  }
}
