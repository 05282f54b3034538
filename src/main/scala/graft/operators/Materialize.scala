package graft.operators

import org.apache.spark.sql.Dataset

/** Reliable-materialization seam (r18, guide §5 / r17-VERDICT item 5).
  *
  * The engine's materialize-once points used `localCheckpoint`
  * directly. Its blocks are EXECUTOR-LOCAL and non-recomputable
  * (lineage is truncated), so on a real cluster one lost executor
  * kills every in-flight query holding such blocks — acceptable in
  * `local[*]` (executor loss = JVM loss = the app is gone anyway), a
  * durability gap at 100 TB, especially for the iterative component
  * loop's accumulated per-round blocks.
  *
  * `seamCheckpoint` keeps the local behavior BYTE-IDENTICAL (no
  * checkpoint dir configured → `localCheckpoint`, exactly as before)
  * and switches to Spark's RELIABLE checkpoint — blocks in the
  * configured fault-tolerant directory, recoverable after executor
  * loss — whenever the deployment has called
  * `sparkContext.setCheckpointDir(...)`, which is the cluster
  * operator's explicit opt-in. Laziness is preserved either way (the
  * call sites pair a lazy checkpoint with the action that also needs
  * the data, so materialization stays one job).
  *
  * Every `localCheckpoint` call site in the engine routes through
  * this one seam (MaterializeSpec pins both paths).
  */
object Materialize {

  /** True when the context has a reliable checkpoint directory — the
    * deployment signal that durable materialization is wanted. */
  def reliable(ds: Dataset[_]): Boolean =
    ds.sparkSession.sparkContext.getCheckpointDir.isDefined

  implicit final class MatOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Drop-in replacement for `Dataset.localCheckpoint(eager)`:
      * local-recoverable blocks in local mode, reliable checkpoint
      * when the deployment configured a checkpoint dir. */
    def seamCheckpoint(eager: Boolean = false): Dataset[T] =
      if (Materialize.reliable(ds)) ds.checkpoint(eager)
      else ds.localCheckpoint(eager)
  }
}
