package org.apache.spark.sql.execution.streaming.state

/** Typed bridge to `StateStore.unloadAll()`, which is `private[sql]`.
  *
  * The graft bench harness ([[graft.Bench.resetSession]]) must drop
  * the state-store providers that terminated streaming queries leave
  * loaded in the executor JVMs: every run here uses a transient
  * checkpoint (nothing ever resumes), so the providers' in-memory
  * version maps are pure leak until the maintenance task's next tick.
  * Spark exposes no public API for this — the accepted extension
  * pattern is a one-method accessor compiled into the owning package
  * (same mechanism other Spark-ecosystem libraries use for
  * private[sql] surfaces). Keep this file to exactly this one
  * delegation; engine code must not grow dependencies on Spark
  * internals beyond it.
  */
object GraftStateStoreAccess {
  def unloadAllStateStores(): Unit = StateStore.unloadAll()
}
