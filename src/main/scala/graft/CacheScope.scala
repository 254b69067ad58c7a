package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Release handle for the caches an operator pins.
  *
  * Several operators persist() intermediates that their RETURNED plan
  * keeps re-reading ([[graft.operators.Graph.pageRank]]'s degree-
  * annotated edges, [[graft.operators.Dedup.mergeClusters]]'s pair
  * batch, [[graft.operators.SimilaritySearch]]'s indexes). Those pins
  * are deliberate and lazily filled — but before this class the only
  * way to recover the memory in a long-lived session composing many
  * such calls was a global `spark.catalog.clearCache()`, which also
  * evicts every cache the caller pinned for other reasons.
  *
  * Contract: an operator taking a `scope` routes every persist through
  * [[pin]]; the caller closes the scope once all actions on the
  * returned plan are done, releasing EXACTLY what that operator pinned
  * and nothing else. The default [[CacheScope.unmanaged]] reproduces
  * the historical behavior (pins live until clearCache/JVM exit) while
  * holding no references — nothing accumulates in a queue nobody
  * drains.
  *
  * THREADING: pin and close are not mutually exclusive — a pin racing
  * (or landing after) close leaves that persist tracked by a drained
  * queue nobody closes again, recoverable only via global clearCache.
  * Use one scope per operator call on one thread: finish every pin
  * before close, like a file handle.
  */
final class CacheScope {
  private val pinned =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]

  /** Persist `ds` at `level` and track it for release at [[close]]. */
  def pin[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    if (tracked) pinned.add(ds)
    ds
  }

  /** Unpersist every pinned dataset (idempotent; a closed scope can be
    * reused, though one scope per operator call reads best). Plans
    * returned by the operator remain VALID after close — they just
    * recompute instead of reading the cache. */
  def close(blocking: Boolean = false): Unit = {
    var d = pinned.poll()
    while (d != null) {
      try d.unpersist(blocking) catch { case _: Throwable => () }
      d = pinned.poll()
    }
  }

  private var tracked = true
  private def untracked(): CacheScope = { tracked = false; this }
}

object CacheScope {
  /** The default for operators' `scope` parameters: persists without
    * tracking, so close() is a no-op and no Dataset reference is held —
    * exactly the pre-scope behavior for callers who don't care. */
  val unmanaged: CacheScope = new CacheScope().untracked()

  /** Run `f` with a fresh scope, closing it afterwards — for callers
    * whose actions all happen inside `f`. */
  def scoped[A](f: CacheScope => A): A = {
    val s = new CacheScope
    try f(s) finally s.close()
  }
}
