package graft.runtime

import graft.streaming.ChangeRelay
import java.util.concurrent.locks.ReentrantLock

/** T6 — query lifecycle management: one relay task per environment, started
  * and stopped under a lifecycle gate so reload storms can never leave two
  * pollers running for the same environment (the reference's stress-tested
  * invariant — ChangeTrackingBackgroundService.cs:42-49,266-325 and
  * DuplicatePollerStressTests).
  *
  * `start` is idempotent per name; `applyDiff` reacts to an [[EnvLoader]]
  * scan diff by stopping removed/updated environments and (re)starting
  * added/updated ones.
  */
final class RelayManager[H](
    startTask: String => H,
    stopTask: H => Unit,
    stopTimeoutMillis: Long = 5000) {

  private val gate = new ReentrantLock()
  private val running = scala.collection.mutable.Map[String, H]()

  def isRunning(name: String): Boolean = {
    gate.lock(); try running.contains(name.toLowerCase) finally gate.unlock()
  }

  def activeCount: Int = { gate.lock(); try running.size finally gate.unlock() }

  /** Start the environment task unless one is already live (never two
    * pollers per env). Returns true when a new task was started. */
  def start(name: String): Boolean = {
    gate.lock()
    try {
      val key = name.toLowerCase
      if (running.contains(key)) false
      else { running(key) = startTask(name); true }
    } finally gate.unlock()
  }

  def stop(name: String): Boolean = {
    gate.lock()
    try running.remove(name.toLowerCase) match {
      case Some(h) => stopTask(h); true
      case None => false
    } finally gate.unlock()
  }

  /** Hot-reload reaction: removed → stop; updated → stop + start;
    * added → start. All under the same gate. */
  def applyDiff(changes: Seq[EnvLoader.Change]): Unit = {
    gate.lock()
    try changes.foreach {
      case EnvLoader.Removed(n) =>
        running.remove(n.toLowerCase).foreach(stopTask)
      case EnvLoader.Updated(n) =>
        running.remove(n.toLowerCase).foreach(stopTask)
        running(n.toLowerCase) = startTask(n)
      case EnvLoader.Added(n) =>
        if (!running.contains(n.toLowerCase)) running(n.toLowerCase) = startTask(n)
    } finally gate.unlock()
  }

  /** Shutdown: stop everything (host budget is the caller's concern). */
  def stopAll(): Unit = {
    gate.lock()
    try { running.values.foreach(stopTask); running.clear() } finally gate.unlock()
  }
}
