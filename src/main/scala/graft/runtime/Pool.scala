package graft.runtime

/** D2 — keyed resource pool with single-flight construction, mirroring the
  * reference's connection/producer caches (RabbitMQ connections keyed
  * `host:port:vhost` behind a Lazy; Kafka producers keyed
  * `servers:topic:user` — Source/Services/MessageQueueService.cs:26-27,
  * 268-322,581-616). Driver-side state, not a data operator: sinks share
  * one live connection per key, concurrent first-use builds it once.
  */
final class KeyedPool[V](build: String => V, close: V => Unit = (_: V) => ()) {

  private val cells = new java.util.concurrent.ConcurrentHashMap[String, Lazy]()

  private final class Lazy {
    @volatile var built = false
    @volatile var closed = false
    lazy val value: V = { val v = build(pendingKey); built = true; v }
    @volatile var pendingKey: String = _
  }

  /** Get-or-create: concurrent callers for the same key all observe the
    * same instance; `build` runs at most once per key (single-flight).
    *
    * Re-checks membership after forcing the lazy build: if evict() removed
    * the cell while the build was pending (it saw built=false and skipped
    * the close), the just-built resource would be unreachable by any later
    * evict/closeAll — so the builder closes it itself and retries through
    * a fresh cell. The `closed` flag makes the close decision idempotent
    * between this path and evict()'s. */
  def get(key: String): V = {
    while (true) {
      val cell = cells.computeIfAbsent(key, k => { val l = new Lazy; l.pendingKey = k; l })
      val v = cell.value
      if (cells.get(key) eq cell) return v
      cell.synchronized { if (!cell.closed) { cell.closed = true; close(v) } }
    }
    throw new IllegalStateException("unreachable")
  }

  def contains(key: String): Boolean = cells.containsKey(key)
  def size: Int = cells.size()

  /** Evict one key (e.g. after a broken connection), closing the resource
    * if it was ever built (never construct just to close). A caller that
    * raced get() against evict() may hold a closed resource — the next use
    * fails and re-enters through get(), same as the reference's caches.
    *
    * Synchronizes on the cell: lazy-val init holds the cell's monitor, so
    * an in-flight build completes before the close decision — otherwise an
    * evict during construction would observe built=false, skip the close,
    * and leak the just-built resource forever (removed from the map, so no
    * later evict/closeAll can reach it). */
  def evict(key: String): Unit = {
    val cell = cells.remove(key)
    if (cell != null) cell.synchronized {
      if (cell.built && !cell.closed) { cell.closed = true; close(cell.value) }
    }
  }

  /** Close everything (shutdown flush path). */
  def closeAll(): Unit = {
    val it = cells.keySet().iterator()
    while (it.hasNext) evict(it.next())
  }
}

/** §3.3 — connection-health probe tracker: per-target consecutive-failure
  * counting on a sweep cycle (reference ConnectionHealthCheckService.cs:
  * 43-161, 15-minute cadence). The probe itself is injected (no egress). */
final class HealthTracker(probe: String => Boolean) {
  private val failures = scala.collection.mutable.Map[String, Int]()
  private val lastOk = scala.collection.mutable.Map[String, Boolean]()

  /** Run one sweep over the targets; returns (target → healthy). */
  def sweep(targets: Seq[String]): Map[String, Boolean] = synchronized {
    targets.map { t =>
      val ok = try probe(t) catch { case _: Exception => false }
      if (ok) failures(t) = 0 else failures(t) = failures.getOrElse(t, 0) + 1
      lastOk(t) = ok
      t -> ok
    }.toMap
  }

  def consecutiveFailures(target: String): Int = synchronized(failures.getOrElse(target, 0))
  def isHealthy(target: String): Boolean = synchronized(lastOk.getOrElse(target, true))
}
