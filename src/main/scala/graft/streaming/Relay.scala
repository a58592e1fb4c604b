package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.{EnvironmentConfig, TrackingObject}
import graft.ops.{Dlq, Envelope, Incremental, StateOps, Windows}
import graft.sinks.{Amqp, ExportFailure, ExportMeta, Sinks}
import graft.state.ParquetStateStore

/** The change-relay pipeline: one polling cycle per tracked object —
  * watermark read → incremental read (P1+P2) → envelope encode → batch →
  * fan-out to sinks → failures dead-lettered → watermark advance.
  *
  * Mirrors ChangeTrackingBackgroundService.ProcessChangesForObjectAsync
  * (reference :427-606) with the relational core as DataFrame transforms.
  * At-least-once semantics (T2): the watermark advances after the export
  * attempt even when a sink fails — failed payloads are re-driven from the
  * DLQ, never by re-polling (stored-procedure.md:92).
  */
final class ChangeRelay(
    spark: SparkSession,
    store: ParquetStateStore,
    config: EnvironmentConfig,
    fileSinkTemplate: Option[String] = None,
    horizonOf: DataFrame => Long = ChangeRelay.defaultHorizon,
    // opt-in REAL HTTP delivery for "http" endpoints (Sinks.httpPost);
    // default keeps the zero-egress prepare-only guard behavior
    performHttp: Boolean = false,
    // opt-in REAL AMQP 0-9-1 wire delivery for "rabbitmq" endpoints
    // (Sinks side: Amqp.publish; the loopback-broker e2e drives it)
    performAmqp: Boolean = false) {

  import spark.implicits._

  /** Observability: envelopes of the last non-empty cycle that were fanned
    * out INSIDE a Spark task (TaskContext present) — the distributed-export
    * invariant a spec can assert against the envelope count. */
  @volatile var lastCycleExecutorEnvelopes: Long = 0L

  /** One micro-batch cycle for one object over the current change table.
    * Returns (rows exported, new watermark). */
  def runCycle(obj: TrackingObject, changes: DataFrame, nowUtc: String): (Long, Long) =
    cycleCore(obj, changes, nowUtc,
      lookup = o => store.getWatermark(config.name, o),
      commitWm = (o, v) => store.setWatermark(config.name, o, v),
      isPaused = (envScope, objScope) =>
        store.pauses.filter(col("scope").isin(envScope, objScope)).limit(1).count() > 0)

  /** EVERY tracked object of the environment in one polling cycle — the
    * reference's per-cycle object loop (ChangeTrackingBackgroundService.cs
    * ExecuteAsync iterates `environment.TrackingObjects` each interval) —
    * with per-cycle CONTROL-STATE I/O made O(1) in the object count: the
    * watermark and pause tables are each read ONCE up front, and every
    * object's watermark advance lands in a single batched
    * [[ParquetStateStore.setWatermarks]] snapshot commit at the end
    * (per-object [[runCycle]] commits per call — O(objects) rewrites of an
    * O(objects) table per cycle). At-least-once (T2) is unchanged: the
    * batched commit still happens only AFTER every object's export attempt;
    * a crash mid-cycle loses only un-committed advances, which re-poll —
    * re-export, never loss. Returns per-object (rows exported, watermark). */
  def runCycles(objects: Seq[(TrackingObject, DataFrame)],
      nowUtc: String): Map[String, (Long, Long)] = {
    val wm = store.watermarks
      .select("environment_name", "object_name", "last_version").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pausedScopes = store.pauses.select("scope").as[String].collect().toSet
    // Deferred advances, visible to later lookups in the same cycle.
    val pending = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    // Flush in a finally: an exception on one object's export must not
    // discard EARLIER objects' successful advances — without this, one
    // failing object forces every object of the cycle to re-export next
    // time (at-least-once still held, but duplicate amplification grew
    // with object count; per-object runCycle confines re-export to the
    // failing object, and so does this).
    try {
      objects.map { case (obj, changes) =>
        obj.name -> cycleCore(obj, changes, nowUtc,
          lookup = o => pending.get(o).orElse(wm.get((config.name, o))),
          commitWm = (o, v) => pending(o) = v,
          isPaused = (envScope, objScope) =>
            pausedScopes.contains(envScope) || pausedScopes.contains(objScope))
      }.toMap
    } finally {
      if (pending.nonEmpty)
        store.setWatermarks(pending.toSeq.map { case (o, v) => (config.name, o, v) })
    }
  }

  /** The cycle body with the control-state accesses injected, so the
    * per-object and batched-cycle drivers share one implementation. */
  private def cycleCore(obj: TrackingObject, changes: DataFrame, nowUtc: String,
      lookup: String => Option[Long],
      commitWm: (String, Long) => Unit,
      isPaused: (String, String) => Boolean): (Long, Long) = {
    // P7 — pause scopes short-circuit before any work.
    val envScope = s"env:${config.name.toLowerCase}"
    val objScope = s"obj:${config.name.toLowerCase}/${obj.name.toLowerCase}"
    if (isPaused(envScope, objScope)) {
      val fv = lookup(obj.name).getOrElse(0L)
      return (0L, fv)
    }

    // T8/S7/S8 — missing watermark re-initializes per InitialSyncMode.
    val fromVersion = lookup(obj.name) match {
      case Some(v) => v
      case None if obj.initialSyncMode.equalsIgnoreCase("Full") => 0L
      case None =>
        // Seed: record the HORIZON-GATED frontier, emit nothing (S8) — an
        // un-gated seed could skip rows of in-flight transactions forever.
        val seeded = Incremental.seed(changes, horizon = horizonOf(changes))
          .select("version").as[Long].head()
        commitWm(obj.name, seeded)
        return (0L, seeded)
    }

    val horizon = horizonOf(changes)
    val batch = Incremental.incrementalRead(changes, fromVersion, horizon)
    // A2 — watermark through the same gate as the rows. Never regress: a
    // late-replayed micro-batch (e.g. an old file re-surfacing in the file
    // stream) can carry only ids below the stored watermark.
    //
    // ONE aggregate job carries BOTH the row count and the new watermark:
    // a gated id ≤ fromVersion can never lift max(fromVersion, ·), so
    // max(fromVersion, max(id) over batch) ≡ max(fromVersion,
    // gatedWatermark(changes)) — and the count rides in the same map-side
    // partial reduction. One fewer full pass over the change table per
    // cycle (at a large initial sync, a third of the read I/O).
    val stats = batch
      .agg(count(lit(1)), coalesce(max(col("id")), lit(fromVersion))).head()
    val newVersion = math.max(fromVersion, stats.getLong(1))

    val rows = batch.select(
      lit(obj.name).as("g"),
      col("operation"),
      col("id").as("version"),
      col("changed"),
      Envelope.stripNulls(map(
        lit("value"), col("value").cast("string"),
        lit("props"), col("props"))).as("payload"))

    val batchRows = stats.getLong(0)
    val exported =
      if (batchRows == 0) 0L
      else {
        // numberBatchesRange, not the W2 window: a cycle numbers ONE
        // object's rows, so the per-group window would put the whole batch
        // (a full initial sync) in a single task's sort.
        val envelopes = Envelope.encode(
          Windows.numberBatchesRange(rows, "version", config.maxRecordsPerBatch, batchRows)
            .withColumn("g", concat(col("g"), lit("#"), col("batch"))),
          "g")
        // One group (the object) per cycle, so total batches is exactly the
        // upstream numbering's ceil(rows / cap) — derivable from the count
        // already taken, no extra job.
        val totalBatches =
          ((batchRows + config.maxRecordsPerBatch - 1) / config.maxRecordsPerBatch).toInt
        // EXECUTOR-side fan-out: envelopes never collect to the driver. Each
        // partition invokes the sink guards per envelope row and returns only
        // (error, payload) failures — a full initial sync (S7) of a large
        // table streams through executors instead of materializing every
        // JSON string in driver memory. The closure captures an ExportPlan
        // of plain values, never `this` (the relay holds the session/store).
        val plan = ChangeRelay.ExportPlan(config.name, obj.name, obj.database,
          nowUtc, totalBatches, fileSinkTemplate, config.endpoints,
          config.maxPayloadSizeBytes, performHttp, performAmqp)
        val acc = spark.sparkContext.longAccumulator("graft.relay.envelopesExportedOnExecutors")
        val failures = envelopes.select("g", "envelope_json").as[(String, String)]
          .mapPartitions(it => ChangeRelay.exportPartition(plan, it, acc))
          .toDF("error_message", "data")
        // Materialize exactly once: this job runs the sink fan-out on the
        // executors; only failure rows persist (executor-cached), so the
        // isEmpty probe and the dead-letter append never re-run the export.
        val failDf = failures.localCheckpoint(true)
        // K9 — every failure dead-letters with D1 dedup. Each dead letter
        // carries ITS OWN envelope so replay re-sends exactly what failed
        // (DeadLetterService.cs stores the Data JSON per failure).
        if (!failDf.isEmpty) {
          val fdf = failDf
            .withColumn("source_key", lit(s"${config.name}_${obj.name}_${obj.database}"))
            .withColumn("tracking_object_name", lit(obj.name))
            .withColumn("environment_name", lit(config.name))
            .withColumn("database_name", lit(obj.database))
            .withColumn("data_hash", sha2(col("data"), 256))
            .withColumn("timestamp", current_timestamp())
          store.appendDeadLetters(fdf)
        }
        lastCycleExecutorEnvelopes = acc.value
        batchRows
      }

    // T2 — advance AFTER the export attempt, regardless of sink failures.
    if (newVersion > fromVersion)
      commitWm(obj.name, newVersion)
    (exported, newVersion)
  }

  /** §3.2 — dead-letter replay cycle: retention purge, then due batch,
    * attempt, delete on success / widen backoff on failure (T5). `attempt`
    * is injectable so tests can simulate endpoint recovery. Purge runs
    * FIRST so a letter past retention is never re-attempted — the
    * reference purges in the same service loop
    * (DeadLetterService.cs:148-159). */
  def replayCycle(attempt: String => Boolean, nowUtc: java.sql.Timestamp): (Long, Long) =
    replayCycle((key, _: String) => attempt(key), nowUtc)

  /** Data-aware flavor: `attempt(sourceKey, data)` receives the letter's
    * stored envelope JSON, so a real replay re-sends EXACTLY what failed —
    * the reference's DeadLetterReplayer.cs:49-72 contract (it posts the
    * stored Data). The loopback HTTP e2e spec drives this with a real
    * POST. */
  def replayCycle(attempt: (String, String) => Boolean,
                  nowUtc: java.sql.Timestamp): (Long, Long) = {
    store.purgeExpiredDeadLetters(nowUtc)
    val due = store.dueDeadLetters(config.deadLetterMaxReplayAttempts,
      graft.model.Defaults.DlqReplayBatchSize).collect()
    val (ok, bad) = due.partition(r =>
      attempt(r.getAs[String]("source_key"), r.getAs[String]("data")))
    if (ok.nonEmpty) store.deleteDeadLetters(ok.map(_.getAs[Long]("id")).toSeq)
    if (bad.nonEmpty) {
      val badIds = bad.map(_.getAs[Long]("id")).toSeq
      val updated = Dlq.retryState(
        store.deadLetters.filter(col("id").isin(badIds: _*)),
        lit(nowUtc), config.deadLetterReplayBackoffSeconds)
        .drop("backoff_seconds")
      store.updateDeadLetters(updated)
    }
    (ok.length.toLong, bad.length.toLong)
  }
}

object ChangeRelay {

  /** Everything the executor-side export closure needs, captured by VALUE —
    * never the relay instance (it holds the SparkSession and state store). */
  final case class ExportPlan(
      environment: String,
      objectName: String,
      database: String,
      nowUtc: String,
      totalBatches: Int,
      fileSinkTemplate: Option[String],
      endpoints: Seq[graft.model.SinkEndpoint],
      maxPayloadSizeBytes: Long,
      performHttp: Boolean = false,
      performAmqp: Boolean = false)

  /** Fan one partition of `(g, envelope_json)` rows out to every configured
    * sink, executor-side. Emits only the failures as (error, payload) — the
    * at-least-once contract (T2) means a retried task may re-invoke sinks,
    * exactly like the reference's retry loop; dedup happens at the DLQ (D1)
    * and at idempotent consumers, never by suppressing the send. */
  private[streaming] def exportPartition(
      plan: ExportPlan,
      it: Iterator[(String, String)],
      executorEnvelopes: org.apache.spark.util.LongAccumulator): Iterator[(String, String)] =
    it.flatMap { case (g, json) =>
      if (org.apache.spark.TaskContext.get() != null) executorEnvelopes.add(1)
      val batchNo = g.substring(g.lastIndexOf('#') + 1).toInt
      val meta = ExportMeta(plan.environment, plan.objectName, plan.database,
        plan.nowUtc, batchNo, plan.totalBatches)
      val fileFailures = plan.fileSinkTemplate.toSeq.flatMap { tpl =>
        Sinks.writeFile(json, tpl, meta).left.toSeq.map(f => (f.error, json))
      }
      // EVERY configured endpoint participates in the fan-out — a skipped
      // kind would lose its rows silently (the watermark still advances;
      // only dead-lettered failures are re-driven).
      val endpointFailures = plan.endpoints.flatMap { ep =>
        val result = ep.kind match {
          case "http" =>
            Sinks.prepareHttp(json, ep.target, meta, ep.headers,
              ep.enableCompression, plan.maxPayloadSizeBytes)
              .flatMap(r =>
                if (plan.performHttp) Sinks.httpPost(r).map(_ => ())
                else Right(()))
          case "rabbitmq" if plan.performAmqp =>
            // REAL wire delivery (r19, the performHttp precedent): guards
            // first (required fields, caps), then the AMQP 0-9-1 publish —
            // target "amqp://host:port/exchange", routing key = the object
            // name, correlation id = the batch group (replayable).
            Sinks.prepareBrokerMessage("rabbitmq", json, ep.headers).flatMap { body =>
              // parse defensively: a missing port or non-numeric port is a
              // CONFIG error and must dead-letter like the missing-slash
              // case below — a MatchError/NumberFormatException here would
              // escape the Either channel and fail the whole task (r19
              // advice)
              ep.target.stripPrefix("amqp://").split("/", 2) match {
                case Array(hostPort, exchange) =>
                  hostPort.split(":", 2) match {
                    case Array(h, p) if h.nonEmpty =>
                      p.toIntOption.filter(n => n > 0 && n <= 65535) match {
                        case Some(port) =>
                          Amqp.publish(h, port, exchange,
                            routingKey = s"${plan.database}.${plan.objectName}",
                            body = body, correlationId = g,
                            headers = ep.headers).map(_ => ())
                        case None =>
                          Left(ExportFailure(ep.key, s"bad amqp target '${ep.target}'"))
                      }
                    case _ =>
                      Left(ExportFailure(ep.key, s"bad amqp target '${ep.target}'"))
                  }
                case _ =>
                  Left(ExportFailure(ep.key, s"bad amqp target '${ep.target}'"))
              }
            }
          case broker =>
            Sinks.prepareBrokerMessage(broker, json, ep.headers).map(_ => ())
        }
        result.left.toSeq.map(f => (f.error, json))
      }
      fileFailures ++ endpointFailures
    }

  /** Default horizon: one past the max committed xact — everything visible
    * commits; the gate only matters when the caller passes the true
    * in-flight horizon (tests do). */
  def defaultHorizon(changes: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    changes.agg(coalesce(max("xact_id") + 1, lit(Long.MaxValue)))
      .collect()(0).getLong(0)
  }

  /** T1/T6 — the Structured-Streaming wrapper: watch an outbox directory as
    * a file stream and run the relay per micro-batch at the configured
    * cadence. One StreamingQuery per (environment, object), named for
    * uniqueness (never two pollers for the same tracked object — the
    * reference's stress invariant). Callers MUST pass a distinct
    * `checkpointDir` per (environment, object) to match: two queries
    * sharing a checkpoint corrupt each other's offset log. */
  /** checkpointDir → queryName for live queries; guards against two
    * different queries sharing one offset log. Entries for stopped queries
    * are purged lazily on the next start. */
  private val activeCheckpoints = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def streamFromOutboxDir(
      spark: SparkSession,
      relay: ChangeRelay,
      obj: TrackingObject,
      outboxDir: String,
      schema: org.apache.spark.sql.types.StructType,
      checkpointDir: String,
      envName: String,
      intervalSeconds: Int = graft.model.Defaults.PollingIntervalSeconds): StreamingQuery =
    claimAndStart(spark, checkpointDir, s"graft-relay-$envName-${obj.name}") {
      queryName =>
        startQuery(spark.readStream.schema(schema).parquet(outboxDir),
          relay, obj, checkpointDir, queryName, intervalSeconds)
    }

  /** S1 (DSv2 flavor) wired into the relay: the same per-micro-batch cycle,
    * but the change feed is the `graft-change` MicroBatchStream — the
    * ENGINE owns (version, horizon) offsets in the query checkpoint and
    * decides what each batch contains, and the relay's own store watermark
    * advances in lock-step (a batch carries only fresh gated rows, so the
    * relay's P1 re-filter passes them all and its A2 advance lands on the
    * same frontier — the two trackers cannot diverge). Recovery is Spark's
    * WAL: a restart on the same checkpoint replays no committed version. */
  def streamFromChangeSource(
      spark: SparkSession,
      relay: ChangeRelay,
      obj: TrackingObject,
      sourceOptions: Map[String, String],
      checkpointDir: String,
      envName: String,
      intervalSeconds: Int = graft.model.Defaults.PollingIntervalSeconds,
      adapt: DataFrame => DataFrame = identity): StreamingQuery =
    claimAndStart(spark, checkpointDir, s"graft-relay-$envName-${obj.name}") {
      queryName =>
        // `adapt` bridges the wire table's shape to the relay contract —
        // a JDBC change table stores the $changed mask as a delimited
        // VARCHAR (Envelope.encode needs array<string>) and may name the
        // version/xact columns differently; the adapter is part of the
        // object's deployment config, applied per micro-batch.
        startQuery(
          adapt(spark.readStream.format("graft-change").options(sourceOptions).load()),
          relay, obj, checkpointDir, queryName, intervalSeconds)
    }

  /** Purge + claim + START under one lock: without it, a concurrent
    * caller's purge can evict a claim whose query has not yet reached
    * spark.streams.active, letting two queries share one offset log —
    * exactly the corruption this guard exists to prevent. */
  private def claimAndStart(spark: SparkSession, checkpointDir: String,
      queryName: String)(start: String => StreamingQuery): StreamingQuery =
    activeCheckpoints.synchronized {
      val activeNames = spark.streams.active.map(_.name).toSet
      activeCheckpoints.entrySet().removeIf(e => !activeNames.contains(e.getValue))
      val prev = activeCheckpoints.putIfAbsent(checkpointDir, queryName)
      require(prev == null || prev == queryName,
        s"checkpointLocation '$checkpointDir' is already used by active query '$prev' — " +
          "each (environment, object) stream needs its own checkpoint dir")
      try start(queryName)
      catch { case e: Throwable =>
        // Roll back only a claim THIS call inserted (prev == null). When
        // prev == queryName the claim belongs to a still-live query —
        // startQuery then throws "name already active", and evicting the
        // live claim here would let a later (env, object) with the same
        // checkpointDir pass the guard and corrupt the running offset log.
        if (prev == null) activeCheckpoints.remove(checkpointDir, queryName)
        throw e }
    }

  /** T5 streaming flavor — the dead-letter replay loop as a Structured
    * Streaming query: a rate source is the timer (the Spark-idiomatic
    * analog of the reference's delay-loop background service,
    * `DeadLetterReplayService.cs:42-60`), and each trigger runs one
    * [[ChangeRelay.replayCycle]] — due batch, attempt, delete on success /
    * widen backoff on failure. `attempt` is injectable exactly as in the
    * batch flavor, so endpoint recovery is testable. The replay cadence is
    * independent of the change-relay cadence, matching the reference's
    * separate hosted service. */
  def streamReplay(
      spark: SparkSession,
      relay: ChangeRelay,
      attempt: String => Boolean,
      intervalSeconds: Int,
      queryName: String): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .foreachBatch { (_: DataFrame, _: Long) =>
        relay.replayCycle(attempt,
          new java.sql.Timestamp(System.currentTimeMillis()))
        ()
      }
      .start()

  private def startQuery(
      reader: DataFrame,
      relay: ChangeRelay,
      obj: TrackingObject,
      checkpointDir: String,
      queryName: String,
      intervalSeconds: Int): StreamingQuery = {
    reader
      .writeStream
      // Named per (environment, object): the uniqueness invariant is one
      // poller per tracked object — env-only naming would make an
      // environment's SECOND object fail to start ("query with that name
      // is already active").
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        relay.runCycle(obj, batch,
          java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
            .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)))
        ()
      }
      .start()
  }
}
