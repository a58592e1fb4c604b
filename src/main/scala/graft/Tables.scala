package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * only these tables, so the DuckDB oracle (which registers the same parquet
  * files under the same names) sees identical inputs at every scale factor.
  */
object Tables {
  /** Catalog cache: `spark.read.parquet` pays file listing + footer schema
    * inference (~50-150 ms) on EVERY call, and the registry's 112 queries
    * each re-read the same ten immutable driver-provided tables — ~15 s of
    * repeated metadata work per bench run. Real engines cache catalog
    * metadata; so does this one. The testdata contract (TESTDATA.md) is
    * immutable inputs, so no invalidation path is needed; a hypothetical
    * mutable source would go through `spark.catalog.refreshByPath` instead
    * of this reader. Keyed per session (plans are session-bound); DataFrames
    * are immutable so sharing one across queries is sound, and identical
    * leaf relations also raise codegen-cache hits across queries. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Evict cache entries owned by stopped sessions — long-lived JVMs that
    * create many sessions (sbt test runs) would otherwise retain every dead
    * session's plans forever. A weak-keyed map cannot fix this: the cached
    * DataFrame strongly references its session, so the value pins the key.
    * The sweep is O(entries) over sessions × tables — trivially small. */
  private[graft] def sweepStopped[K](
      m: java.util.concurrent.ConcurrentHashMap[K, DataFrame],
      sessionOf: K => SparkSession): Unit = {
    val it = m.keySet.iterator()
    while (it.hasNext) if (sessionOf(it.next()).sparkContext.isStopped) it.remove()
  }

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    sweepStopped(cache, (_: (SparkSession, String))._1)
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, path) => s.read.parquet(path) })
  }

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp. Read nanos as long (legacy conf) and truncate to
    * microseconds with integer arithmetic (ns values exceed double's exact
    * range, so no float division) — the same truncation DuckDB applies, so
    * oracle comparisons agree.
    *
    * NOTE: the legacy conf is a SESSION-WIDE invariant once set (it is
    * captured by scan relations at planning, so it cannot be safely
    * set/restored around one read) — any later nanos-timestamp parquet in
    * the same session will also read as long, deliberately. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
