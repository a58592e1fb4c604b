package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins [[Tables.events]] against BOTH parquet timestamp encodings the
  * driver has shipped for `events.ts` across testdata generations
  * (TIMESTAMP(NANOS) through round 7, TIMESTAMP(MICROS) from round 8's
  * regeneration). The fixtures are tiny checked-in parquet files with
  * identical values in each encoding, so a future regeneration that flips
  * the encoding again fails HERE with a one-line diagnosis instead of as
  * 50+ cascading analysis errors across the registry.
  */
class EventsSchemaSpec extends SparkSpec {

  private def flavorDir(flavor: String): String =
    getClass.getResource(s"/events_flavors/$flavor").getPath

  test("micros-encoded events (TIMESTAMP_NTZ footer) normalize to TimestampType") {
    val raw = spark.read.parquet(flavorDir("micros") + "/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"fixture expectation drifted: micros footer read as ${raw.schema("ts").dataType}")
    val adapted = Tables.events(spark, flavorDir("micros"))
    assert(adapted.schema("ts").dataType == TimestampType)
    assert(adapted.count() == 20)
  }

  test("nanos-encoded events read via the legacy retry path, values equal the micros flavor") {
    val nanos  = Tables.events(spark, flavorDir("nanos"))
    val micros = Tables.events(spark, flavorDir("micros"))
    assert(nanos.schema("ts").dataType == TimestampType)
    // The fixture values are µs-precision, so the ns→µs truncation is exact
    // and both flavors must collect identical (event_id, ts) sets.
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(pairs(nanos) == pairs(micros))
  }

  test("the deployed testdata encoding is one the reader handles") {
    val sfDir = "/root/testdata/sf0.001"
    val footer =
      try spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType.toString
      catch { case e: Throwable => s"<unreadable without legacy conf: ${e.getMessage.take(120)}>" }
    val adapted = Tables.events(spark, sfDir)
    assert(adapted.schema("ts").dataType == TimestampType,
      s"Tables.events produced ${adapted.schema("ts").dataType} for raw footer type $footer — " +
        "the driver regenerated testdata with an encoding the reader does not normalize")
    assert(adapted.count() > 0)
  }
}
