package graft.sources

import graft.SparkSpec
import JdbcChangeSource._

class JdbcChangeSpec extends SparkSpec {

  private val cfg = JdbcSourceConfig(
    url = "jdbc:postgresql://db:5432/app",
    driver = "org.postgresql.Driver",
    user = "u", password = "p", table = "outbox")

  test("pushdown subquery carries both the version and horizon predicates db-side") {
    val q = pushdownQuery(cfg, fromVersion = 100L, horizon = 250L)
    assert(q == "(SELECT * FROM outbox WHERE id > 100 AND xact_id < 250) AS delta")
  }

  test("options: range-partitioned parallel read between watermark and frontier") {
    val o = options(cfg, "postgresql", fromVersion = 100L, horizon = 250L,
      upperBound = 240L)
    assert(o("partitionColumn") == "id")
    assert(o("lowerBound") == "100" && o("upperBound") == "240")
    assert(o("numPartitions") == "8" && o("fetchsize") == "10000")
    assert(o("dbtable").startsWith("(SELECT"))
    assert(o("queryTimeout") == "300")
    assert(!o.contains("sessionInitStatement"), "postgres needs no TEXTSIZE init")
  }

  test("mssql gets the reference's TEXTSIZE session init; empty delta keeps bounds legal") {
    val o = options(cfg, "sqlserver", fromVersion = 500L, horizon = 500L,
      upperBound = 500L)
    assert(o("sessionInitStatement") == "SET TEXTSIZE 2147483647")
    assert(o("lowerBound").toLong < o("upperBound").toLong,
      "JDBC requires lowerBound < upperBound even when no new rows exist")
  }

  test("reader assembles lazily without a live database") {
    // format("jdbc").options(...).load() must not connect until an action
    val e = intercept[Exception] {
      read(spark, cfg, "postgres", 0L, 10L, 10L).count()
    }
    assert(e != null, "a connection attempt (and only that) fails offline")
  }
}
