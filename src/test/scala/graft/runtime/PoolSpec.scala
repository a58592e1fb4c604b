package graft.runtime

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

class PoolSpec extends SparkSpec {
  import spark.implicits._

  test("D2: single-flight — concurrent first use builds the resource exactly once") {
    val builds = new AtomicInteger(0)
    val pool = new KeyedPool[String](k => { builds.incrementAndGet(); s"conn-$k" })
    val latch = new CountDownLatch(1)
    val exec = Executors.newFixedThreadPool(8)
    val results = (1 to 8).map { _ =>
      exec.submit(new java.util.concurrent.Callable[String] {
        def call(): String = { latch.await(); pool.get("host:5672:/") }
      })
    }
    latch.countDown()
    val got = results.map(_.get(5, TimeUnit.SECONDS))
    exec.shutdown()
    assert(got.toSet == Set("conn-host:5672:/"))
    assert(builds.get() == 1)
  }

  test("D2: evict during an in-flight build closes exactly one copy and get() returns a live one") {
    val closed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val builds = new AtomicInteger(0)
    val buildStarted = new CountDownLatch(1)
    val finishBuild = new CountDownLatch(1)
    val pool = new KeyedPool[String](
      k => {
        val n = builds.incrementAndGet()
        if (n == 1) { buildStarted.countDown(); finishBuild.await() }
        s"c-$k-$n"
      },
      v => closed.add(v))
    val exec = Executors.newFixedThreadPool(2)
    val builder = exec.submit(new java.util.concurrent.Callable[String] {
      def call(): String = pool.get("k")
    })
    buildStarted.await() // builder is inside build()
    val evictor = exec.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = pool.evict("k") // must wait for the build, then close
    })
    // Release the build only once the evictor has removed the cell (it then
    // blocks on the cell monitor) — otherwise the builder can win the
    // membership re-check before the evictor even runs.
    while (pool.contains("k")) Thread.sleep(1)
    finishBuild.countDown()
    // The evicted first build is closed exactly once (by whichever of
    // evict()/get() loses the race), and get() retries through a fresh
    // cell — never returning an unreachable/closed resource.
    assert(builder.get(5, TimeUnit.SECONDS) == "c-k-2")
    evictor.get(5, TimeUnit.SECONDS)
    exec.shutdown()
    assert(closed.toArray.toSeq == Seq("c-k-1"), "evicted in-flight build must be closed exactly once")
    assert(pool.contains("k"), "the retried build stays pooled (reachable by later evict/closeAll)")
    pool.closeAll()
    assert(closed.toArray.toSeq == Seq("c-k-1", "c-k-2"))
  }

  test("D2: eviction closes and allows rebuild; closeAll drains") {
    val closed = scala.collection.mutable.ArrayBuffer[String]()
    val pool = new KeyedPool[String](k => s"c-$k", v => closed += v)
    pool.get("a"); pool.get("b")
    assert(pool.size == 2)
    pool.evict("a")
    assert(closed.toSeq == Seq("c-a") && !pool.contains("a"))
    pool.get("a") // rebuilds
    pool.closeAll()
    assert(pool.size == 0 && closed.size == 3)
  }

  test("health tracker counts consecutive failures and resets on success") {
    var healthy = false
    val t = new HealthTracker(_ => healthy)
    t.sweep(Seq("db0")); t.sweep(Seq("db0"))
    assert(t.consecutiveFailures("db0") == 2 && !t.isHealthy("db0"))
    healthy = true
    t.sweep(Seq("db0"))
    assert(t.consecutiveFailures("db0") == 0 && t.isHealthy("db0"))
  }

  test("scorePairsExact matches in-row quantized dot products") {
    val vecs = Seq(
      (0L, Array(0.5f, -1.0f, 2.0f)),
      (1L, Array(1.0f, 0.25f, -0.5f)),
      (2L, Array(-2.0f, 0.0f, 1.5f))
    ).toDF("vec_id", "embedding")
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("id_a", "id_b")
    val exact = Similarity.scorePairsExact(pairs, vecs)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect()
    // in-row scoring for comparison
    val q = vecs.select($"vec_id", Similarity.quantize($"embedding").as("qv"))
    val inRow = pairs
      .join(q.select($"vec_id".as("id_a"), $"qv".as("qa")), Seq("id_a"))
      .join(q.select($"vec_id".as("id_b"), $"qv".as("qb")), Seq("id_b"))
      .select($"id_a", $"id_b", Similarity.qdot($"qa", $"qb").as("score"))
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect()
    assert(exact.toSeq == inRow.toSeq)
    assert(exact.head == ((0L, 1L, (500L * 1000 + -1000L * 250 + 2000L * -500))))
  }
}
