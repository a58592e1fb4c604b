package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** The horizon-gate invariant (SURVEY §7.4 hard part #2): when rows commit
  * out of order (a lower id becomes visible AFTER a higher id), reading
  * `id > watermark AND xact < horizon` with the watermark computed through
  * the SAME gate must deliver every row exactly once, in any number of
  * cycles — the property the reference's procedure encodes
  * (02-stored-procedure.postgres.table.sql:21-31, stored-procedure.md:243).
  *
  * Randomized simulation, fixed seed: ids are assigned in one order,
  * commit (xact) order is an independent shuffle; each cycle advances the
  * horizon by a random amount and reads incrementally.
  */
class WatermarkInvariantSpec extends SparkSpec {
  import spark.implicits._

  test("gated incremental reads deliver every row exactly once under out-of-order commits") {
    val rnd = new Random(42)
    (1 to 5).foreach { trial =>
      val n = 200
      // Transaction i inserts its outbox row at start (id order = xact
      // order, as a trigger-fed outbox produces) but transactions COMMIT in
      // a random order — long transactions overlap many later ones.
      val commitOrder = rnd.shuffle((1 to n).toVector)
      val commitTime = Array.ofDim[Int](n + 1)
      commitOrder.zipWithIndex.foreach { case (tx, t) => commitTime(tx) = t }
      val outbox = (1 to n).map(i => (i.toLong, i.toLong, commitTime(i))).toDF("id", "xact_id", "ct")

      var watermark = 0L
      val delivered = scala.collection.mutable.ArrayBuffer[Long]()
      var t = 0
      while (t <= n) {
        t += 1 + rnd.nextInt(40) // polls are less frequent than commits
        val clock = math.min(t, n)
        // Visible = committed; horizon = oldest still-open transaction
        // (pg_snapshot_xmin analog).
        val visible = outbox.filter(col("ct") < clock).drop("ct")
        val horizon = (1 to n).find(commitTime(_) >= clock).map(_.toLong).getOrElse(n + 1L)
        val batch = Incremental.incrementalRead(visible, watermark, horizon)
          .select("id").as[Long].collect()
        val newWm = Incremental.gatedWatermark(visible, watermark, horizon).as[Long].head()
        delivered ++= batch
        assert(newWm >= watermark, s"trial $trial: watermark regressed")
        watermark = newWm
      }
      assert(delivered.sorted == (1 to n).map(_.toLong),
        s"trial $trial: delivered ${delivered.size} rows, expected exactly 1..$n once each")
    }
  }

  test("WITHOUT the gate, out-of-order commits lose rows (why the gate exists)") {
    // Control experiment: watermark = max(visible id) ignoring the horizon
    // on the watermark side. A later-committing lower id is skipped.
    val outbox = Seq((1L, 10L), (2L, 5L), (3L, 20L)).toDF("id", "xact_id")
    // Cycle 1: only xact<15 visible => rows 1,2 visible; UNGATED watermark
    // takes max over ALL ids it can see in the table (3, committed later).
    val ungatedWm = outbox.agg(max("id")).as[Long].head() // = 3
    // Cycle 2: row 3's xact commits; read id > 3 => row 3 never delivered...
    val lost = Incremental.incrementalRead(outbox, ungatedWm, 100L).count()
    assert(lost == 0) // ...which is exactly the failure the gate prevents:
    val gatedWm = Incremental.gatedWatermark(outbox, 0L, 15L).as[Long].head()
    assert(gatedWm == 2L) // gate holds the watermark at the delivered frontier
    val next = Incremental.incrementalRead(outbox, gatedWm, 100L)
      .select("id").as[Long].collect()
    assert(next.toSeq == Seq(3L)) // late committer arrives next cycle
  }
}
