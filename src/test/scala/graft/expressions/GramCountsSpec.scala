package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the gram_counts kernel against the built-in explode/groupBy
  * formulation — within-doc counts, adjacency, the empty/null-token
  * contract, and mode disjointness. */
class GramCountsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat the cat"),
    (2L, "a a a"),
    (3L, "single"),
    (4L, ""), // tokens_norm yields [""] — must map to an empty result
    (5L, "x y x y x")
  ).toDF("id", "text")

  private def toksed = docs.select(col("id"),
    graft.ops.TextOps.tokens(col("text")).as("_toks"))

  test("mode 1 matches the explode/groupBy unigram counts per doc") {
    val kernel = toksed
      .select(col("id"), explode(graft.ops.TextOps.gramCounts(col("_toks"), 1)).as("g"))
      .select(col("id"), col("g.s").as("s"), col("g.c").as("c"))
    val ref = toksed
      .select(col("id"), explode(col("_toks")).as("s"))
      .filter(length(col("s")) > 0)
      .groupBy(col("id"), col("s")).agg(count(lit(1)).as("c"))
    assert(kernel.except(ref).count() === 0)
    assert(ref.except(kernel).count() === 0)
  }

  test("mode 2 matches the index-explode bigram counts per doc") {
    val kernel = toksed
      .select(col("id"), explode(graft.ops.TextOps.gramCounts(col("_toks"), 2)).as("g"))
      .select(col("id"), col("g.s").as("s"), col("g.c").as("c"))
    val ref = toksed
      .filter(size(col("_toks")) >= 2)
      .select(col("id"), col("_toks"),
        explode(sequence(lit(0), size(col("_toks")) - 2)).as("_i"))
      .select(col("id"), concat_ws(" ",
        expr("element_at(_toks, _i + 1)"),
        expr("element_at(_toks, _i + 2)")).as("s"))
      .groupBy(col("id"), col("s")).agg(count(lit(1)).as("c"))
    assert(kernel.except(ref).count() === 0)
    assert(ref.except(kernel).count() === 0)
  }

  test("mode 3 is the disjoint union of modes 1 and 2 (space splits them)") {
    val both = toksed
      .select(col("id"), explode(graft.ops.TextOps.gramCounts(col("_toks"), 3)).as("g"))
      .select(col("id"), col("g.s").as("s"), col("g.c").as("c"))
    val uni = both.filter(!col("s").contains(" "))
    val bi = both.filter(col("s").contains(" "))
    val uniRef = toksed
      .select(col("id"), explode(graft.ops.TextOps.gramCounts(col("_toks"), 1)).as("g"))
      .select(col("id"), col("g.s").as("s"), col("g.c").as("c"))
    val biRef = toksed
      .select(col("id"), explode(graft.ops.TextOps.gramCounts(col("_toks"), 2)).as("g"))
      .select(col("id"), col("g.s").as("s"), col("g.c").as("c"))
    assert(uni.except(uniRef).count() === 0 && uniRef.except(uni).count() === 0)
    assert(bi.except(biRef).count() === 0 && biRef.except(bi).count() === 0)
  }

  test("empty document yields an empty array; null tokens are skipped") {
    val emptyRows = docs.filter(col("id") === 4L)
      .select(size(graft.ops.TextOps.gramCounts(
        graft.ops.TextOps.tokens(col("text")), 3)).as("n"))
      .collect()
    assert(emptyRows.map(_.getInt(0)).toSeq === Seq(0))
    // null elements: skipped for unigrams, break bigram adjacency
    val arr = Seq((1L, Seq[String]("a", null, "b", "b"))).toDF("id", "toks")
    val out = arr
      .select(explode(graft.ops.TextOps.gramCounts(col("toks"), 3)).as("g"))
      .select(col("g.s"), col("g.c")).as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 1L, "b" -> 2L, "b b" -> 1L))
  }

  test("gram_counts resolves from SQL with arity enforcement") {
    val viaSql = docs.selectExpr(
      "explode(gram_counts(tokens_norm(text), 1)) AS g")
      .select(col("g.s")).count()
    assert(viaSql > 0)
    val err = intercept[Exception] {
      docs.selectExpr("gram_counts(tokens_norm(text), 1, 2)").collect()
    }
    assert(err.getMessage.contains("gram_counts"))
  }
}
