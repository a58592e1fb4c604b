import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Same-run profiling of repetition-signal shapes at ScaleSmoke scale —
  * isolates which term of the map-only projection dominates, and A/Bs the
  * map-only form against the former grouped (explode+shuffle) form.
  * Temporary measurement harness; results land in BENCHNOTES.md. */
object RepProfile {
  def main(args: Array[String]): Unit = {
    val docCopies = sys.env.getOrElse("SCALE_DOC_COPIES", "20").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val copies = spark.range(docCopies).withColumnRenamed("id", "copy")
    val docs = docs0.crossJoin(copies)
      .select((col("doc_id") + col("copy") * 10000000L).as("doc_id"),
        when(col("copy") < 2, col("text"))
          .otherwise(array_join(transform(split(col("text"), " "),
            t => concat(lit("c"), col("copy"), t)), " ")).as("text"))
    docs.cache(); val n = docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rep] $name%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s  ($r rows over $n docs)")
    }
    def base: DataFrame = {
      val based = TextOps.withNormToks(docs, "text")
      val toksGuarded = when(length(col("_norm")) === 0,
        array().cast("array<string>")).otherwise(col("_toks"))
      val nToks = when(length(col("_norm")) === 0, 0L)
        .otherwise(size(col("_toks")).cast("long"))
      based.select(col("doc_id"), nToks.as("n_tokens"), toksGuarded.as("_t"))
    }
    def grams(nn: Int): Column =
      when(size(col("_t")) >= nn,
        transform(sequence(lit(1), size(col("_t")) - (nn - 1)),
          i => concat_ws(" ", slice(col("_t"), i, lit(nn)))))
        .otherwise(array().cast("array<string>"))
    val maxRun = aggregate(col("_bi"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val full = () => TextOps.repetitionSignals(docs, "doc_id", "text")
      .filter(col("dup_token_ppm") + col("top_bigram_ppm") + col("dup_trigram_ppm") >= 0)
      .count()
    // term isolation: each forces exactly one signal's machinery
    val tokenize = () => base.filter(col("n_tokens") >= 0).count()
    val distinctOnly = () => base
      .select(col("doc_id"), size(array_distinct(col("_t"))).as("d"))
      .filter(col("d") >= 0).count()
    val biBuild = () => base
      .select(col("doc_id"), size(grams(2)).as("d"))
      .filter(col("d") >= 0).count()
    val biSort = () => base
      .select(col("doc_id"), size(array_sort(grams(2))).as("d"))
      .filter(col("d") >= 0).count()
    val biRun = () => base
      .select(col("doc_id"), array_sort(grams(2)).as("_bi"))
      .select(col("doc_id"), maxRun.as("d"))
      .filter(col("d") >= 0).count()
    val triDistinct = () => base
      .select(col("doc_id"), grams(3).as("_tri"))
      .select(col("doc_id"), (size(col("_tri")) - size(array_distinct(col("_tri")))).as("d"))
      .filter(col("d") >= 0).count()
    // the former grouped shape (pre-round-9), verbatim semantics
    val grouped = () => {
      val based = TextOps.withNormToks(docs, "text")
      val toksGuarded = when(length(col("_norm")) === 0,
        array().cast("array<string>")).otherwise(col("_toks"))
      def gramsK(nn: Int, kind: Int): Column = {
        val idx = when(size(col("_t")) >= nn,
          sequence(lit(1), size(col("_t")) - (nn - 1)))
          .otherwise(array().cast("array<int>"))
        transform(idx, i => struct(lit(kind).as("kind"),
          concat_ws(" ", slice(col("_t"), i, lit(nn))).as("gram")))
      }
      val nToks = when(length(col("_norm")) === 0, 0L)
        .otherwise(size(col("_toks")).cast("long"))
      val tagged = based
        .select(col("doc_id"), nToks.as("n_tokens"), toksGuarded.as("_t"))
        .select(col("doc_id"), col("n_tokens"),
          explode_outer(concat(gramsK(1, 1), gramsK(2, 2), gramsK(3, 3))).as("_g"))
      val counts = tagged
        .groupBy(col("doc_id"), col("_g.kind").as("kind"), col("_g.gram").as("gram"))
        .agg(first(col("n_tokens")).as("n_tokens"), count(lit(1)).as("c"))
      counts.groupBy(col("doc_id"))
        .agg(first(col("n_tokens")).as("n_tokens"),
          sum(when(col("kind") === 1, lit(1)).otherwise(lit(0))).as("_distinct"),
          max(when(col("kind") === 2, col("c"))).as("_maxbi"),
          sum(when(col("kind") === 3, col("c") - 1)).as("_trirep"))
        .select(col("doc_id"),
          when(col("n_tokens") > 0,
            expr("(n_tokens - _distinct) * 1000000 div n_tokens"))
            .otherwise(0L).as("a"),
          when(col("_maxbi").isNotNull, expr("_maxbi * 2000000 div n_tokens"))
            .otherwise(0L).as("b"),
          when(col("_trirep").isNotNull, expr("_trirep * 3000000 div n_tokens"))
            .otherwise(0L).as("c"))
        .filter(col("a") + col("b") + col("c") >= 0).count()
    }
    val stages: Seq[(String, () => Long)] = Seq(
      "tokenize only" -> tokenize, "distinct tokens" -> distinctOnly,
      "bigram build" -> biBuild, "bigram build+sort" -> biSort,
      "bigram sort+runlen" -> biRun, "trigram distinct-diff" -> triDistinct,
      "full map-only" -> full, "grouped (old)" -> grouped,
      "full map-only #2" -> full, "grouped (old) #2" -> grouped)
    val order = sys.env.get("REP_ORDER")
    val run = if (order.contains("old_first"))
      stages.sortBy { case (k, _) => if (k.startsWith("grouped")) 0 else 1 }
    else stages
    run.foreach { case (k, f) => t(k)(f()) }
    spark.stop()
  }
}
