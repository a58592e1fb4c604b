package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, mirroring how ANN is actually deployed on Spark:
  *  - [[bruteForceTopK]] — exact scan; the baseline and the per-bucket inner
  *    loop. The cross join is bounded: |queries| × |corpus|, with the query
  *    side broadcast, so the corpus is streamed once, never shuffled.
  *  - [[lshTopK]] — random-hyperplane LSH: corpus and queries bucketed by
  *    sign bits, candidates meet only within a bucket. At 100 TB the bucket
  *    key is the shuffle/partition key and each bucket is a small fraction
  *    of the corpus; recall is tuned by the number of hyperplanes.
  *
  * Scores are computed on quantized vectors (`round(x*1000)` per element,
  * int64 dot product) — deterministic to the bit in any engine, which makes
  * top-k rankings oracle-checkable; cosine on raw floats is also provided
  * for production use where cross-engine hashing is not needed.
  */
object Similarity {

  /** Quantize an embedding to int64 milli-units. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x * 1000).cast("long"))

  /** Integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Integer squared-L2 distance of two quantized vectors. */
  def qdist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

  /** Float cosine similarity (production scoring). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Quantized elements as rows: (vec_id, _i, _q) — the layout for
    * codegen-path scoring at corpus scale. */
  def elementRows(df: DataFrame): DataFrame =
    df.repartition(col("vec_id"))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("_i", "_x")))
      .select(col("vec_id"), col("_i"),
        round(col("_x").cast("double") * 1000).cast("long").as("_q"))

  /** Exact dot products for an arbitrary candidate-pair set, computed
    * matrix-multiply-style: pairs join the element table per side and
    * reduce with one hash aggregation — every operator whole-stage codegen.
    *
    * This is the shape for LARGE candidate sets (the in-row
    * `zip_with`+`aggregate` scoring runs interpreted at ~µs/element, which
    * is fine for thousands of pairs and fatal for billions); the cost here
    * is two shuffles of |pairs|×dim element rows, which scales out
    * horizontally. */
  def scorePairsExact(pairs: DataFrame, corpus: DataFrame): DataFrame = {
    val e = elementRows(corpus)
    pairs
      .join(e.select(col("vec_id").as("id_a"), col("_i"), col("_q").as("_qa")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("_i"), col("_q").as("_qb")), Seq("id_b", "_i"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("_qa") * col("_qb")).as("score"))
  }

  /** Exact top-k neighbours per query by quantized dot product.
    * `queries` is expected small (it is broadcast); ties break on vec_id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), quantize(col("embedding")).as("qv")))
    val c = corpus.select(col("vec_id"), quantize(col("embedding")).as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("score", qdot(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
  }

  /** Deterministic pseudo-random hyperplanes: element i of plane j is
    * `((i*31 + j*17) mod 101) - 50` — small ints, identical in any engine.
    * The modulus must dwarf the plane count: with a small modulus m the
    * family is periodic in j with period m/gcd(17,m), so distinct j values
    * can alias to the SAME hyperplane and extra planes/bands add no
    * discrimination (the original mod-7 family made every 8-plane band
    * identical). 101 is prime and > any plane count used here, so all
    * planes are distinct. */
  def hyperplane(j: Int, dim: Int): Column =
    array((0 until dim).map(i => lit(((i * 31 + j * 17) % 101 - 50).toLong)): _*)

  /** LSH bucket key: sign bits of the dot products with `planes`
    * hyperplanes (per-row HOF form; [[lshBucketOf]] is the codegen form
    * used on large corpora). */
  def lshKey(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes)
      .map(j => when(qdot(quantize(vec), hyperplane(j, dim)) >= 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)

  /** (vec_id, bucket) computed on the codegen path: elements exploded once,
    * all plane dot products as conditional SUMs in one map-side-combined
    * groupBy — the per-row HOF form evaluates `planes × dim` interpreted
    * lambdas per vector, which dominates at corpus scale. */
  def lshBucketOf(df: DataFrame, planes: Int): DataFrame = {
    val el = df.repartition(col("vec_id"))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("_i", "_x")))
      .select(col("vec_id"), col("_i"),
        round(col("_x").cast("double") * 1000).cast("long").as("_q"))
    val sums = (0 until planes).map { j =>
      sum(col("_q") * (((col("_i") * 31 + j * 17) % 101) - 50)).as(s"_d$j")
    }
    el.groupBy(col("vec_id")).agg(sums.head, sums.tail: _*)
      .select(col("vec_id"),
        (0 until planes).map(j => when(col(s"_d$j") >= 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("bucket"))
  }

  /** Embedding-cosine near-duplicate candidates: vectors sharing an LSH
    * bucket whose exact cosine clears `minCos`. The bucket key bounds the
    * self-join (Σ bucket² pairs, never all-pairs); `planes` trades recall
    * against bucket size — at 50k vectors, 12 planes keeps buckets ~12 wide.
    * Scoring is exact on the quantized vectors: `dot > minCos·√(|a|²·|b|²)`
    * in int64/IEEE arithmetic, so results are engine-portable. */
  def embeddingNearDup(corpus: DataFrame, minCos: Double,
                       planes: Int = 12, dim: Int = 64): DataFrame = {
    val keyed = corpus.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .join(lshBucketOf(corpus, planes), Seq("vec_id"))
      .withColumn("n2", qdot(col("qv"), col("qv")))
    val a = keyed.select(col("bucket"), col("vec_id").as("id_a"),
      col("qv").as("qa"), col("n2").as("na2"))
    val b = keyed.select(col("bucket"), col("vec_id").as("id_b"),
      col("qv").as("qb"), col("n2").as("nb2"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", qdot(col("qa"), col("qb")))
      .filter(col("score") > lit(minCos) * sqrt((col("na2") * col("nb2")).cast("double")))
      .withColumn("cos_milli",
        floor(col("score") * 1000 / sqrt((col("na2") * col("nb2")).cast("double"))).cast("long"))
      .select(col("id_a"), col("id_b"), col("score"), col("cos_milli"), col("bucket"))
  }

  /** (vec_id, band, bucket) for `bands` independent hyperplane sets, all
    * computed in ONE pass over the element rows (a single groupBy with
    * `bands × planesPerBand` conditional sums, then one explode) — banding
    * trades precision for recall exactly like MinHash-LSH banding: a pair
    * is a candidate if it collides in ANY band, so recall rises
    * exponentially with bands while each band's buckets stay selective. */
  def lshBandBuckets(df: DataFrame, bands: Int, planesPerBand: Int): DataFrame = {
    val el = df.repartition(col("vec_id"))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("_i", "_x")))
      .select(col("vec_id"), col("_i"),
        round(col("_x").cast("double") * 1000).cast("long").as("_q"))
    val total = bands * planesPerBand
    val sums = (0 until total).map { j =>
      sum(col("_q") * (((col("_i") * 31 + j * 17) % 101) - 50)).as(s"_d$j")
    }
    val bandBucket = (b: Int) =>
      (0 until planesPerBand)
        .map(j => when(col(s"_d${b * planesPerBand + j}") >= 0, lit(1L << j)).otherwise(0L))
        .reduce(_ + _)
    el.groupBy(col("vec_id")).agg(sums.head, sums.tail: _*)
      .select(col("vec_id"),
        posexplode(array((0 until bands).map(bandBucket): _*)).as(Seq("band", "bucket")))
  }

  /** Multi-band embedding near-dup: like [[embeddingNearDup]] but a pair
    * qualifies when it shares a bucket in ANY of `bands` plane sets —
    * distinct candidate pairs are scored exactly once. At corpus scale the
    * self-join is per (band, bucket), so the shuffle key stays selective
    * while banding recovers the near-neighbours a single plane set splits
    * apart (each extra band only adds |corpus| rows to the bucket join,
    * never all-pairs work). */
  def embeddingNearDupMultiband(corpus: DataFrame, minCos: Double,
                                bands: Int = 3, planesPerBand: Int = 8): DataFrame = {
    // Materialize the band/bucket keys once: the self-join below would
    // otherwise re-run the posexplode + bands×planes aggregate per side
    // (self-joins re-evaluate the shared subtree — see DedupOps scaladoc).
    val bb = lshBandBuckets(corpus, bands, planesPerBand).localCheckpoint(eager = false)
    val pairs = bb.select(col("band"), col("bucket"), col("vec_id").as("id_a"))
      .join(bb.select(col("band"), col("bucket"), col("vec_id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val keyed = corpus.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("n2", qdot(col("qv"), col("qv")))
    pairs
      .join(keyed.select(col("vec_id").as("id_a"), col("qv").as("qa"),
        col("n2").as("na2")), Seq("id_a"))
      .join(keyed.select(col("vec_id").as("id_b"), col("qv").as("qb"),
        col("n2").as("nb2")), Seq("id_b"))
      .withColumn("score", qdot(col("qa"), col("qb")))
      .filter(col("score") > lit(minCos) * sqrt((col("na2") * col("nb2")).cast("double")))
      .withColumn("cos_milli",
        floor(col("score") * 1000 / sqrt((col("na2") * col("nb2")).cast("double"))).cast("long"))
      .select(col("id_a"), col("id_b"), col("score"), col("cos_milli"))
  }

  /** IVF-style ANN: the corpus is partitioned into inverted lists by
    * nearest centroid (one broadcast of the K centroids, one map-side argmax
    * — no shuffle to assign), queries probe their `nprobe` nearest lists,
    * and only those lists are exactly re-ranked. The candidate join is a
    * hash join on the centroid id, so at 100 TB each query touches
    * `nprobe/K` of the corpus instead of all of it; K scales with corpus
    * size (√N is the usual rule) and the centroid table stays broadcastable.
    * Centroids here are the first `numCentroids` corpus vectors —
    * deterministic, so the ranking is oracle-checkable; production would
    * plug k-means centroids into the same plan. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numCentroids: Int = 8, nprobe: Int = 2): DataFrame =
    ivfTopKWith(corpus, queries,
      corpus.filter(col("vec_id") < numCentroids)
        .select(col("vec_id").as("cid"), quantize(col("embedding")).as("cv")),
      k, nprobe)

  /** Lloyd's k-means refinement for IVF centroids, DataFrame-native and
    * deterministic: seed = the first `k` corpus vectors, then `iterations`
    * rounds of (assign via broadcast argmax) → (new centroid = element-wise
    * mean of members). Per round: one map-only broadcast cross join + one
    * argmax aggregate + one (cid, element-index) average — all partial-
    * aggregated, so shuffle volume is O(corpus) rows round one and
    * O(k × dim) after. Returns (cid, cv) quantized, ready for [[ivfTopK]]'s
    * centroid contract. Empty clusters keep their previous centroid. */
  def kmeansCentroids(corpus: DataFrame, k: Int, iterations: Int = 2): DataFrame = {
    val quantized = corpus.select(col("vec_id"), quantize(col("embedding")).as("v"))
    var cent = quantized.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    for (_ <- 0 until iterations) {
      val assign = quantized.crossJoin(broadcast(cent))
        .withColumn("_cscore", qdot(col("v"), col("cv")))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("_cscore"), -col("cid"))).as("cid"),
          first(col("v")).as("v"))
      // Element-wise mean per cluster: explode to (cid, i, q), average, and
      // reassemble in index order — two partial-aggregated shuffles whose
      // second is only k × dim rows.
      val means = assign
        .select(col("cid"), posexplode(col("v")).as(Seq("_i", "_q")))
        .groupBy(col("cid"), col("_i"))
        .agg(avg(col("_q")).as("_m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("_i"), col("_m")))).as("_im"))
        .select(col("cid"),
          // floor(m + 0.5), not round(): identical in any engine (round's
          // half-away-from-zero differs from half-up on negatives, and the
          // oracle mirrors this expression exactly).
          transform(col("_im"), x => floor(x.getField("_m") + 0.5).cast("long")).as("cv"))
      // Preserve centroids whose cluster emptied (left join keeps the old).
      // localCheckpoint: the refined table is k rows but its lineage scans
      // the full quantized corpus; [[ivfTopKWith]] consumes centroids in TWO
      // broadcast builds (corpus assign + query probes), so an un-truncated
      // Lloyd subtree would re-run the corpus scan per consumer — and per
      // extra iteration the lineage would re-run all prior rounds.
      cent = cent.select(col("cid"), col("cv").as("_old"))
        .join(means, Seq("cid"), "left_outer")
        .select(col("cid"), coalesce(col("cv"), col("_old")).as("cv"))
        .localCheckpoint(true)
    }
    cent
  }

  /** [[ivfTopK]] against an explicit centroid table (e.g. from
    * [[kmeansCentroids]]) instead of the first-k seed.
    *
    * Corpus-side assignment is an ARGMAX AGGREGATE, not a window: the
    * broadcast cross join is map-only and `max_by` partial-aggregates, so
    * each mapper emits one row per vector instead of shuffling K scored
    * copies into a sort+window. Ties break to the lowest centroid id via
    * the (score, -cid) ordering struct — matching the oracle's
    * ORDER BY score DESC, cid. Query-side probing keeps a window (top-
    * nprobe, not top-1) and is broadcast into the candidate join. */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
                  k: Int, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cent = broadcast(centroids)
    val assign = corpus.select(col("vec_id"), quantize(col("embedding")).as("v"))
      .crossJoin(cent)
      .withColumn("_cscore", qdot(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("_cscore"), -col("cid"))).as("cid"),
        first(col("v")).as("v"))
    val pw = Window.partitionBy(col("query_id")).orderBy(col("_cscore").desc, col("cid"))
    val probes = queries
      .select(col("vec_id").as("query_id"), quantize(col("embedding")).as("qv"))
      .crossJoin(cent)
      .withColumn("_cscore", qdot(col("qv"), col("cv")))
      .withColumn("_crn", row_number().over(pw))
      .filter(col("_crn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    broadcast(probes).join(assign, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", qdot(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"),
        col("cid").as("cluster"))
  }

  /** Product-quantization ANN: each vector is encoded as `m` sub-space
    * codes (nearest codebook entry by quantized L2, ties to the lowest
    * code), and a query scores a corpus vector as the SUM of per-subspace
    * dot-product LOOKUPS (asymmetric distance computation) — never
    * touching the original corpus floats.
    *
    * The scale story is memory, not just shuffle: the corpus representation
    * is m small ints per vector instead of `dim` floats (here 4 codes vs 64
    * floats — a 16-64× shrink), so a billion-vector index fits where raw
    * vectors cannot, and the scoring join moves (vec_id, s, code) rows
    * against a BROADCAST query lookup table of |Q|·m·ksub entries. Codebook
    * here = the first `ksub` corpus vectors' sub-vectors (deterministic →
    * oracle-checkable; production plugs per-subspace k-means into the same
    * plan, exactly as [[ivfTopKWith]] does for coarse centroids).
    *
    * Everything is quantized int64 arithmetic: encode = argmin Σ(q-c)²,
    * score = Σ LUT dots — bit-identical in any engine. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 4, ksub: Int = 8, dim: Int = 64): DataFrame = {
    require(dim % m == 0, "dim must divide into m subspaces")
    // Checkpoint the seeded codebook: pqTopKWith broadcasts it on BOTH the
    // encode and LUT sides, and the m·ksub·dsub-row table is trivial to
    // materialize vs re-running its filtered scan + explode per consumer
    // (the trained path three definitions down already does the same).
    pqTopKWith(corpus, queries,
      subElements(corpus.filter(col("vec_id") < ksub), "code", dim / m)
        .withColumnRenamed("q", "cq").localCheckpoint(true), k, dim / m)
  }

  /** Quantized SUB-vector elements as rows: (id, s = subspace, j = index
    * within subspace, q) — the shared layout of PQ encode, LUT build, and
    * codebook training. */
  private def subElements(df: DataFrame, idName: String, dsub: Int): DataFrame = df
    .repartition(col("vec_id"))
    .select(col("vec_id").as(idName), posexplode(col("embedding")).as(Seq("_i", "_x")))
    .select(col(idName), expr(s"_i div $dsub").as("s"), expr(s"_i % $dsub").as("j"),
      round(col("_x").cast("double") * 1000).cast("long").as("q"))

  /** [[pqTopK]] against an EXPLICIT codebook — (code, s, j, cq) rows, e.g.
    * from [[pqCodebooks]]. The codebook is broadcast on both the encode and
    * LUT sides; everything else is identical to the seeded path. */
  def pqTopKWith(corpus: DataFrame, queries: DataFrame, codebook: DataFrame,
                 k: Int, dsub: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = broadcast(codebook)
    val dists = subElements(corpus, "vec_id", dsub)
      .join(cb, Seq("s", "j"))
      .groupBy(col("vec_id"), col("s"), col("code"))
      .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d2"))
    // encode: nearest codebook entry per (vector, subspace) — map-side
    // argmin aggregate, ties to the lowest code (the max_by/min_by pattern)
    val codes = dists.groupBy(col("vec_id"), col("s"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
    val lut = subElements(queries, "query_id", dsub)
      .join(cb, Seq("s", "j"))
      .groupBy(col("query_id"), col("s"), col("code"))
      .agg(sum(col("q") * col("cq")).as("pd"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    codes.join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd")).as("score"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
  }

  /** TRAINED PQ codebooks: per-subspace Lloyd refinement of the first-ksub
    * seed, exactly [[kmeansCentroids]] mirrored into each subspace — but by
    * quantized L2 (PQ encodes by distance, not dot product). All `m`
    * subspaces train simultaneously: assignment is one argmin aggregate
    * over (vec_id, s) keyed rows, new entries are one (s, code, j) mean —
    * both partial-aggregated, nothing all-pairs. Deterministic
    * (floor(avg+0.5) means, ties to the lowest code, empty codes keep their
    * previous entry), so a trained ranking is oracle-checkable. Returns
    * (code, s, j, cq) rows for [[pqTopKWith]]. */
  def pqCodebooks(corpus: DataFrame, m: Int = 4, ksub: Int = 8, dim: Int = 64,
                  iterations: Int = 1): DataFrame = {
    require(dim % m == 0, "dim must divide into m subspaces")
    val dsub = dim / m
    val el = subElements(corpus, "vec_id", dsub)
    var cb = subElements(corpus.filter(col("vec_id") < ksub), "code", dsub)
      .withColumnRenamed("q", "cq")
    for (_ <- 0 until iterations) {
      val assign = el
        .join(broadcast(cb), Seq("s", "j"))
        .groupBy(col("vec_id"), col("s"), col("code"))
        .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d2"))
        .groupBy(col("vec_id"), col("s"))
        .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
      val means = el
        .join(assign, Seq("vec_id", "s"))
        .groupBy(col("s"), col("code"), col("j"))
        .agg(floor(avg(col("q")) + 0.5).cast("long").as("cq_new"))
      // Preserve entries whose code emptied (left join keeps the old).
      cb = cb.join(means, Seq("s", "code", "j"), "left_outer")
        .select(col("code"), col("s"), col("j"),
          coalesce(col("cq_new"), col("cq")).as("cq"))
    }
    cb
  }

  /** Production PQ path: train per-subspace codebooks, then encode + score
    * with them. Same plan as [[pqTopK]]; only the codebook differs. */
  def pqTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int,
                    m: Int = 4, ksub: Int = 8, dim: Int = 64,
                    iterations: Int = 1): DataFrame =
    pqTopKWith(corpus, queries,
      // localCheckpoint: the codebook subtree feeds BOTH the encode and the
      // LUT broadcast — without it the Lloyd iteration recomputes per
      // consumer (the round-4 shared-subtree rule).
      pqCodebooks(corpus, m, ksub, dim, iterations).localCheckpoint(true),
      k, dim / m)

  /** ANN top-k via hyperplane LSH: candidates share the query's bucket.
    * One hash shuffle on the bucket key; per-bucket exact re-rank. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 4, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = (v: Column) => lshKey(v, planes, dim)
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"),
      quantize(col("embedding")).as("qv"),
      key(col("embedding")).as("bucket")))
    val c = corpus.select(
      col("vec_id"), quantize(col("embedding")).as("cv"),
      key(col("embedding")).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("score", qdot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"), col("bucket"))
  }
}
