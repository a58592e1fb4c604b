#!/usr/bin/env python3
"""Synthesize an sf1.0-scale documents/embeddings decade from sf0.1.

The driver ships testdata at sf0.001/0.01/0.1 (x10 rows per step); no
sf1.0 exists and /root/testdata is read-only, so the r16 verdict's
"one measured decade" task is served by a synthetic x10 of the two
corpus tables, built so the OPERATOR-relevant structure is
scale-invariant:

- documents (5000 -> 50000): copy 0 is sf0.1 verbatim; copies 1-9 get
  every token prefixed with 'c<copy>' (the ScaleSmoke salting scheme),
  so each copy reproduces the base corpus' internal duplicate/near-dup
  structure in a disjoint token space and NO shingle matches across
  copies. Duplicate-clique sizes and the dup fraction are therefore
  invariant under the x10 - growth numbers measure the engine, not
  ever-larger identical-copy cliques.

- embeddings (2000 -> 20000): copy 0 verbatim; copy c's vectors are the
  base vectors with coordinates ROTATED by 13*c positions (mod dim).
  A coordinate permutation preserves norms and every within-copy dot
  product exactly (the copy is an isometric image of the base cluster
  structure), while cross-copy dot products decorrelate - so near-dup
  cliques and label/cluster geometry are invariant and the corpus is a
  genuine x10, not 10 stacked replicas (which would inflate near-dup
  output quadratically, the ScaleSmoke caveat).

- events (100k -> 1M; r18, VERDICT r17 task 4): copy 0 verbatim; copy c
  offsets user_id by c*10^7 and event_id by c*10^9, keeping ts/type/
  value/props VERBATIM — each copy's users are new users with identical
  per-user event streams, so session counts, funnel conversion, per-user
  RFM and retention structure are scale-INVARIANT (the ev_* growth
  numbers measure the engine's shuffle shapes, not deeper sessions).
  Within-copy event_id order is preserved by the constant offset.

- lineitem (600k -> 6M; graph_* family): copy 0 verbatim; copy c offsets
  l_orderkey by c*10^8 and l_partkey by c*10^7 — ten DISJOINT copies of
  the co-purchase graph (same basket sizes, same degree distribution,
  component/triangle counts x10) rather than x10-weighted edges on one
  graph, so the graph stages grow with the data like the salted-token
  documents decade. Non-graph lineitem columns ride along verbatim;
  the part/orders FKs of copies >0 dangle BY DESIGN (the graph_* family
  reads lineitem alone — TPC-H q* queries are not in the decade subset).

== --skew (r19, VERDICT r18 task 3) ==

The uniform decade is self-similar BY CONSTRUCTION — it cannot surface
skew that only organic data has. `--skew` keeps the SAME row counts
(runtimes comparable 1:1 with the uniform fixture) but concentrates
~20% of each table in one hot structure, exercising the machinery the
code claims is skew-safe:

- documents: copies 0-7 uniform + a 2,000-doc EXACT-DUP CLIQUE (one
  median-length base doc, 'c8'-salted — above the maxBucket=1000 LSH
  cap, so the mega-bucket DROP path actually executes, but small enough
  that the all-pairs closure oracles stay feasible) + 8,000 'c9'-salted
  docs, ALL 10,000 under one hot source 'megasource' (20% of the
  corpus in one domain) — hot content-hash group, hot shingles, one 2k
  connected component, hot-source rollups;
- embeddings: copies 0-7 rotated + 2,000 vectors that are one base
  vector under tiny per-row scalings (cosine ~ 1; one mega cluster/cell
  for IVF, semantic-dedup cell caps, kNN audits — ~2M exact intra-
  cluster pairs on BOTH engines in the near-dup queries) + 2,000
  rotation-9 rows;
- events: copies 0-7 + ONE USER holding 200,000 events (every base
  event twice, distinct event_ids) — a 20% hot key into every
  user-keyed session window (windows cannot be AQE-skew-split, so this
  measures the true hot-partition cost) and giant merged sessions
  against the pathLen/collect caps;
- lineitem: copies 0-7 + copies 8-9 where every order's first line is
  ONE HOT PART (co-purchase hub of ~300k baskets) + one 2,000-item
  MEGA BASKET (pair_structs' documented 65,535 cap is far above it;
  2M exact pairs from one row on both engines).

Oracles replay the same SQL over the same parquet, so all 160 decade
queries stay hash-checkable; what the fixture changes is which code
paths carry the weight.

Usage: python3 tools/make_sf1.py [outdir=/tmp/sf1.0] [--skew]

Row groups are written SMALL (2048 rows) so Spark can split the single
file: DuckDB's default one-giant-row-group output serializes every
map-only Spark query onto ~1 task (a fixture artifact — real corpora
are many files/groups), which understates the engine at exactly the
scale the decade exists to measure.

Only documents.parquet and embeddings.parquet are produced - the
decade subset (SPARK_GRAFT_ONLY over the dedup/ann/llm families that
read only these tables) is what the sf1.0 measurement runs.
"""
import sys

import duckdb

args = [a for a in sys.argv[1:] if a != "--skew"]
SKEW = "--skew" in sys.argv[1:]
OUT = args[0] if args else ("/tmp/sf1.0-skew" if SKEW else "/tmp/sf1.0")
SRC = "/root/testdata/sf0.1"
COPIES = 8 if SKEW else 10  # skew: copies 8-9's row budget goes to the hot blocks

con = duckdb.connect()
con.execute("SET threads TO 16")
import os

os.makedirs(OUT, exist_ok=True)

# The pre-r18 recipe symlinked the non-corpus tables into the read-only
# driver testdata; COPY TO would write THROUGH such a link. Unlink any
# symlink at an output path before writing (never touch the link target).
for t in ("documents", "embeddings", "events", "lineitem"):
    p = os.path.join(OUT, f"{t}.parquet")
    if os.path.islink(p):
        os.remove(p)

doc_skew = f"""
  UNION ALL
  SELECT CAST(80000000 + i.i AS BIGINT) AS doc_id,
         m.stext AS text, 'en' AS lang, 'megasource' AS source,
         CAST(length(m.stext) AS BIGINT) AS n_chars
  FROM (SELECT array_to_string(list_transform(string_split(text, ' '),
                 t -> 'c8' || t), ' ') AS stext
        FROM (SELECT text FROM '{SRC}/documents.parquet'
              ORDER BY length(text), doc_id LIMIT 1 OFFSET 2500)) m
  CROSS JOIN (SELECT unnest(range(2000)) AS i) i
  UNION ALL
  SELECT d.doc_id + 90000000 AS doc_id,
         array_to_string(list_transform(string_split(d.text, ' '),
                         t -> 'c9' || t), ' ') AS text,
         d.lang, 'megasource' AS source,
         CAST(length(array_to_string(list_transform(string_split(d.text, ' '),
                      t -> 'c9' || t), ' ')) AS BIGINT) AS n_chars
  FROM '{SRC}/documents.parquet' d
  UNION ALL
  SELECT d.doc_id + 95000000 AS doc_id,
         array_to_string(list_transform(string_split(d.text, ' '),
                         t -> 'c10' || t), ' ') AS text,
         d.lang, 'megasource' AS source,
         CAST(length(array_to_string(list_transform(string_split(d.text, ' '),
                      t -> 'c10' || t), ' ')) AS BIGINT) AS n_chars
  FROM (SELECT * FROM '{SRC}/documents.parquet' ORDER BY doc_id LIMIT 3000) d
""" if SKEW else ""

con.execute(f"""
COPY (
  SELECT * FROM (
  SELECT d.doc_id + c.copy * 10000000 AS doc_id,
         CASE WHEN c.copy = 0 THEN d.text
              ELSE array_to_string(
                     list_transform(string_split(d.text, ' '),
                                    t -> 'c' || c.copy || t), ' ')
         END AS text,
         d.lang, d.source,
         CASE WHEN c.copy = 0 THEN d.n_chars
              ELSE CAST(length(array_to_string(
                     list_transform(string_split(d.text, ' '),
                                    t -> 'c' || c.copy || t), ' ')) AS BIGINT)
         END AS n_chars
  FROM '{SRC}/documents.parquet' d
  CROSS JOIN (SELECT unnest(range({COPIES})) AS copy) c
  {doc_skew}
  ) ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)
""")

emb_skew = f"""
  UNION ALL
  SELECT CAST(80000000 + i.i AS BIGINT) AS vec_id,
         list_transform(m.embedding,
           x -> CAST(x * (1 + (i.i % 97) * 0.000001) AS FLOAT)) AS embedding,
         m.label
  FROM (SELECT embedding, label FROM '{SRC}/embeddings.parquet'
        ORDER BY vec_id LIMIT 1 OFFSET 7) m
  CROSS JOIN (SELECT unnest(range(2000)) AS i) i
  UNION ALL
  SELECT e.vec_id + 90000000 AS vec_id,
         list_transform(range(1, len(e.embedding) + 1),
           i -> e.embedding[
             1 + CAST((i - 1 + 13 * 9) % len(e.embedding) AS BIGINT)]) AS embedding,
         e.label
  FROM (SELECT * FROM '{SRC}/embeddings.parquet' ORDER BY vec_id LIMIT 2000) e
""" if SKEW else ""

con.execute(f"""
COPY (
  SELECT * FROM (
  SELECT e.vec_id + c.copy * 10000000 AS vec_id,
         CASE WHEN c.copy = 0 THEN e.embedding
              ELSE list_transform(
                     range(1, len(e.embedding) + 1),
                     i -> e.embedding[
                       1 + CAST((i - 1 + 13 * c.copy) % len(e.embedding) AS BIGINT)])
         END AS embedding,
         e.label
  FROM '{SRC}/embeddings.parquet' e
  CROSS JOIN (SELECT unnest(range({COPIES})) AS copy) c
  {emb_skew}
  ) ORDER BY vec_id
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)
""")

ev_skew = f"""
  UNION ALL
  SELECT CAST(8000000000 + e.event_id * 2 + k.k AS BIGINT) AS event_id,
         e.ts, CAST(99999999 AS BIGINT) AS user_id,
         e.event_type, e.value, e.props
  FROM '{SRC}/events.parquet' e
  CROSS JOIN (SELECT unnest(range(2)) AS k) k
""" if SKEW else ""

con.execute(f"""
COPY (
  SELECT * FROM (
  SELECT e.event_id + c.copy * 1000000000 AS event_id,
         e.ts,
         e.user_id + c.copy * 10000000 AS user_id,
         e.event_type, e.value, e.props
  FROM '{SRC}/events.parquet' e
  CROSS JOIN (SELECT unnest(range({COPIES})) AS copy) c
  {ev_skew}
  ) ORDER BY event_id
) TO '{OUT}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)
""")

li_skew = f"""
  UNION ALL
  SELECT l.l_orderkey + c.copy * 100000000 AS l_orderkey,
         CASE WHEN l.l_linenumber = 1 THEN CAST(70000001 AS BIGINT)
              ELSE l.l_partkey + c.copy * 10000000 END AS l_partkey,
         l.l_suppkey, l.l_linenumber, l.l_quantity, l.l_extendedprice,
         l.l_discount, l.l_tax, l.l_returnflag, l.l_linestatus, l.l_shipdate
  FROM '{SRC}/lineitem.parquet' l
  CROSS JOIN (SELECT unnest(range(8, 10)) AS copy) c
  UNION ALL
  SELECT CAST(999999999 AS BIGINT) AS l_orderkey,
         CAST(70010000 + m.rn AS BIGINT) AS l_partkey,
         m.l_suppkey, m.l_linenumber, m.l_quantity, m.l_extendedprice,
         m.l_discount, m.l_tax, m.l_returnflag, m.l_linestatus, m.l_shipdate
  FROM (SELECT *, row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        FROM '{SRC}/lineitem.parquet' LIMIT 2000) m
""" if SKEW else ""

con.execute(f"""
COPY (
  SELECT * FROM (
  SELECT l.l_orderkey + c.copy * 100000000 AS l_orderkey,
         l.l_partkey + c.copy * 10000000 AS l_partkey,
         l.l_suppkey, l.l_linenumber, l.l_quantity, l.l_extendedprice,
         l.l_discount, l.l_tax, l.l_returnflag, l.l_linestatus, l.l_shipdate
  FROM '{SRC}/lineitem.parquet' l
  CROSS JOIN (SELECT unnest(range({COPIES})) AS copy) c
  {li_skew}
  ) ORDER BY l_orderkey, l_linenumber
) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)
""")

for t in ("documents", "embeddings", "events", "lineitem"):
    n, = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()
    print(f"{t}: {n} rows -> {OUT}/{t}.parquet")
