#!/usr/bin/env python3
"""Builder-side generator for the SCALING.md third point: a 10x-sf0.1
synthetic documents corpus. Ten replicas of the sf0.1 table, ids re-keyed
(doc_id + k*1e7) and each replica's text passed through a distinct
alphabet rotation, so cross-replica shingle universes are disjoint — 10x
the data with the SAME statistical shape (true near-dup pair structure
grows linearly, not quadratically, unlike verbatim copies).

Usage: python3 tools/make_sf1syn.py [src_dir] [out_dir]
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1syn"

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT doc_id + k*10000000 AS doc_id,
         translate(text,
           'abcdefghijklmnopqrstuvwxyz',
           substr('abcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyz',
                  CAST(k+1 AS INT), 26)) AS text,
         lang, source, n_chars
  FROM '{src}/documents.parquet', unnest(range(0,10)) AS u(k)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n, d = con.execute(
    f"SELECT count(*), count(DISTINCT doc_id) FROM '{out}/documents.parquet'"
).fetchone()
# re-keying collides if the source already uses doc_ids >= 1e7 — refuse
# to emit a corpus whose pair structure would be silently corrupted
assert n == d, f"doc_id collision after re-keying: {n} rows, {d} distinct"
print(f"{out}/documents.parquet: {n} rows, {d} distinct doc_ids")

# events: 10 replicas with DISTINCT users (user_id + k*1e6) over the SAME
# time range — streaming state (sessions per user, join state per user)
# grows 10x while the window grid stays fixed, which is the state-pressure
# axis the stream_* scaling point needs. Timestamps unchanged.
con.execute(f"""
COPY (
  SELECT event_id + k*1000000000 AS event_id, ts,
         user_id + k*1000000 AS user_id, event_type, value, props
  FROM '{src}/events.parquet', unnest(range(0,10)) AS u(k)
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
ne, de = con.execute(
    f"SELECT count(*), count(DISTINCT event_id) FROM '{out}/events.parquet'"
).fetchone()
assert ne == de, f"event_id collision after re-keying: {ne} rows, {de} distinct"
print(f"{out}/events.parquet: {ne} rows, {de} distinct event_ids")

# embeddings: 10 replicas, vectors circularly shifted by k dims — norms
# and within-replica pair structure preserved, cross-replica vectors
# decorrelated (a verbatim copy would plant N spurious exact-dup pairs).
con.execute(f"""
COPY (
  SELECT vec_id + k*10000000 AS vec_id,
         list_concat(embedding[(CAST(k AS INT)+1):64],
                     embedding[1:CAST(k AS INT)]) AS embedding,
         label
  FROM '{src}/embeddings.parquet', unnest(range(0,10)) AS u(k)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
nv, dv = con.execute(
    f"SELECT count(*), count(DISTINCT vec_id) FROM '{out}/embeddings.parquet'"
).fetchone()
assert nv == dv, f"vec_id collision after re-keying: {nv} rows, {dv} distinct"
print(f"{out}/embeddings.parquet: {nv} rows, {dv} distinct vec_ids")

# lineitem: 10 replicas with DISJOINT part/supplier key spaces
# (l_partkey + k*1e7, l_suppkey + k*1e6) — the bipartite supplier<->part
# graph grows to 10x nodes AND 10x edges as ten disconnected subgraphs,
# the right scaling axis for graph_pagerank (rank mass stays local; a
# verbatim copy would just multiply edge weights). layout_compaction and
# layout_zorder see 10x file bytes with the same per-key distribution.
con.execute(f"""
COPY (
  SELECT l_orderkey + k*100000000 AS l_orderkey,
         l_partkey + k*10000000 AS l_partkey,
         l_suppkey + k*1000000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet', unnest(range(0,10)) AS u(k)
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")
# the source table is synthetic and (l_orderkey, l_linenumber) is NOT a
# key there — what the scaling point needs is replica DISJOINTNESS of the
# graph keys, so assert the ten part-key bands exist and never overlap
nl, nb, nsrc = con.execute(
    f"""SELECT count(*), count(DISTINCT l_partkey // 10000000),
        (SELECT count(*) FROM '{src}/lineitem.parquet')
        FROM '{out}/lineitem.parquet'"""
).fetchone()
assert nb == 10 and nl == 10 * nsrc, \
    f"lineitem replication broken: {nl} rows ({nsrc} source), {nb} key bands"
print(f"{out}/lineitem.parquet: {nl} rows in {nb} disjoint part-key bands")

# part: 10 replicas with disjoint partkeys but the SAME name/price/size
# domains — entity_fuzzy_pairs stays dictionary-bound (64 distinct names)
# while its corpus-sized distinct scan grows 10x, and pareto_frontier's
# point set stays domain-bounded while the collapse input grows 10x:
# exactly the claimed scaling axes.
con.execute(f"""
COPY (
  SELECT p_partkey + k*10000000 AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{src}/part.parquet', unnest(range(0,10)) AS u(k)
) TO '{out}/part.parquet' (FORMAT PARQUET)
""")
print(f"{out}/part.parquet: replicated")

# orders + customer + supplier: disjoint key bands per replica — 10x MV
# groups for mv_incremental_refresh, 10x FK edges for the quality audits,
# with referential integrity preserved within each replica.
con.execute(f"""
COPY (
  SELECT o_orderkey + k*100000000 AS o_orderkey,
         o_custkey + k*1000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', unnest(range(0,10)) AS u(k)
) TO '{out}/orders.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT c_custkey + k*1000000 AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM '{src}/customer.parquet', unnest(range(0,10)) AS u(k)
) TO '{out}/customer.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT s_suppkey + k*1000000 AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{src}/supplier.parquet', unnest(range(0,10)) AS u(k)
) TO '{out}/supplier.parquet' (FORMAT PARQUET)
""")
print(f"{out}/orders,customer,supplier: replicated with disjoint key bands")
