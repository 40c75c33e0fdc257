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
