#!/usr/bin/env python3
"""Generate the THIRD scale-axis point (sf3 = 30x sf0.1) — round 13:
FULL-catalog, including the dedup/ANN/text backbone.

VERDICT r11 #5 added the three-point sweep for the high-exponent
relational keys; VERDICT r12 #3 extends it to the LLM backbone, which
the r12 version of this tool could not cover: 30 replicas pushed doc
ids past 100_000, colliding base ids with the engine's planted-variant
id zones (+100_000 exact / +200_000 near).

Round-13 fix — the BAND discipline (graft/core/Bands.scala): every
engine range-classifier now reads the in-band position (id % stride),
so each replica owns a self-contained band holding its base docs AND
both its variant zones. This tool places replica r at:

  documents:  doc_id + r * 252_000   (base zone [0, 52_000) per band)
  embeddings: vec_id + r *  30_000   (base zone [0, 10_000) per band)

Strides are divisible by every %-slice modulus the variant selections
use (252_000 % 210 == % 10 == % 7 == 0; 30_000 % 50 == % 4 == 0), so
each band carries the same slice densities as sf0.1 — candidates,
ground-truth pairs and gram statistics stay WITHIN replicas (the
gen_sf1 rule), which is what makes LSH candidate growth at sf3 a real
linearity signal instead of cross-replica noise. Per-replica token
suffixes keep gram joins replica-local; per-replica embedding
perturbation (+r * 1e-4 per coordinate, = 100·r micro-units after the
engine's 1e6 quantization) keeps distances untied across replicas.
Probes stay the fixed vec_id < 10 set of band 0 — the documented
sampled-probe ANN protocol (corpus grows 30x, probe set constant).

Writes parquet to the output dir (default /tmp/sfdata/sf3). Read-only
on /root/testdata. Runtime: ~2 min in DuckDB.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf3"

# offsets divisible by lcm(2,3,5,7)=210 and, for part/supp keys, by 500 —
# each replica carries the same %-slice densities as sf0.1 (gen_sf1 rule)
OFF_ORD = 2_100_000
OFF_PART = 210_000
OFF_SUPP = 10_500
OFF_CUST = 210_000
OFF_DOC = 252_000   # = graft.core.Bands.DocBand (one replica per band)
OFF_VEC = 30_000    # = graft.core.Bands.VecBand

REPLICAS = 30

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def replicate(table, n, select_fn):
    parts = [select_fn(r) for r in range(n)]
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    cnt = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{OUT}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {cnt} rows")


src = lambda t: f"read_parquet('{SRC}/{t}.parquet')"

replicate("lineitem", REPLICAS, lambda r: f"""
  SELECT l_orderkey + {r * OFF_ORD} AS l_orderkey,
         l_partkey + {r * OFF_PART} AS l_partkey,
         l_suppkey + {r * OFF_SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}""")

replicate("orders", REPLICAS, lambda r: f"""
  SELECT o_orderkey + {r * OFF_ORD} AS o_orderkey,
         o_custkey + {r * OFF_CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}""")

# per-replica token suffix (replica 0 untouched) keeps gram statistics
# replica-local — same discipline as gen_sf1
replicate("documents", REPLICAS, lambda r: f"""
  SELECT doc_id + {r * OFF_DOC} AS doc_id, text, lang, source, n_chars
  FROM {src('documents')}""" if r == 0 else f"""
  SELECT doc_id + {r * OFF_DOC} AS doc_id,
         array_to_string(list_transform(string_split(text, ' '),
           t -> t || 'x{r}'), ' ') AS text,
         lang, source,
         CAST(length(array_to_string(list_transform(string_split(text, ' '),
           t -> t || 'x{r}'), ' ')) AS BIGINT) AS n_chars
  FROM {src('documents')}""")

# per-replica coordinate shift keeps distances untied across replicas
# (100·r micro-units post-quantization); replica 0 untouched
replicate("embeddings", REPLICAS, lambda r: f"""
  SELECT vec_id + {r * OFF_VEC} AS vec_id, embedding, label
  FROM {src('embeddings')}""" if r == 0 else f"""
  SELECT vec_id + {r * OFF_VEC} AS vec_id,
         list_transform(embedding, x -> x + {r} * 1e-4) AS embedding,
         label
  FROM {src('embeddings')}""")

for t in ("nation", "region", "customer", "supplier", "part", "events"):
    con.execute(
        f"COPY (SELECT * FROM {src(t)}) TO '{OUT}/{t}.parquet'"
        " (FORMAT PARQUET)")
    print(f"{t}: copied 1x")

print("done:", OUT)
