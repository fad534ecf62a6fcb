#!/usr/bin/env python3
"""Generate a 10x scale-axis dataset (sf1) from the driver's sf0.1 tables.

VERDICT r10 #2: every 100 TB claim so far extrapolates from sf0.1 — this
tool produces the first real scale datapoint. It REPLICATES sf0.1 ten
times into disjoint key spaces (the scaling sweep needs input-size
growth with the same per-key statistics, not new distributions):

  - every key family gets a replica offset chosen DIVISIBLE by the
    moduli the declared queries slice on (%3/%5/%7/%10/%500), so each
    replica carries the same slice densities as sf0.1;
  - document TEXTS get a per-replica token suffix (replica 0 keeps the
    originals) — without it, identical texts across replicas would
    shingle-join ACROSS replicas and the dedup candidate space would
    grow quadratically instead of linearly, which is replication
    artifact, not scaling signal;
  - embeddings stop at 5 replicas (vec_ids 0..9999): the planted
    +10000 variant scheme the sim_* keys build on caps synthetic
    vec_ids at 10k — documented sweep ceiling for that family;
  - nation/region stay 1x (true dimensions).

Writes parquet to the output dir (default /tmp/sfdata/sf1). Read-only
on /root/testdata. Runtime: ~1 min in DuckDB.
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf1"

# offsets divisible by lcm(2,3,5,7)=210 and, for part/supp keys, by 500
OFF_ORD = 2_100_000   # > max o_orderkey 149_999; %210 == 0
OFF_PART = 210_000    # > max p_partkey 19_999; %210 == %500 == 0
OFF_SUPP = 10_500     # > max s_suppkey 999;    %210 == %500 == 0
OFF_CUST = 210_000    # > max c_custkey 14_999
OFF_USER = 210_000    # > max user_id 1_499
OFF_EVT = 2_100_000   # > max event_id 99_999
OFF_DOC = 5_000       # doc ids stay < 100_000 (variant-offset invariant)
OFF_VEC = 2_000       # vec ids stay < 10_000 (variant-offset invariant)

REPLICAS = 10
VEC_REPLICAS = 5

import os
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

replicate("customer", REPLICAS, lambda r: f"""
  SELECT c_custkey + {r * OFF_CUST} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {src('customer')}""")

replicate("part", REPLICAS, lambda r: f"""
  SELECT p_partkey + {r * OFF_PART} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {src('part')}""")

replicate("supplier", REPLICAS, lambda r: f"""
  SELECT s_suppkey + {r * OFF_SUPP} AS s_suppkey, s_name, s_nationkey,
         s_acctbal
  FROM {src('supplier')}""")

replicate("events", REPLICAS, lambda r: f"""
  SELECT event_id + {r * OFF_EVT} AS event_id, ts,
         user_id + {r * OFF_USER} AS user_id, event_type, value, props
  FROM {src('events')}""")

# per-replica token suffix (replica 0 untouched) keeps shingle/gram joins
# WITHIN replicas — linear candidate growth, the honest scaling signal
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

replicate("embeddings", VEC_REPLICAS, lambda r: f"""
  SELECT vec_id + {r * OFF_VEC} AS vec_id, embedding, label
  FROM {src('embeddings')}""")

for t in ("nation", "region"):
    con.execute(
        f"COPY (SELECT * FROM {src(t)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied 1x")

print("done:", OUT)
