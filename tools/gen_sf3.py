#!/usr/bin/env python3
"""Generate the THIRD scale-axis point (sf3 = 30x sf0.1) for the
high-exponent keys.

VERDICT r11 #5: the two-point sf0.1->sf1 sweep fitted per-key exponents;
the difference between "scan class" and "quietly quadratic" only shows at
a third point past the decade. This tool replicates sf0.1 THIRTY times
into disjoint key spaces for exactly the tables the high-exponent keys
read — orders + lineitem (graph_hits, agg_spearman) and documents
(text_lang_ngram) — with the same offset/suffix discipline as
tools/gen_sf1.py.

TARGETED dataset, not a full-catalog scale point: at 30 replicas the
document ids pass 100_000, which breaks the variant-offset invariant the
dedup keys build on (doc_id + 200_000 variants, %100_000 base mapping) —
gen_sf1's 10-replica ceiling remains the full-catalog scale axis. The
three swept keys touch none of that machinery (documented in SCALING.md).
Remaining tables are copied 1x so graft.core.Tables loads the directory.

Writes parquet to the output dir (default /tmp/sfdata/sf3). Read-only on
/root/testdata. Runtime: ~2 min in DuckDB.
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
OFF_DOC = 5_000

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

for t in ("nation", "region", "customer", "supplier", "part", "events",
          "embeddings"):
    con.execute(
        f"COPY (SELECT * FROM {src(t)}) TO '{OUT}/{t}.parquet'"
        " (FORMAT PARQUET)")
    print(f"{t}: copied 1x")

print("done:", OUT)
