#!/usr/bin/env python3
"""Deterministic soak data: scale /root/testdata/sf0.1 by K copies.

NOT a correctness fixture (the driver's generator owns those) — a local
PERFORMANCE/soak input: same schemas, K deterministic copies of each
scaling table with key spaces shifted per copy so FKs stay consistent
within a copy. Text gets a per-copy suffix token (kills exact-dup
degeneracy, keeps near-dup structure); events shift by copy*7h so the
time axis grows; embeddings perturb one coordinate per copy. Dimension
tables (nation/region) copy through unchanged.

Usage: python3 tools/gen_sf1.py [outDir=/tmp/sfdata/sf1] [K=10]
  K=10 -> sf1 (the round-loop soak input)
  K=30 -> sf3 (the stateful-tier scale rung)
"""
import os
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf1"

K = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # copies
OFF = {  # per-copy key offsets (> max key in sf0.1)
    "cust": 1_000_000, "part": 1_000_000, "supp": 1_000_000,
    "order": 10_000_000, "doc": 1_000_000, "vec": 1_000_000,
    "event": 10_000_000, "user": 10_000_000,
}

con = duckdb.connect()
con.execute(f"CREATE VIEW ks AS SELECT unnest(range({K})) AS k")
os.makedirs(OUT, exist_ok=True)

def gen(name, sql):
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')"
    ).fetchone()[0]
    print(f"{name}: {n}")

def t(name):
    return f"read_parquet('{SRC}/{name}.parquet')"

# pass-through dimensions
for small in ("nation", "region"):
    gen(small, f"SELECT * FROM {t(small)}")

gen("customer", f"""
  SELECT c_custkey + k*{OFF['cust']} AS c_custkey,
         c_name || '#' || k AS c_name,
         c_nationkey, c_acctbal + k*0.01 AS c_acctbal, c_mktsegment
  FROM {t('customer')} CROSS JOIN ks""")

gen("supplier", f"""
  SELECT s_suppkey + k*{OFF['supp']} AS s_suppkey,
         s_name || '#' || k AS s_name, s_nationkey,
         s_acctbal + k*0.01 AS s_acctbal
  FROM {t('supplier')} CROSS JOIN ks""")

gen("part", f"""
  SELECT p_partkey + k*{OFF['part']} AS p_partkey,
         p_name || ' v' || k AS p_name, p_brand, p_type, p_size,
         p_retailprice + k*0.10 AS p_retailprice
  FROM {t('part')} CROSS JOIN ks""")

gen("orders", f"""
  SELECT o_orderkey + k*{OFF['order']} AS o_orderkey,
         o_custkey + k*{OFF['cust']} AS o_custkey,
         o_orderstatus,
         o_totalprice + k*0.01 AS o_totalprice,
         o_orderdate + INTERVAL (k) HOUR AS o_orderdate,
         o_orderpriority
  FROM {t('orders')} CROSS JOIN ks""")

gen("lineitem", f"""
  SELECT l_orderkey + k*{OFF['order']} AS l_orderkey,
         l_partkey + k*{OFF['part']} AS l_partkey,
         l_suppkey + k*{OFF['supp']} AS l_suppkey,
         l_linenumber, l_quantity,
         l_extendedprice + k*0.01 AS l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate + INTERVAL (k) HOUR AS l_shipdate
  FROM {t('lineitem')} CROSS JOIN ks""")

gen("events", f"""
  SELECT event_id + k*{OFF['event']} AS event_id,
         ts + INTERVAL (k*7) HOUR AS ts,
         user_id + (k%3)*{OFF['user']} AS user_id,
         event_type, value + k*0.001 AS value, props
  FROM {t('events')} CROSS JOIN ks""")

# per-copy suffix token: exact dups vanish, near-dup structure remains
gen("documents", f"""
  SELECT doc_id + k*{OFF['doc']} AS doc_id,
         text || ' copytag' || k AS text, lang, source,
         n_chars + 9 AS n_chars
  FROM {t('documents')} CROSS JOIN ks""")

gen("embeddings", f"""
  SELECT vec_id + k*{OFF['vec']} AS vec_id,
         list_transform(embedding,
           (x, i) -> CAST(CASE WHEN i = 1 THEN x + k*0.003
                               ELSE x END AS FLOAT)) AS embedding,
         label
  FROM {t('embeddings')} CROSS JOIN ks""")

print("done ->", OUT)
