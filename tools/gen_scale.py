#!/usr/bin/env python3
"""Deterministic N-fold upscaler for the driver-generated testdata —
the r14 "rehearse 10x scale locally" machinery (VERDICT r13 #5).

Replicates every table of a source SF directory N times with
consistently shifted keys, writing a new directory usable by
graft.Bench/Verify (timing only — the DuckDB oracles describe the
driver's corpora, not this one). Design choices, so the scaling
exponents measured on the result mean something:

- every key column (doc_id, vec_id, the TPC-H *key columns, event_id,
  user_id) shifts by copy * stride, stride = max(key)+1 of the source,
  so foreign-key joins stay intact copy-by-copy and keys never collide;
- document text gets a per-copy suffix token (" cp<k>") and embeddings
  a per-copy relative perturbation on dim 0: WITHOUT these, ten
  byte-identical copies of every document would multiply near-dup
  CLUSTER SIZES by 10 (pair lists by ~100, quadratic in the copy
  count) — a shape real 10x data growth does not have. With them, each
  copy contributes its own clusters: linear growth, which is the thing
  a scaling exponent should measure. Copy 0 stays byte-identical to
  the source;
- nation/region (fixed dimensions) are copied once, unscaled.

Usage: python3 tools/gen_scale.py SRC_DIR DST_DIR [N]
e.g.:  python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys

import duckdb


def union_copies(con, src, n, sql_for_copy):
    return " UNION ALL ".join(sql_for_copy(k) for k in range(n))


def main():
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()
    con.execute(f"SET threads TO 8")

    import os
    os.makedirs(dst, exist_ok=True)

    def write(name, sql):
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        rows = con.execute(
            f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"[gen_scale] {name}: {rows} rows")

    def stride(table, key):
        return con.execute(
            f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

    # fixed dimensions: copied once
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM '{src}/{t}.parquet'")

    s_cust = stride("customer", "c_custkey")
    s_supp = stride("supplier", "s_suppkey")
    s_part = stride("part", "p_partkey")
    s_ord = stride("orders", "o_orderkey")

    write("customer", union_copies(con, src, n, lambda k: f"""
        SELECT c_custkey + {k * s_cust} AS c_custkey,
               * EXCLUDE (c_custkey)
        FROM '{src}/customer.parquet'"""))
    write("supplier", union_copies(con, src, n, lambda k: f"""
        SELECT s_suppkey + {k * s_supp} AS s_suppkey,
               * EXCLUDE (s_suppkey)
        FROM '{src}/supplier.parquet'"""))
    write("part", union_copies(con, src, n, lambda k: f"""
        SELECT p_partkey + {k * s_part} AS p_partkey,
               * EXCLUDE (p_partkey)
        FROM '{src}/part.parquet'"""))
    write("orders", union_copies(con, src, n, lambda k: f"""
        SELECT o_orderkey + {k * s_ord} AS o_orderkey,
               o_custkey + {k * s_cust} AS o_custkey,
               * EXCLUDE (o_orderkey, o_custkey)
        FROM '{src}/orders.parquet'"""))
    write("lineitem", union_copies(con, src, n, lambda k: f"""
        SELECT l_orderkey + {k * s_ord} AS l_orderkey,
               l_partkey + {k * s_part} AS l_partkey,
               l_suppkey + {k * s_supp} AS l_suppkey,
               * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
        FROM '{src}/lineitem.parquet'"""))

    s_ev = stride("events", "event_id")
    s_user = stride("events", "user_id")
    write("events", union_copies(con, src, n, lambda k: f"""
        SELECT event_id + {k * s_ev} AS event_id,
               user_id + {k * s_user} AS user_id,
               * EXCLUDE (event_id, user_id)
        FROM '{src}/events.parquet'"""))

    s_doc = stride("documents", "doc_id")
    write("documents", union_copies(con, src, n, lambda k: f"""
        SELECT doc_id + {k * s_doc} AS doc_id,
               text || {"''" if k == 0 else f"' cp{k}'"} AS text,
               * EXCLUDE (doc_id, text)
        FROM '{src}/documents.parquet'"""))

    s_vec = stride("embeddings", "vec_id")
    write("embeddings", union_copies(con, src, n, lambda k: f"""
        SELECT vec_id + {k * s_vec} AS vec_id,
               CAST(CASE WHEN {k} = 0 THEN embedding
                    ELSE list_concat(
                      [embedding[1] * (1.0 + {k} * 1e-4)], embedding[2:])
               END AS FLOAT[]) AS embedding,
               * EXCLUDE (vec_id, embedding)
        FROM '{src}/embeddings.parquet'"""))


if __name__ == "__main__":
    main()
