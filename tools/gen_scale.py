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

--skew flips the generator ADVERSARIAL (the r15 rehearsal: uniform
upscale validates volume, not new-skew regimes). Deterministic — all
routing is key-modulo, no randomness — and applied on TOP of the same
N-fold copy machinery so total volume matches the uniform corpus:

- duplicate-heavy corpus + Zipf-hot shingles: copies 1..ceil(n/2) keep
  text BYTE-IDENTICAL to the source (no ' cpk' suffix) — every source
  doc gains ~n/2 exact duplicates, near-dup cluster sizes grow with
  the copy count, and the duplicated text's shingles go df-hot
  (exactly what the LSH/setsim dfCap guards exist for);
- one dominant language: every non-source copy is relabeled to the
  modal source lang (~(n·f_modal+1-f_modal)/n of the corpus at n=10) —
  the (lang, shard) window/partition shapes see one giant group;
- one hot join key: for copies k>=1, 30% of events (event_id%10<3)
  route user_id to ONE hot user, and 30% of orders route o_custkey to
  ONE hot customer; 20% of lineitem routes l_partkey to ONE hot part —
  the salted-join / AQE-skew machinery must engage;
- one hot embedding cell: for copies k>=1, 50% of vectors (vec_id%2=0)
  collapse to the source's first vector plus a per-row 1e-6-scale
  dim-0 perturbation — a dense near-identical ball that lands in one
  IVF cell (the hot-cell guard's fail-fast territory).

Usage: python3 tools/gen_scale.py SRC_DIR DST_DIR [N] [--skew]
e.g.:  python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1 10
       python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1skew 10 --skew
"""
import sys

import duckdb


def union_copies(con, src, n, sql_for_copy):
    return " UNION ALL ".join(sql_for_copy(k) for k in range(n))


def main():
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    src, dst = args[0], args[1]
    n = int(args[2]) if len(args) > 2 else 10
    con = duckdb.connect()
    con.execute(f"SET threads TO 8")
    if skew:
        print("[gen_scale] SKEW mode: duplicate-heavy docs, dominant "
              "lang, hot user/custkey/partkey, hot embedding cell")

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
    hot_cust = con.execute(
        f"SELECT min(c_custkey) FROM '{src}/customer.parquet'").fetchone()[0]
    hot_part = con.execute(
        f"SELECT min(p_partkey) FROM '{src}/part.parquet'").fetchone()[0]

    def cust_expr(k):
        if skew and k >= 1:
            return (f"CASE WHEN o_orderkey % 10 < 3 THEN {hot_cust} "
                    f"ELSE o_custkey + {k * s_cust} END")
        return f"o_custkey + {k * s_cust}"

    def part_expr(k):
        if skew and k >= 1:
            return (f"CASE WHEN l_orderkey % 10 < 2 THEN {hot_part} "
                    f"ELSE l_partkey + {k * s_part} END")
        return f"l_partkey + {k * s_part}"

    write("orders", union_copies(con, src, n, lambda k: f"""
        SELECT o_orderkey + {k * s_ord} AS o_orderkey,
               {cust_expr(k)} AS o_custkey,
               * EXCLUDE (o_orderkey, o_custkey)
        FROM '{src}/orders.parquet'"""))
    write("lineitem", union_copies(con, src, n, lambda k: f"""
        SELECT l_orderkey + {k * s_ord} AS l_orderkey,
               {part_expr(k)} AS l_partkey,
               l_suppkey + {k * s_supp} AS l_suppkey,
               * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
        FROM '{src}/lineitem.parquet'"""))

    s_ev = stride("events", "event_id")
    s_user = stride("events", "user_id")
    hot_user = con.execute(
        f"SELECT min(user_id) FROM '{src}/events.parquet'").fetchone()[0]

    def user_expr(k):
        if skew and k >= 1:
            return (f"CASE WHEN event_id % 10 < 3 THEN {hot_user} "
                    f"ELSE user_id + {k * s_user} END")
        return f"user_id + {k * s_user}"

    write("events", union_copies(con, src, n, lambda k: f"""
        SELECT event_id + {k * s_ev} AS event_id,
               {user_expr(k)} AS user_id,
               * EXCLUDE (event_id, user_id)
        FROM '{src}/events.parquet'"""))

    s_doc = stride("documents", "doc_id")
    modal_lang = con.execute(
        f"SELECT lang FROM '{src}/documents.parquet' "
        "GROUP BY 1 ORDER BY count(*) DESC, lang LIMIT 1").fetchone()[0]
    dup_copies = (n + 1) // 2  # copies 1..dup_copies stay byte-identical

    def text_expr(k):
        if k == 0 or (skew and k <= dup_copies):
            return "text"
        return f"text || ' cp{k}'"

    def lang_expr(k):
        if skew and k >= 1:
            return f"'{modal_lang}'"
        return "lang"

    write("documents", union_copies(con, src, n, lambda k: f"""
        SELECT doc_id + {k * s_doc} AS doc_id,
               {text_expr(k)} AS text,
               {lang_expr(k)} AS lang,
               * EXCLUDE (doc_id, text, lang)
        FROM '{src}/documents.parquet'"""))

    s_vec = stride("embeddings", "vec_id")

    def emb_expr(k):
        if k == 0:
            return "embedding"
        if skew:
            # half of every non-source copy collapses onto the source's
            # first vector (+ a per-row 1e-6-scale dim-0 nudge): one
            # dense near-identical IVF cell
            return f"""CASE WHEN vec_id % 2 = 0 THEN
                     list_concat(
                       [hot.h[1] * (1.0 + (vec_id % 1000) * 1e-6)], hot.h[2:])
                   ELSE list_concat(
                     [embedding[1] * (1.0 + {k} * 1e-4)], embedding[2:]) END"""
        return f"""list_concat(
                      [embedding[1] * (1.0 + {k} * 1e-4)], embedding[2:])"""

    hot_join = (f", (SELECT embedding AS h FROM '{src}/embeddings.parquet' "
                "ORDER BY vec_id LIMIT 1) hot" if skew else "")
    write("embeddings", union_copies(con, src, n, lambda k: f"""
        SELECT e.vec_id + {k * s_vec} AS vec_id,
               CAST({emb_expr(k)} AS FLOAT[]) AS embedding,
               e.* EXCLUDE (vec_id, embedding)
        FROM '{src}/embeddings.parquet' e{hot_join if k >= 1 else ''}"""))


if __name__ == "__main__":
    main()
