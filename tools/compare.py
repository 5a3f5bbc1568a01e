#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle_sql.json entry in DuckDB against the sfDir parquet
tables, sorts columns by name and rows by value, and compares cell by
cell (like the driver's hash-match, but with a diff printout).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


# Type-family lint: the driver's fetch path renders DuckDB HUGEINT as
# float64, so an oracle whose SUM()/window-sum is left uncast hash-
# mismatches a correct Spark BIGINT result (round-7 `users_cumulative`).
# Families must agree per column; HUGEINT/DECIMAL never match int.
_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_FLOAT = {"FLOAT", "DOUBLE"}


def type_family(t):
    t = str(t).upper()
    if t in _INT:
        return "int"
    if t in _FLOAT:
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    return t  # HUGEINT, VARCHAR, DATE, ... must match exactly


def type_lint(name, got_cols, got_types, exp_cols, exp_types):
    """Return list of per-column type-family mismatches (col, spark, oracle)."""
    gt = dict(zip(got_cols, got_types))
    et = dict(zip(exp_cols, exp_types))
    bad = []
    for c in sorted(set(gt) & set(et)):
        if type_family(gt[c]) != type_family(et[c]):
            bad.append((c, str(gt[c]), str(et[c])))
    return bad


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_noracle = 0
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = list(got.columns)
        got_types = [str(t) for t in got.types]
        got_rows = got.fetchall()
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(got_rows)} rows")
            continue
        exp = con.sql(oracle[name])
        exp_cols = list(exp.columns)
        exp_types = [str(t) for t in exp.types]
        exp_rows = exp.fetchall()
        bad_types = type_lint(name, got_cols, got_types, exp_cols, exp_types)
        if bad_types:
            n_fail += 1
            for c, st, ot in bad_types:
                print(f"  [FAIL-type] {name}.{c}: spark={st} oracle={ot}"
                      f" (cast the oracle column to the Spark type)")
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            n_fail += 1
            print(f"  [FAIL-schema] {name}: spark={gc} oracle={ec}")
            continue
        if gr == er:
            n_pass += 1
            print(f"  [pass] {name}: {len(gr)} rows")
        else:
            n_fail += 1
            print(f"  [FAIL-data] {name}: spark {len(gr)} rows vs oracle {len(er)} rows")
            sg, se = set(gr), set(er)
            for r in list(sg - se)[:3]:
                print(f"      spark-only:  {r}")
            for r in list(se - sg)[:3]:
                print(f"      oracle-only: {r}")
    print(f"== {n_pass} pass / {n_fail} FAIL / {n_noracle} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
