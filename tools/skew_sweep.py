#!/usr/bin/env python3
"""Resumable per-query oracle sweep — the skew/scale widening driver.

Same check as tools/compare.py (canonical sort + cell-by-cell equality
against the DuckDB oracle over the given corpus) but engineered for the
multi-hour board-wide sweeps of SCALE.md:

- one DuckDB query per invocation of check(), timed, with a bounded
  thread count (the sweep runs in the background of a working session;
  32 oracle threads would starve everything else);
- progress appends to <out_dir>/sweep_log.tsv after EVERY query, so a
  killed sweep resumes where it stopped (queries already logged are
  skipped) and the log itself is the SCALE.md evidence table;
- cheap-first ordering by the committed bench medians (Spark cost is a
  loose but monotone-enough proxy for oracle cost), so the record fills
  from the fast side and a mid-sweep stop loses only expensive tail
  entries, never breadth;
- per-query wall cap: a query whose oracle exceeds --timeout-sec logs
  `timeout` with the elapsed time instead of wedging the sweep (the
  sf1 dedup_cluster_stats oracle spills >79 GB and would otherwise run
  the disk out hours in).

Usage:
  python3 tools/skew_sweep.py SF_DIR OUT_DIR [--threads N] [--timeout-sec S]
                              [--only a,b,c] [--skip a,b,c]
"""
import json
import multiprocessing
import sys
import time
from pathlib import Path

import duckdb

from compare import TABLES, canon, type_lint


def committed_medians(repo_root):
    p = repo_root / "bench" / "time_baseline.tsv"
    out = {}
    if p.exists():
        for line in p.read_text().splitlines():
            if line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) >= 2:
                try:
                    out[parts[0]] = float(parts[1])
                except ValueError:
                    pass
    return out


def check(sf_dir, d, oracle_sql, threads, timeout_sec):
    """Run one query's oracle compare in a subprocess (hard-killable on
    timeout — DuckDB's interrupt is not reliable mid-spill)."""

    def worker(q):
        try:
            con = duckdb.connect()
            con.execute(f"SET threads TO {threads}")
            # bound the spill the way the sweep box can afford
            con.execute("SET max_temp_directory_size='60GiB'")
            for t in TABLES:
                p = Path(sf_dir) / f"{t}.parquet"
                if p.exists():
                    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
            got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
            got_cols, got_types = list(got.columns), [str(t) for t in got.types]
            got_rows = got.fetchall()
            exp = con.sql(oracle_sql)
            exp_cols, exp_types = list(exp.columns), [str(t) for t in exp.types]
            exp_rows = exp.fetchall()
            bad = type_lint(d.name, got_cols, got_types, exp_cols, exp_types)
            if bad:
                q.put(("FAIL-type", len(got_rows), str(bad[:3])))
                return
            gc, gr = canon(got_rows, got_cols)
            ec, er = canon(exp_rows, exp_cols)
            if gc != ec:
                q.put(("FAIL-schema", len(gr), f"spark={gc} oracle={ec}"))
            elif gr == er:
                q.put(("pass", len(gr), ""))
            else:
                sg, se = set(gr), set(er)
                q.put(("FAIL-data", len(gr),
                       f"oracle {len(er)} rows; spark-only {list(sg - se)[:2]} "
                       f"oracle-only {list(se - sg)[:2]}"))
        except Exception as e:  # noqa: BLE001 — sweep must outlive any query
            q.put(("err", -1, f"{type(e).__name__}: {e}"[:300]))

    q = multiprocessing.Queue()
    proc = multiprocessing.Process(target=worker, args=(q,))
    t0 = time.time()
    proc.start()
    proc.join(timeout_sec)
    elapsed = time.time() - t0
    if proc.is_alive():
        proc.terminate()
        proc.join(10)
        if proc.is_alive():
            proc.kill()
        return "timeout", -1, f"oracle exceeded {timeout_sec}s", elapsed
    status, rows, detail = q.get() if not q.empty() else (
        "err", -1, "worker died without a result")
    return status, rows, detail, elapsed


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir, out_dir = args[0], Path(args[1])

    def opt(name, default):
        for a in sys.argv[1:]:
            if a.startswith(f"--{name}="):
                return a.split("=", 1)[1]
        return default

    threads = int(opt("threads", "16"))
    timeout_sec = float(opt("timeout-sec", "3600"))
    only = set(opt("only", "").split(",")) - {""}
    skip = set(opt("skip", "").split(",")) - {""}

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    log = out_dir / "sweep_log.tsv"
    done = set()
    if log.exists():
        for line in log.read_text().splitlines():
            if line and not line.startswith("#"):
                done.add(line.split("\t")[0])
    else:
        log.write_text("# query\tstatus\trows\toracle_sec\tdetail\n")

    medians = committed_medians(Path(__file__).resolve().parent.parent)
    dirs = [d for d in out_dir.iterdir() if d.is_dir()]
    todo = [d for d in dirs
            if d.name in oracle and d.name not in done
            and (not only or d.name in only) and d.name not in skip]
    todo.sort(key=lambda d: (medians.get(d.name, 1e9), d.name))
    print(f"[sweep] {len(todo)} to compare ({len(done)} already logged), "
          f"threads={threads}, timeout={timeout_sec:.0f}s", flush=True)

    n_pass = n_fail = 0
    for i, d in enumerate(todo):
        status, rows, detail, elapsed = check(
            sf_dir, d, oracle[d.name], threads, timeout_sec)
        with log.open("a") as f:
            f.write(f"{d.name}\t{status}\t{rows}\t{elapsed:.1f}\t{detail}\n")
        n_pass += status == "pass"
        n_fail += status.startswith("FAIL")
        print(f"[sweep {i + 1}/{len(todo)}] {d.name}: {status} "
              f"({rows} rows, {elapsed:.1f}s) {detail[:120]}", flush=True)
    print(f"[sweep] done: {n_pass} pass / {n_fail} FAIL "
          f"/ {len(todo) - n_pass - n_fail} other", flush=True)


if __name__ == "__main__":
    main()
