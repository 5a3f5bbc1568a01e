#!/usr/bin/env python3
"""Pooled-sample battery for the bench time baseline (r14 verdict ask,
executed r16): rows whose committed MAD/median exceeds 0.25 are
re-estimated by POOLING raw samples across several calm-window bench
runs, and replaced only when the pooled estimate is both tight
(pooled mad2/median <= 0.25) and consistent with the committed value
(pooled median <= 1.15x committed) -- the recorded guard against
regenerating a row from a drifted machine-day, which would loosen the
gate exactly where it most needs to hold.

Usage:
  python3 tools/pool_battery.py bench/time_baseline.tsv run1.json run2.json ...

Reads each bench.json (graft.Bench's full record: per-query `runs`
arrays, every raw sample untrimmed), pools samples per query, and
prints a report plus `# replace` TSV lines for the qualifying rows.
Exit code 0 always -- applying the replacements is a deliberate,
reviewed edit, not an automated rewrite.
"""
import json
import statistics
import sys


def mad2(xs, med):
    return 2.0 * statistics.median(abs(x - med) for x in xs)


def main():
    base_path, runs = sys.argv[1], sys.argv[2:]
    committed = {}
    for ln in open(base_path):
        if ln.startswith("#") or not ln.strip():
            continue
        q, m, sp = ln.split("\t")[:3]
        committed[q] = (float(m), float(sp))

    pooled = {}
    loads = []
    for p in runs:
        d = json.load(open(p))
        loads.append((p, d.get("load", {}), d.get("degraded")))
        for q, v in d.get("queries", {}).items():
            pooled.setdefault(q, []).extend(t for t in v.get("runs", []) if t >= 0)

    print("# pooled from:")
    for p, ld, deg in loads:
        print(f"#   {p} load={ld} degraded={deg}")

    flagged = [q for q, (m, sp) in committed.items() if m > 0 and sp / m > 0.25]
    replace, keep = [], []
    for q in sorted(flagged):
        xs = pooled.get(q, [])
        if len(xs) < 9:
            keep.append((q, f"only {len(xs)} pooled samples (<9)"))
            continue
        med = statistics.median(xs)
        if med <= 0:
            # sub-millisecond samples serialize as 0.000; a zero median
            # is unusable as a gate row (and would divide by zero below)
            keep.append((q, "pooled median 0"))
            continue
        sp = mad2(xs, med)
        cm, csp = committed[q]
        ratio = med / cm
        tight = sp / med <= 0.25
        # two-sided: >1.15x would LOOSEN the gate; <1/1.15 would commit
        # an unrepresentatively fast window as the row, and since
        # boardDrift is clamped >=1 a too-low baseline can never be
        # normalized away -- it fires falsely on every later calm run
        consistent = 1 / 1.15 <= ratio <= 1.15
        verdict = "REPLACE" if (tight and consistent) else "keep"
        detail = (f"{q}: committed {cm:.2f}+/-{csp:.2f} ({100*csp/cm:.0f}%) -> "
                  f"pooled n={len(xs)} {med:.3f}+/-{sp:.3f} ({100*sp/med:.0f}%) "
                  f"ratio {ratio:.2f} [{verdict}]")
        print(detail)
        if verdict == "REPLACE":
            replace.append((q, med, sp))
        else:
            why = []
            if not tight:
                why.append(f"pooled spread {100*sp/med:.0f}% > 25%")
            if not consistent:
                side = "> 1.15x" if ratio > 1 else "< 1/1.15 (too-fast window; clamp can't fix a low row)"
                why.append(f"pooled median {ratio:.2f}x committed {side}")
            keep.append((q, "; ".join(why)))

    print(f"\n# {len(replace)} of {len(flagged)} flagged rows qualify for replacement")
    for q, why in keep:
        print(f"# irreducible/kept {q}: {why}")
    print("# replace lines (tab-separated, paste into bench/time_baseline.tsv):")
    for q, med, sp in replace:
        print(f"{q}\t{med:.3f}\t{sp:.3f}")


if __name__ == "__main__":
    main()
