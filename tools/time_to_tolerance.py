"""Time-to-tolerance table from metrics JSONL streams (round-3 VERDICT #6;
BASELINE.md rebuild target "time-to-L2<1e-2").

Scans run directories (default: artifacts + every result_log* in the repo)
for ``metrics_fold0.jsonl`` streams and reports, per run, the wall-clock
time and epoch of the FIRST crossing of rel-L2 < 1e-2 and < 1e-3, plus the
reference-CPU extrapolation for that epoch count.

Wall times are the logger's run-relative stamps, so they INCLUDE jit
compilation. The reference extrapolation uses the reference's measured
per-epoch wall on its two shipped smoke anchors (1D N=400: 50.0 ms/epoch,
2D 400^2: 90.6 ms/epoch, code/result_log/*/log.txt). For configs at other
N the family anchor is used unchanged — a LOWER bound on the reference cost
for N > 400 (its dense LU work grows ~N^3) and an upper bound for N < 400.

Usage: python tools/time_to_tolerance.py [dir ...] [--markdown]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REF_MS = {"1d": 49.965, "2d": 90.589}
EQ_2D = ("poisson_2d", "allencahn_2d", "advection")


def family(equation: str) -> str:
    return "2d" if equation.startswith(EQ_2D) else "1d"


def crossings(metrics_path: str):
    """(epoch, wall_s) of the first <1e-2 and <1e-3 crossings (+ min err)."""
    c2 = c3 = None
    min_err, n = float("inf"), 0
    last_wall = 0.0
    with open(metrics_path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if "rel_l2" not in r:
                continue
            err, ep = float(r["rel_l2"]), int(r.get("epoch", 0))
            wall = float(r.get("wall_s", 0.0))
            last_wall = max(last_wall, wall)
            n += 1
            if err == err:          # skip NaN
                min_err = min(min_err, err)
                if c2 is None and err < 1e-2:
                    c2 = (ep, wall)
                if c3 is None and err < 1e-3:
                    c3 = (ep, wall)
    return c2, c3, min_err, n, last_wall


def collect(bases):
    rows = []
    for base in bases:
        for metrics in sorted(glob.glob(os.path.join(
                base, "**", "metrics_fold0.jsonl"), recursive=True)):
            parts = os.path.dirname(metrics).split(os.sep)
            eq = next((p for p in parts if "-" in p and not
                       p.startswith(("kernel", "epoch", "Q"))), parts[-4])
            c2, c3, min_err, n, wall = crossings(metrics)
            if not n:
                continue
            rows.append(dict(base=base, equation=eq, metrics=metrics,
                             c2=c2, c3=c3, min_err=min_err,
                             n_evals=n, wall=wall))
    return rows


def fmt(c, eq):
    if c is None:
        return "—", "—"
    ep, wall = c
    ref_s = ep * REF_MS[family(eq)] / 1000
    speed = f"{ref_s / wall:.0f}x" if wall > 0 else "—"
    return f"{wall:.0f}s @ep {ep}", f"{ref_s:.0f}s ({speed})"


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    bases = args or (["artifacts"]
                     + sorted(glob.glob("result_log*")))
    rows = collect(bases)
    print("| equation | run | t(<1e-2) | ref-CPU extrap | t(<1e-3) "
          "| min rel-L2 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        t2, ref2 = fmt(r["c2"], r["equation"])
        t3, _ = fmt(r["c3"], r["equation"])
        tag = os.path.relpath(os.path.dirname(r["metrics"]),
                              r["base"]).split(os.sep)
        tag = "/".join(p for p in tag if p.startswith(("kernel", "epoch")))
        print(f"| {r['equation']} | {r['base']}:{tag} | {t2} | {ref2} "
              f"| {t3} | {r['min_err']:.2e} |")


if __name__ == "__main__":
    main(sys.argv[1:])
