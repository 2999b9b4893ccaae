"""Time-to-tolerance table from metrics JSONL streams (round-3 VERDICT #6;
BASELINE.md rebuild target "time-to-L2<1e-2").

Scans run directories (default: artifacts + every result_log* in the repo)
for ``metrics_fold0.jsonl`` streams and reports, per run, the wall-clock
time and epoch of the FIRST crossing of rel-L2 < 1e-2 and < 1e-3, plus a
reference-CPU baseline for the same equation.

The reference baseline is honest about what is actually known:

* The reference ships no error trajectories (its ``log.txt`` records only
  final errors, code/result_log/*/log.txt), but this repo's adam-protocol
  runs reproduce the reference trajectory to ~1e-13
  (tests/test_reference_parity.py), so an adam-mode stream's first
  crossing epoch IS the reference's crossing epoch; the baseline is that
  epoch times the reference's measured per-epoch wall (1D N=400:
  49.965 ms, 2D 400^2: 90.589 ms — its two shipped smoke anchors).
* If the scanned adam streams for an equation never cross, the baseline
  is a LOWER bound: the largest adam epoch actually OBSERVED in any
  stream (not the configured budget — a wall-capped stream's evidence
  stops at its last eval) times the per-epoch wall, printed with ``>``.
* With no adam stream at all, the fallback is the same-epoch
  extrapolation (reference per-epoch wall at the row's own crossing
  epoch), printed with ``>=`` — a gross lower bound for reduced-budget
  engines, since the reference needs far more epochs to descend.

Wall times are the logger's run-relative stamps, so they INCLUDE jit
compilation. For configs at other N the family anchor is used unchanged —
a lower bound on the reference cost for N > 400 (its dense LU work grows
~N^3) and an upper bound for N < 400; the two-GP extra phase is costed at
the same anchor (an underestimate of the reference's two-model step).

Usage: python tools/time_to_tolerance.py [dir ...]
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
    last_wall, last_epoch = 0.0, 0
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
            last_epoch = max(last_epoch, ep)
            n += 1
            if err == err:          # skip NaN
                min_err = min(min_err, err)
                if c2 is None and err < 1e-2:
                    c2 = (ep, wall)
                if c3 is None and err < 1e-3:
                    c3 = (ep, wall)
    return c2, c3, min_err, n, last_wall, last_epoch


def run_meta(run_dir: str) -> dict:
    """Checkpoint JSON sidecar meta (u_mode etc.), {} if absent."""
    for name in ("latest.npz.json", "params_fold0.npz.json",
                 "params_best_fold0.npz.json"):
        path = os.path.join(run_dir, name)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    return json.load(f).get("meta", {}) or {}
            except (ValueError, OSError):
                return {}
    return {}


def budget_epochs(run_dir: str, fallback: int) -> int:
    """Configured epoch budget, parsed from the epoch_<N> path segment."""
    for part in run_dir.split(os.sep):
        if part.startswith("epoch_"):
            try:
                return int(part[len("epoch_"):])
            except ValueError:
                pass
    return fallback


def collect(bases):
    seen = {}
    for base in bases:
        for metrics in sorted(glob.glob(os.path.join(
                base, "**", "metrics_fold0.jsonl"), recursive=True)):
            run_dir = os.path.dirname(metrics)
            parts = os.path.relpath(run_dir, base).split(os.sep)
            eq = next((p for p in parts if "-" in p and not
                       p.startswith(("kernel", "epoch", "Q"))), parts[-4])
            c2, c3, min_err, n, wall, last_ep = crossings(metrics)
            if not n:
                continue
            # The same stream often exists twice — in the committed
            # artifacts/ archive (where the campaign tag is the first
            # path component) and in a (restored) result_log_<tag>
            # working dir (where it is part of the base name). One table
            # row per distinct stream: key on (tag, run-relative path)
            # ALONE and keep the copy with the most observed epochs — a
            # restored-and-resumed working dir supersedes its own stale
            # artifacts snapshot (advisor round-4 finding).
            rel = os.path.relpath(run_dir, base)
            tag = os.path.basename(base.rstrip(os.sep))
            if tag == "artifacts":
                tag, _, rel = rel.partition(os.sep)
            tag = tag.replace("result_log_", "")
            key = (tag, rel)
            meta = run_meta(run_dir)
            # Streams predating the u_mode field are all adam-protocol.
            row = dict(base=base, tag=tag, equation=eq, metrics=metrics,
                       c2=c2, c3=c3, min_err=min_err,
                       n_evals=n, wall=wall, last_ep=last_ep,
                       u_mode=meta.get("u_mode", "adam"),
                       budget=budget_epochs(run_dir, last_ep))
            prev = seen.get(key)
            if prev is None or last_ep > prev["last_ep"]:
                seen[key] = row
    return list(seen.values())


def adam_baselines(rows):
    """Per equation: the best adam-protocol evidence for the reference's
    time-to-1e-2 — a crossing epoch if any adam stream crossed, else the
    largest adam epoch OBSERVED without a crossing (a lower bound; the
    configured epoch_<N> budget is NOT evidence when the stream was
    wall-capped before reaching it)."""
    ref = {}
    for r in rows:
        if r["u_mode"] != "adam":
            continue
        eq, cur = r["equation"], ref.get(r["equation"])
        if r["c2"] is not None:
            ep = r["c2"][0]
            if cur is None or not cur["crossed"] or ep < cur["ep"]:
                ref[eq] = dict(crossed=True, ep=ep)
        elif cur is None or (not cur["crossed"]
                             and r["last_ep"] > cur["ep"]):
            ref[eq] = dict(crossed=False, ep=r["last_ep"])
    return ref


def fmt_cross(c):
    return "—" if c is None else f"{c[1]:.0f}s @ep {c[0]}"


def fmt_ref(c2, eq, ref):
    """Reference-CPU baseline column for a row that crossed at c2."""
    if c2 is None:
        return "—"
    wall = max(c2[1], 1e-9)
    ms = REF_MS[family(eq)]
    base = ref.get(eq)
    if base is not None and base["crossed"]:
        ref_s = base["ep"] * ms / 1000
        return f"{ref_s:.0f}s ({ref_s / wall:.0f}x, adam ep {base['ep']})"
    if base is not None:
        ref_s = base["ep"] * ms / 1000
        return (f">{ref_s:.0f}s (>{ref_s / wall:.0f}x; adam not <1e-2 "
                f"in {base['ep']} ep)")
    ref_s = c2[0] * ms / 1000
    return f">={ref_s:.0f}s (>={ref_s / wall:.1f}x, same-epoch bound)"


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    bases = args or (["artifacts"]
                     + sorted(glob.glob("result_log*")))
    rows = collect(bases)
    ref = adam_baselines(rows)
    print("| equation | run | engine | t(<1e-2) | ref-CPU baseline "
          "| t(<1e-3) | min rel-L2 |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        tag = os.path.relpath(os.path.dirname(r["metrics"]),
                              r["base"]).split(os.sep)
        tag = "/".join(p for p in tag if p.startswith(("kernel", "epoch")))
        print(f"| {r['equation']} | {r['tag']}:{tag} | {r['u_mode']} "
              f"| {fmt_cross(r['c2'])} | {fmt_ref(r['c2'], r['equation'], ref)} "
              f"| {fmt_cross(r['c3'])} | {r['min_err']:.2e} |")


if __name__ == "__main__":
    main(sys.argv[1:])
