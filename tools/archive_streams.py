"""Archive campaign streams into the committed ``artifacts/`` tree.

``result_log*`` directories are gitignored and get wiped in round
rotations (measured: the round-3 judge read result_log_r3w directly, and
by round 4 it was gone — PARITY numbers kept only textual provenance).
This tool copies the durable essentials of each run — ``log.txt``,
``metrics_fold0.jsonl``, and the checkpoint's JSON meta sidecar — into
``artifacts/<campaign>/...`` so the crossing table and headline numbers
stay verifiable from the repo alone.

Usage: python tools/archive_streams.py [result_log_dir ...]
       (default: every result_log_r4* in the repo root)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

KEEP = ("log.txt", "metrics_fold0.jsonl")
META = ("latest.npz.json", "params_best_fold0.npz.json",
        "params_fold0.npz.json")


def archive(base: str, dest_root: str = "artifacts") -> int:
    n = 0
    tag = os.path.basename(base.rstrip(os.sep)).replace("result_log_", "")
    for dirpath, _, files in os.walk(base):
        chosen = [f for f in files if f in KEEP]
        meta = next((f for f in META if f in files), None)
        if meta:
            chosen.append(meta)
        if not chosen:
            continue
        rel = os.path.relpath(dirpath, base)
        dest = os.path.join(dest_root, tag, rel)
        os.makedirs(dest, exist_ok=True)
        for f in chosen:
            shutil.copy2(os.path.join(dirpath, f), os.path.join(dest, f))
            n += 1
    return n


def main(argv):
    bases = argv or sorted(glob.glob("result_log_r4*"))
    total = 0
    for base in bases:
        n = archive(base)
        print(f"{base}: {n} files archived")
        total += n
    return 0 if total else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
