"""Archive campaign streams into the committed ``artifacts/`` tree.

``result_log*`` directories are gitignored and get wiped in round
rotations (measured: the round-3 judge read result_log_r3w directly, and
by round 4 it was gone — PARITY numbers kept only textual provenance).
This tool copies the durable essentials of each run — ``log.txt``,
``metrics_fold0.jsonl``, and the resume/best checkpoints IN FULL (npz +
JSON sidecars; see META below for why sidecar-only archiving was
retired) — into ``artifacts/<campaign>/...`` so the crossing table and
headline numbers stay verifiable — and resumable — from the repo alone.

``--restore <tag>`` copies ``artifacts/<tag>`` back to
``result_log_<tag>`` so ``--resume`` finds the stream after a rotation;
files already present at the destination and newer than the archive are
left alone (never clobber live work with stale archive copies).

Usage: python tools/archive_streams.py [result_log_dir ...]
       (default: every result_log_r4* / result_log_r5* in the repo root)
       python tools/archive_streams.py --restore <tag> [...]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

KEEP = ("log.txt", "metrics_fold0.jsonl")
# The resume checkpoint (weights + opt state) and the best-params
# snapshot are archived IN FULL, not just their JSON sidecars: round 4
# measured the cost of sidecar-only archiving when the machine rotated
# mid-campaign and the mix_sin reference-stream resume leg found only
# latest.npz.json — 222,500 epochs of stream unresumable. latest.npz is
# 3-17 KB for 1D runs and ~2 MB for the largest 2D grid, cheap against
# the wall-clock it protects.
META = ("latest.npz", "latest.npz.json",
        "params_best_fold0.npz", "params_best_fold0.npz.json",
        "params_fold0.npz", "params_fold0.npz.json")


def archive(base: str, dest_root: str = "artifacts") -> int:
    n = 0
    tag = os.path.basename(base.rstrip(os.sep)).replace("result_log_", "")
    for dirpath, _, files in os.walk(base):
        chosen = [f for f in files if f in KEEP]
        chosen += [f for f in META if f in files]
        if not chosen:
            continue
        rel = os.path.relpath(dirpath, base)
        dest = os.path.join(dest_root, tag, rel)
        os.makedirs(dest, exist_ok=True)
        for f in chosen:
            src_f, dst_f = os.path.join(dirpath, f), os.path.join(dest, f)
            shutil.copy2(src_f, dst_f)
            if f.endswith(".npz") and not _npz_ok(dst_f):
                # a live run writes latest.npz concurrently; the writer is
                # atomic (utils/checkpoint.py tmp+os.replace) but re-copy
                # once in case the copy raced the replace
                shutil.copy2(src_f, dst_f)
                if not _npz_ok(dst_f):
                    print(f"WARNING: archived npz unreadable, skipped: "
                          f"{dst_f}")
                    os.remove(dst_f)
                    continue
            n += 1
    return n


def _npz_ok(path: str) -> bool:
    try:
        import numpy as np
        with np.load(path) as d:
            d.files
        return True
    except Exception:
        return False


def restore(tag: str, src_root: str = "artifacts") -> int:
    """Copy ``artifacts/<tag>`` back to ``result_log_<tag>`` so that
    ``--resume`` finds the stream after a round rotation wiped it."""
    src = os.path.join(src_root, tag)
    if not os.path.isdir(src):
        print(f"no archived campaign at {src}")
        return 0
    dest = f"result_log_{tag}"
    n = 0
    for dirpath, _, files in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        os.makedirs(os.path.join(dest, rel), exist_ok=True)
        for f in files:
            src_f = os.path.join(dirpath, f)
            dst_f = os.path.join(dest, rel, f)
            if os.path.exists(dst_f) \
                    and os.path.getmtime(dst_f) >= os.path.getmtime(src_f):
                # a working dir already holds this file at least as new as
                # the archive — e.g. --restore typed mid-campaign. Never
                # clobber newer metrics/checkpoints with stale copies (the
                # data-loss class this tool exists to remediate). The file
                # still counts as restored-state-present (a second
                # --restore of an intact stream is a success, not rc 1).
                print(f"skip (destination newer): {dst_f}")
                n += 1
                continue
            shutil.copy2(src_f, dst_f)
            n += 1
    return n


def main(argv):
    if argv and argv[0] == "--restore":
        total = 0
        for tag in argv[1:]:
            n = restore(tag.replace("result_log_", ""))
            print(f"{tag}: {n} files restored")
            total += n
        return 0 if total else 1
    bases = argv or sorted(glob.glob("result_log_r4*")
                           + glob.glob("result_log_r5*"))
    total = 0
    for base in bases:
        n = archive(base)
        print(f"{base}: {n} files archived")
        total += n
    return 0 if total else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
