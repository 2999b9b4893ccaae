"""Metrics and run logging.

The reference observability surface is print statements, in-memory lists
sampled 20x per run, and an append-only ``log.txt`` with error mean/std,
wall-time, and stop epochs (reference: code/utils.py:600-619). Here:

  * ``MetricsLogger`` — structured JSONL, one record per evaluation point
    (epoch, loss, rel-L2, criterion, wall-time), machine-parseable.
  * ``append_text_log`` — a human-readable ``log.txt`` in the same spirit
    (and directory layout) as the reference, so existing workflows that
    tail the text log keep working.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str], append: bool = False):
        self.path = path
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            if not append:   # one file per run; resumed runs append
                open(path, "w").close()

    def log(self, **record):
        record.setdefault("wall_s", time.time() - self._t0)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record, default=float) + "\n")
        return record


def append_text_log(directory: str, run_name: str, err_dict: dict) -> str:
    """Append a human-readable summary block (reference log.txt spirit:
    code/utils.py:600-619)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, "log.txt")
    with open(path, "a") as f:
        f.write(f"{run_name}\n")
        f.write(
            "err mean: {mean:.4f}, err std: {std:.4f}, "
            "used time: {used_time:.4f} s, avg epochs: {stop_epoch_mean}\n"
            .format(**{k: err_dict.get(k, float('nan'))
                       for k in ("mean", "std", "used_time",
                                 "stop_epoch_mean")}))
        f.write("err list: %s\n\n" % (err_dict.get("err_list"),))
    return path
