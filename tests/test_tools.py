"""tools/ scripts: parity report generation from synthetic metrics."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_report_from_synthetic_metrics(tmp_path):
    d = tmp_path / "poisson_1d-single_sin" / "kernel_Matern52_Cos_1d" \
        / "epoch_100" / "Q30"
    d.mkdir(parents=True)
    recs = [
        {"fold": 0, "epoch": 0, "rel_l2": 0.9, "loss": 1e9, "wall_s": 5.0},
        {"fold": 0, "epoch": 50, "rel_l2": 0.009, "loss": 1e3,
         "wall_s": 10.0},
        {"fold": 0, "epoch": 95, "rel_l2": 0.002, "loss": 10.0,
         "wall_s": 15.0},
    ]
    with open(d / "metrics_fold0.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_report.py"),
         str(tmp_path)], capture_output=True, text=True, check=True)
    assert "poisson_1d-single_sin" in out.stdout
    assert "0.002" in out.stdout
    # time-to-1e-2 is the wall of the first sub-tolerance eval
    assert "10.0" in out.stdout
    # reference anchor is attached for known equations
    assert "0.2756" in out.stdout


def test_graft_entry_importable():
    import __graft_entry__ as g

    assert callable(g.entry)
    assert callable(g.dryrun_multichip)
