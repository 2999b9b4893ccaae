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


def _write_stream(root, eq, epoch_budget, recs, u_mode=None, extra=""):
    d = root / eq / f"kernel_Matern52_Cos_1d{extra}" \
        / f"epoch_{epoch_budget}" / "Q30"
    d.mkdir(parents=True)
    with open(d / "metrics_fold0.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    if u_mode is not None:
        with open(d / "latest.npz.json", "w") as f:
            json.dump({"meta": {"u_mode": u_mode}}, f)
    return d


def test_time_to_tolerance_adam_baseline(tmp_path):
    """The reference-CPU column uses the adam-protocol stream's crossing
    epoch (trajectory parity makes it the reference's own crossing), a >
    lower bound when no adam stream crossed, and a same-epoch >= bound
    when no adam stream exists at all."""
    rec = lambda ep, err, w: {"fold": 0, "epoch": ep, "rel_l2": err,
                              "wall_s": w}
    # adam stream crosses 1e-2 at epoch 5000
    _write_stream(tmp_path, "poisson_1d-single_sin", 10000,
                  [rec(0, 0.9, 1.0), rec(5000, 0.009, 30.0),
                   rec(10000, 0.004, 60.0)], u_mode="adam")
    # profiled stream crosses at epoch 100 in 10 s
    _write_stream(tmp_path, "poisson_1d-single_sin", 200,
                  [rec(0, 0.9, 1.0), rec(100, 0.008, 10.0)],
                  u_mode="profiled", extra="-p")
    # an equation whose only adam stream never crossed its 1e6 budget
    _write_stream(tmp_path, "poisson_1d-x2_add_sinx", 1000000,
                  [rec(0, 0.9, 1.0), rec(1000000, 0.4, 900.0)],
                  u_mode="adam")
    _write_stream(tmp_path, "poisson_1d-x2_add_sinx", 300,
                  [rec(0, 0.9, 1.0), rec(200, 0.008, 20.0)],
                  u_mode="profiled", extra="-p")
    # no adam stream at all -> same-epoch bound
    _write_stream(tmp_path, "poisson_1d-mix_sin", 300,
                  [rec(0, 0.9, 1.0), rec(200, 0.008, 20.0)],
                  u_mode="profiled")
    # a wall-capped adam stream: configured budget 1e6, evidence stops at
    # the last OBSERVED eval (ep 200000) -> the lower bound must use the
    # observed epoch, not the epoch_1000000 path segment
    _write_stream(tmp_path, "poisson_1d-x_time_sinx", 1000000,
                  [rec(0, 0.9, 1.0), rec(200000, 0.04, 700.0)],
                  u_mode="adam")
    _write_stream(tmp_path, "poisson_1d-x_time_sinx", 300,
                  [rec(0, 0.9, 1.0), rec(200, 0.008, 20.0)],
                  u_mode="profiled", extra="-p")

    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "time_to_tolerance.py"),
         str(tmp_path)], capture_output=True, text=True, check=True)
    # adam crossing epoch 5000 -> ref 5000*49.965ms ~ 250s; profiled wall
    # 10s -> 25x
    assert "(25x, adam ep 5000)" in out.stdout
    # not-crossed 1e6 budget -> >49965s lower bound over 20s wall
    assert ">49965s (>2498x; adam not <1e-2 in 1000000 ep)" in out.stdout
    # no adam stream: same-epoch bound 200*49.965ms ~ 10s over 20s wall
    assert ">=10s (>=0.5x, same-epoch bound)" in out.stdout
    # wall-capped adam stream: bound from the observed epoch 200000
    # (200000*49.965ms ~ 9993s over 20s wall), NOT the configured 1e6
    assert ">9993s (>500x; adam not <1e-2 in 200000 ep)" in out.stdout


def test_graft_entry_importable():
    import __graft_entry__ as g

    assert callable(g.entry)
    assert callable(g.dryrun_multichip)


def test_archive_streams_roundtrip_keeps_resume_checkpoint(tmp_path):
    """Archiving must preserve the resume checkpoint npz IN FULL (the
    round-4 rotation lost a 222k-epoch stream because only the JSON
    sidecar was archived), and --restore must rebuild a result_log dir
    the experiment layer's --resume can find."""
    src = tmp_path / "result_log_abc"
    d = src / "poisson_1d-mix_sin" / "kernel_Matern52_Cos_1d" \
        / "epoch_1000" / "Q30"
    d.mkdir(parents=True)
    (d / "metrics_fold0.jsonl").write_text('{"epoch": 0}\n')
    (d / "log.txt").write_text("err 0.5\n")
    # a REAL (tiny) npz: archive() validates npz readability post-copy
    import numpy as _np
    _np.savez(d / "latest.npz", leaf_0=_np.arange(3.0))
    npz_bytes = (d / "latest.npz").read_bytes()
    (d / "latest.npz.json").write_text('{"num_leaves": 1}')
    (d / "debug_scratch.bin").write_bytes(b"x")  # must NOT be archived

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "archive_streams.py"),
         str(src)], capture_output=True, text=True, check=True,
        cwd=tmp_path, env=env)

    arch = tmp_path / "artifacts" / "abc" / "poisson_1d-mix_sin" \
        / "kernel_Matern52_Cos_1d" / "epoch_1000" / "Q30"
    assert (arch / "latest.npz").read_bytes() == npz_bytes
    assert (arch / "latest.npz.json").exists()
    assert (arch / "metrics_fold0.jsonl").exists()
    assert not (arch / "debug_scratch.bin").exists()

    # wipe the working dir (round rotation), then restore it
    import shutil as _sh
    _sh.rmtree(src)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "archive_streams.py"),
         "--restore", "abc"], capture_output=True, text=True, check=True,
        cwd=tmp_path, env=env)
    rest = tmp_path / "result_log_abc" / "poisson_1d-mix_sin" \
        / "kernel_Matern52_Cos_1d" / "epoch_1000" / "Q30"
    assert (rest / "latest.npz").read_bytes() == npz_bytes
    assert (rest / "log.txt").exists()

    # restore must NOT clobber a newer working-dir copy (advisor r4):
    # resume the stream (newer metrics), restore again, file survives
    import time as _time
    _time.sleep(0.02)
    (rest / "metrics_fold0.jsonl").write_text('{"epoch": 99}\n')
    newer = (rest / "metrics_fold0.jsonl").read_text()
    os.utime(rest / "metrics_fold0.jsonl")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "archive_streams.py"),
         "--restore", "abc"], capture_output=True, text=True, check=True,
        cwd=tmp_path, env=env)
    assert "skip (destination newer)" in out.stdout
    assert (rest / "metrics_fold0.jsonl").read_text() == newer
