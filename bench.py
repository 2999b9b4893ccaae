"""Benchmark: steady-state training throughput on the reference's headline
smoke configuration (1D Poisson u = sin(100x), Matern52_Cos, Q = 30,
N_col = 400 — reference log: 4.9965 s / 100 epochs ~= 50 ms/epoch on CPU,
code/result_log/poisson_1d-single_sin/.../log.txt:2).

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ...}
where vs_baseline is the speedup over the reference's per-epoch wall time.
Diagnostics (accuracy parity, 2D throughput) go to stderr.

Bounded-failure contract (round-4 VERDICT #1: BENCH_r04 was rc=124 with
no output because the probe loop retried into a wedged backend until the
driver killed the process):

* The device probe gets its OWN budget (BENCH_PROBE_WAIT_S, default 300 s,
  <= 4 attempts with backoff) separate from the measurement budget, so a
  transient wedge cannot consume the whole window.
* The process emits EXACTLY ONE valid JSON line no matter what: on probe
  exhaustion it reports ``status: "device_wedged"`` plus whatever it CAN
  measure (a CPU-backend parity smoke in a subprocess) and a clearly
  labeled echo of the last known-good TPU measurement (BENCH_r*.json).
* A global deadline (BENCH_TOTAL_BUDGET_S, default 900 s) and a
  SIGTERM/SIGALRM flush guarantee the line is printed even if the driver
  times the process out mid-measurement: whatever sections completed are
  reported, the rest are skipped.
"""

import glob
import json
import os
import signal
import sys
import time

import numpy as np

REF_MS_PER_EPOCH_1D = 4.9965 / 100 * 1000   # 49.965 ms
REF_MS_PER_EPOCH_2D = 9.0589 / 100 * 1000   # 90.589 ms
REPO = os.path.dirname(os.path.abspath(__file__))

_T0 = time.time()
_TOTAL_BUDGET = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "900"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining() -> float:
    return _TOTAL_BUDGET - (time.time() - _T0)


class Result:
    """The one-JSON-line output contract. ``emit`` runs at most once —
    from main on success, from the section loop on deadline, or from the
    signal handler if the driver SIGTERMs us first."""

    def __init__(self):
        self.ms_per_epoch = None     # the headline measurement
        self.extra = {}              # status / diagnostics for the wedge path
        self._emitted = False

    def emit(self, rc: int = 0):
        if self._emitted:
            return
        self._emitted = True
        if self.ms_per_epoch is not None:
            line = {
                "metric": "1d_poisson_single_sin_N400_Q30_ms_per_epoch",
                "value": round(self.ms_per_epoch, 4),
                "unit": "ms",
                "vs_baseline": round(REF_MS_PER_EPOCH_1D / self.ms_per_epoch,
                                     2),
            }
            line.update(self.extra)
        else:
            line = {
                "metric": "1d_poisson_single_sin_N400_Q30_ms_per_epoch",
                "value": 0, "unit": "ms", "vs_baseline": 0,
            }
            line.update(self.extra)
        print(json.dumps(line), flush=True)
        # os._exit from a signal handler: no cleanup that could hang
        if rc is not None:
            os._exit(rc)


RESULT = Result()


def _flush_on_signal(signum, frame):
    log(f"signal {signum} received at t+{time.time() - _T0:.0f}s; "
        "flushing JSON")
    RESULT.extra.setdefault("status", "killed_mid_measurement")
    RESULT.emit(0)


def last_good_echo() -> dict:
    """The newest BENCH_r*.json with a parsed measurement — echoed,
    clearly labeled, when this round cannot measure."""
    best = None
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                rec = json.load(f)
            if rec.get("parsed") and rec["parsed"].get("value"):
                best = {"cached_last_good": rec["parsed"],
                        "cached_from": os.path.basename(p)}
        except Exception:
            continue
    return best or {}


def cpu_parity_smoke(timeout_s: float) -> dict:
    """100-epoch CPU-backend smoke in a subprocess: proves the software
    stack end-to-end even when the TPU terminal is wedged."""
    import subprocess
    code = (
        "import json,sys,time;"
        "from gphm_tpu.experiment import make_solver;"
        "from gphm_tpu.models.base import make_chunk_runner;"
        "from gphm_tpu.utils.config import load_config;"
        "import jax;"
        "cfg=load_config('poisson_1d-single_sin',dtype='float32',"
        "reference_protocol=True);"
        "s=make_solver(cfg);p=s.init_params();o=s.optimizer.init(p);"
        "r=make_chunk_runner(s._loss,s.optimizer);"
        "t=time.time();p,o,l=r(p,o,100);jax.block_until_ready(l);"
        "print(json.dumps({'cpu_err_100ep':float(s.eval_err(p)),"
        "'cpu_wall_100ep_s':round(time.time()-t,2)}))"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           timeout=timeout_s, capture_output=True)
        out = r.stdout.decode(errors="replace").strip().splitlines()
        for ln in reversed(out):
            if ln.startswith("{"):
                return json.loads(ln)
        log("cpu smoke produced no JSON:",
            r.stderr.decode(errors="replace")[-300:])
    except Exception as e:
        log("cpu smoke failed:", e)
    return {}


def wait_for_device() -> bool:
    """<=4 probe attempts with backoff inside BENCH_PROBE_WAIT_S (default
    300 s). The axon backend's terminal can wedge for >1 h (a serializing
    remote compiler monopolized by one giant program — PARITY "Round-4
    incident"); probing in a SUBPROCESS keeps this process's JAX runtime
    untouched so a late recovery still works."""
    import subprocess
    budget = float(os.environ.get("BENCH_PROBE_WAIT_S", "480"))
    deadline = time.time() + min(budget, max(0.0, remaining() - 120))
    for attempt in range(2):
        # ONE patient probe, maybe two: ANY killed probe client re-arms
        # a ~10-15 min lockout in the serializing terminal (measured,
        # PARITY round-5 incident notes), so rapid-fire short probes
        # perpetuate the wedge they probe for. A healthy-but-degraded
        # init can take minutes on the single-core host.
        per_try = min(450, max(10, deadline - time.time()))
        try:
            # coreutils timeout -k: SIGTERM first, SIGKILL only 10 s later.
            # A SIGKILLed client can leave a stale claim that wedges the
            # axon terminal's serializing InitRequest for every later
            # client (tools/tpu_probe.py docstring — measured round 4);
            # subprocess.run(timeout=...) kills with SIGKILL, so the old
            # probe loop could CAUSE the wedge it was probing for.
            r = subprocess.run(
                ["timeout", "-k", "10", str(int(per_try)), sys.executable,
                 os.path.join(REPO, "tools", "tpu_probe.py")],
                timeout=per_try + 20, capture_output=True)
            if r.returncode == 0:
                return True
            log(f"device probe failed rc={r.returncode} "
                f"(attempt {attempt + 1}):",
                r.stderr.decode(errors="replace")[-200:])
        except subprocess.TimeoutExpired:
            log(f"device probe hung ({per_try:.0f} s, attempt {attempt + 1})")
        if time.time() >= deadline:
            break
        time.sleep(min(30 * (attempt + 1), max(1, deadline - time.time())))
    return False


def main():
    signal.signal(signal.SIGTERM, _flush_on_signal)
    signal.signal(signal.SIGINT, _flush_on_signal)
    # hard backstop 60 s before the driver-facing budget
    signal.signal(signal.SIGALRM, _flush_on_signal)
    signal.alarm(max(60, int(_TOTAL_BUDGET)))

    if not wait_for_device():
        log("TPU wedged past the probe budget; emitting structured report")
        RESULT.extra["status"] = "device_wedged"
        RESULT.extra.update(last_good_echo())
        RESULT.extra.update(cpu_parity_smoke(max(60, min(240,
                                                         remaining() - 30))))
        RESULT.emit(0)

    import jax

    cache = os.path.join(REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:
        log("compilation cache unavailable:", e)

    import jax.numpy as jnp

    from gphm_tpu.experiment import make_solver
    from gphm_tpu.models.base import make_chunk_runner
    from gphm_tpu.utils.config import load_config

    log("backend:", jax.default_backend(), jax.devices()[0])

    # ---- headline section (always first: it feeds the JSON line) ----
    # the bench measures the reference-protocol production step (adam, f32):
    # the shipped YAML default is the profiled headline protocol (round 3)
    cfg = load_config("poisson_1d-single_sin", dtype="float32",
                      reference_protocol=True)
    solver = make_solver(cfg)

    params = solver.init_params()
    opt_state = solver.optimizer.init(params)
    run_chunk = make_chunk_runner(solver._loss, solver.optimizer)

    t0 = time.time()
    params, opt_state, loss = run_chunk(params, opt_state, 100)
    jax.block_until_ready(loss)
    log(f"compile+first 100 epochs: {time.time() - t0:.1f} s, "
        f"loss {float(loss):.6g}")
    err100 = float(solver.eval_err(params))
    log(f"rel-L2 @ 100 epochs: {err100:.4f} (reference smoke: 0.2756)")

    # Steady-state over 1000-epoch chunks: production runs dispatch
    # nepoch/20-epoch scans (5000 at the shipped budget), so per-dispatch
    # host->device latency (~25 ms through this backend's tunnel — 0.25
    # ms/epoch at chunk=100, a 20% distortion) is not part of the real
    # per-epoch cost. chunk=1000 bounds the distortion at 2%.
    params, opt_state, loss = run_chunk(params, opt_state, 1000)  # compile
    jax.block_until_ready(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        params, opt_state, loss = run_chunk(params, opt_state, 1000)
        jax.block_until_ready(loss)
        best = min(best, (time.time() - t0) / 1000 * 1000)
    RESULT.ms_per_epoch = best
    ms_per_epoch = best
    log(f"steady-state: {ms_per_epoch:.3f} ms/epoch "
        f"({1000 / ms_per_epoch:.0f} epochs/s; 1000-epoch chunks)")

    from gphm_tpu.utils.profiling import step_flops_1d
    fl = step_flops_1d(cfg.N_col, cfg.Q) * 3  # fwd + ~2x reverse mode
    log(f"approx Gram+Cholesky pipeline: "
        f"{fl / (ms_per_epoch * 1e-3) / 1e12:.3f} TFLOP/s sustained")

    # ---- optional diagnostic sections, each deadline-guarded ----
    def section(name, min_budget_s, fn):
        if remaining() < min_budget_s:
            log(f"skipping {name}: {remaining():.0f}s left < "
                f"{min_budget_s}s budget")
            return
        try:
            fn()
        except Exception as e:
            log(f"{name} failed:", e)

    def time_to_tol():
        # time-to-tolerance on the headline config (BASELINE.md rebuild
        # target "time-to-L2<1e-2"): fresh run, chunked evals, wall-clock
        # at first crossing. The chunk program is already compiled above.
        t2p = solver.init_params()
        t2o = solver.optimizer.init(t2p)
        cap, chunk, t_cross, e_cross, walls = 60000, 2000, None, None, 0.0
        for done in range(0, cap, chunk):
            t0 = time.time()
            t2p, t2o, t2l = run_chunk(t2p, t2o, chunk)
            jax.block_until_ready(t2l)
            walls += time.time() - t0
            if float(solver.eval_err(t2p)) < 1e-2:
                t_cross, e_cross = walls, done + chunk
                break
        if t_cross is None:
            log(f"time-to-1e-2: not reached within {cap} epochs "
                f"({walls:.1f}s)")
        else:
            # reference CPU extrapolation: its measured 50 ms/epoch on this
            # exact config (smoke log) x the same epoch count
            ref_s = e_cross * REF_MS_PER_EPOCH_1D / 1000
            log(f"time-to-1e-2 (1D single_sin, adam f32): {t_cross:.1f}s "
                f"at epoch <= {e_cross} (reference CPU extrapolation "
                f"{ref_s:.0f}s -> {ref_s / t_cross:.0f}x)")

    def twod():
        # 2D diagnostic (smaller epoch count; reference smoke 90.6 ms/epoch)
        cfg2 = load_config("poisson_2d-sin_sin", dtype="float32",
                           reference_protocol=True)
        solver2 = make_solver(cfg2)
        p2 = solver2.init_params()
        o2 = solver2.optimizer.init(p2)
        rc2 = make_chunk_runner(solver2._loss, solver2.optimizer)
        p2, o2, l2 = rc2(p2, o2, 500)   # compile the same program as timed
        jax.block_until_ready(l2)
        t0 = time.time()
        p2, o2, l2 = rc2(p2, o2, 500)
        jax.block_until_ready(l2)
        ms2 = (time.time() - t0) / 500 * 1000
        RESULT.extra["ms_per_epoch_2d_n400"] = round(ms2, 4)
        log(f"2D N=400: {ms2:.3f} ms/epoch "
            f"(ref {REF_MS_PER_EPOCH_2D:.1f}; speedup "
            f"{REF_MS_PER_EPOCH_2D / ms2:.1f}x)")

    def big512():
        # 512^2 dense-Kronecker step: the beyond-reference scale point,
        # with an honest machine-utilization figure
        from gphm_tpu.models.solver_2d import Solver2D
        from gphm_tpu.precision import Policy
        from gphm_tpu.problems.equations import make_problem
        from gphm_tpu.utils.profiling import step_flops_2d

        N = 512
        prob = make_problem("poisson_2d-sin_sin", N_col=N, scale=2 * np.pi,
                            dtype=jnp.float32)
        big = Solver2D(prob, "Matern52_Cos_1d",
                       dict(Q=30, lr=0.01, llk_weight=200.0, logdet=True,
                            tol=-1.0, freq_scale=20.0, jitter=1e-5),
                       Policy(dtype=jnp.float32))
        pb = big.init_params()
        ob = big.optimizer.init(pb)
        rcb = make_chunk_runner(big._loss, big.optimizer)
        pb, ob, lb = rcb(pb, ob, 200)
        jax.block_until_ready(lb)
        t0 = time.time()
        pb, ob, lb = rcb(pb, ob, 200)
        jax.block_until_ready(lb)
        ms512 = (time.time() - t0) / 200 * 1000
        fl512 = step_flops_2d(N, N, 30) * 3  # fwd + ~2x reverse
        tflops = fl512 / (ms512 * 1e-3) / 1e12
        RESULT.extra["ms_per_epoch_2d_512"] = round(ms512, 4)
        # TPU v5e peak: 197 TFLOP/s bf16; f32-highest runs multi-pass bf16,
        # so MFU is quoted against the bf16 peak (conservative)
        log(f"512^2 dense Kronecker: {ms512:.3f} ms/epoch, "
            f"{tflops:.2f} TFLOP/s sustained, MFU {tflops / 197 * 100:.1f}% "
            f"(vs 197 TFLOP/s bf16 peak; see roofline below — the MXU peak "
            f"is not this step's ceiling)")

    def roofline_sec():
        # per-phase roofline of the 512^2 step vs measured unit ceilings:
        # which unit actually binds
        sys.path.insert(0, REPO)
        from tools.roofline_2d import roofline
        roofline(512, log=log)

    def sweep():
        # DP-sweep throughput: 8 freq_scale variants trained concurrently
        # through the vmapped/sharded sweep path (parallel/sweep.py)
        from gphm_tpu.parallel.sweep import run_sweep, sweep_variants

        sweep_epochs = 2000
        scales = [5.0, 10.0, 15.0, 20.0, 25.0, 30.0, 35.0, 40.0]
        base = solver.init_params()
        batch = sweep_variants(solver, base, freq_scales=scales)
        # warm-up/compile
        run_sweep(solver, jax.tree_util.tree_map(jnp.copy, batch), 100,
                  chunk=100)
        t0 = time.time()
        _, errs, _ = run_sweep(solver, batch, sweep_epochs, chunk=1000)
        dt = time.time() - t0
        rate = len(scales) * sweep_epochs / dt
        log(f"DP sweep: {len(scales)} variants x {sweep_epochs} epochs in "
            f"{dt:.2f}s = {rate:.0f} variant-epochs/s "
            f"({rate / 1000 * ms_per_epoch:.1f}x single-run throughput); "
            f"errs {np.round(errs, 3).tolist()}")

    section("time-to-tolerance", 120, time_to_tol)
    section("2D diagnostic", 90, twod)
    section("512^2 bench", 90, big512)
    section("roofline", 60, roofline_sec)
    section("DP sweep", 120, sweep)

    RESULT.emit(0)


if __name__ == "__main__":
    main()
