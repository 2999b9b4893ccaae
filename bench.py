"""Benchmark: steady-state training throughput on the reference's headline
smoke configuration (1D Poisson u = sin(100x), Matern52_Cos, Q = 30,
N_col = 400 — reference log: 4.9965 s / 100 epochs ~= 50 ms/epoch on CPU,
code/result_log/poisson_1d-single_sin/.../log.txt:2).

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ...}
where vs_baseline is the speedup over the reference's per-epoch wall time.
Diagnostics (accuracy parity, 2D throughput) go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

REF_MS_PER_EPOCH_1D = 4.9965 / 100 * 1000   # 49.965 ms
REF_MS_PER_EPOCH_2D = 9.0589 / 100 * 1000   # 90.589 ms


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def wait_for_device(max_wait_s: float) -> bool:
    """Block until a trivial device op completes (True) or give up (False).

    The axon backend's terminal can wedge for >1 h (a serializing remote
    compiler monopolized by one giant program — observed 2026-08-20, see
    PARITY "Round-4 incident"). A wedged device would hang this process
    at the first array op with no output; probing in a SUBPROCESS keeps
    this process's JAX runtime untouched so a late recovery still works.
    """
    import subprocess
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "tools", "tpu_probe.py")],
                timeout=120, capture_output=True)
            if r.returncode == 0:
                return True
            log("device probe failed; retrying",
                r.stderr.decode(errors="replace")[-200:])
        except subprocess.TimeoutExpired:
            log("device probe hung (120 s); retrying")
        if time.time() >= deadline:
            return False
        time.sleep(60)


def main():
    import jax

    budget = float(os.environ.get("BENCH_DEVICE_WAIT_S", "1800"))
    try:
        healthy = wait_for_device(budget)
    except Exception as e:  # probe subprocess timeout etc.
        log("device probe errored:", e)
        healthy = False
    if not healthy:
        print(json.dumps({
            "metric": "per_epoch_ms_1d_n400", "value": 0, "unit": "ms",
            "vs_baseline": 0,
            "error": "TPU terminal unresponsive past probe budget "
                     "(see PARITY 'Round-4 incident'); no measurement",
        }))
        return

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
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
    ms_per_epoch = best
    log(f"steady-state: {ms_per_epoch:.3f} ms/epoch "
        f"({1000 / ms_per_epoch:.0f} epochs/s; 1000-epoch chunks)")

    from gphm_tpu.utils.profiling import step_flops_1d
    fl = step_flops_1d(cfg.N_col, cfg.Q) * 3  # fwd + ~2x reverse mode
    log(f"approx Gram+Cholesky pipeline: "
        f"{fl / (ms_per_epoch * 1e-3) / 1e12:.3f} TFLOP/s sustained")

    # time-to-tolerance on the headline config (BASELINE.md rebuild target
    # "time-to-L2<1e-2"): fresh run, chunked evals, wall-clock at first
    # crossing. The chunk program is already compiled above.
    try:
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
    except Exception as e:
        log("time-to-tolerance failed:", e)

    # 2D diagnostic (smaller epoch count; reference smoke 90.6 ms/epoch)
    try:
        cfg2 = load_config("poisson_2d-sin_sin", dtype="float32")
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
        log(f"2D N=400: {ms2:.3f} ms/epoch "
            f"(ref {REF_MS_PER_EPOCH_2D:.1f}; speedup "
            f"{REF_MS_PER_EPOCH_2D / ms2:.1f}x)")
    except Exception as e:
        log("2D diagnostic failed:", e)

    # 512^2 dense-Kronecker step: the beyond-reference scale point, with an
    # honest machine-utilization figure (VERDICT round-1 weak #1/#6)
    try:
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
        # TPU v5e peak: 197 TFLOP/s bf16; f32-highest runs multi-pass bf16,
        # so MFU is quoted against the bf16 peak (conservative)
        log(f"512^2 dense Kronecker: {ms512:.3f} ms/epoch, "
            f"{tflops:.2f} TFLOP/s sustained, MFU {tflops / 197 * 100:.1f}% "
            f"(vs 197 TFLOP/s bf16 peak; see roofline below — the MXU peak "
            f"is not this step's ceiling)")
    except Exception as e:
        log("512^2 bench failed:", e)

    # per-phase roofline of the 512^2 step vs measured unit ceilings
    # (round-3 VERDICT #7): which unit actually binds
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.roofline_2d import roofline
        roofline(512, log=log)
    except Exception as e:
        log("roofline failed:", e)

    # DP-sweep throughput: 8 freq_scale variants trained concurrently
    # through the vmapped/sharded sweep path (parallel/sweep.py)
    try:
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
    except Exception as e:
        log("DP sweep bench failed:", e)

    print(json.dumps({
        "metric": "1d_poisson_single_sin_N400_Q30_ms_per_epoch",
        "value": round(ms_per_epoch, 4),
        "unit": "ms",
        "vs_baseline": round(REF_MS_PER_EPOCH_1D / ms_per_epoch, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
