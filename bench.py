"""Headline benchmark: ABR rollout collection rate on one TPU chip.

Prints ONE JSON line:
  {"metric": "abr_env_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N}

vs_baseline compares against the reference's actual stack measured by
benchmarks/measure_baseline.py on this machine (BASELINE.md):
  - reference MANSYEnv + torch Actor, serial:  946 steps/s
  - torch-CPU MTIO training:                   18.3 samples/s  (secondary)

The ABR benchmark runs the full production path: policy forward (MansyActorCritic)
+ pyramid allocation + trace-download while-loop + QoE + history rolls across
vmapped env lanes under one jitted scan, on real Jin2022/4G data when
available (synthetic tables of identical shape otherwise).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Reference stack measured on this host by benchmarks/measure_baseline.py:
# the reference's ACTUAL MANSYEnv + Simulator + torch Actor stepped serially
# (its test loop / one Collector lane): 946 steps/s with the policy forward,
# 2,142 env-only.  vs_baseline uses the env+policy number — the bench's
# collector also runs the policy every step.
BASELINE_ENV_STEPS = 946.0
BASELINE_MTIO_SAMPLES = 18.3

# TPU v5e peak: 197 TFLOP/s (bf16 MXU).  MFU is reported against this peak
# regardless of compute dtype, the standard convention.
PEAK_FLOPS_V5E = 197e12

# Fallback FLOP estimate for the MTIO parity config (bs 512, d_model 512,
# f32, AR decode): XLA's own cost_analysis of the train step, measured in
# round 3 (artifacts/round3/decode_scaling.json, fut_window=15).  Used to
# derive MFU when the live cost_analysis would need a fresh compile that
# the wall-clock budget can't afford (BENCH_r04 died exactly there).
MTIO_PARITY_GFLOP_PER_SAMPLE = 288.9 / 512.0

# Wall-clock budget for the whole bench (seconds).  The driver kills the
# process on its own timeout (BENCH_r04: rc=124 with all measurements done
# but no JSON printed); everything after the ABR headline is printed is
# best-effort and checks this deadline.
BENCH_BUDGET = float(os.environ.get("MANSY_BENCH_BUDGET", "480"))
T_START = time.time()


def remaining():
    return BENCH_BUDGET - (time.time() - T_START)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def steady_rate(step_once, min_seconds=3.0, chunk=10):
    """Steady-state steps/sec with an unambiguous sync.

    ``step_once()`` runs one iteration and returns a small device array.
    After each ``chunk`` of iterations the result is pulled to the host
    (``float(...)``) — a hard dependency barrier that works even where an
    experimental platform's ``block_until_ready`` is a weak fence.  Runs
    until ``min_seconds`` of measured wall time so dispatch noise amortizes.
    Returns (iters, seconds).
    """
    total, t0 = 0, time.time()
    while True:
        out = None
        for _ in range(chunk):
            out = step_once()
        float(jnp_ravel_first(out))
        total += chunk
        dt = time.time() - t0
        if dt >= min_seconds:
            return total, dt


def dispersion(vals, digits=1):
    """{median, min, max} over repeated measurements (VERDICT r3 weak #3:
    the tunnel's run-to-run swing is ~25%, so a single number is ambiguous —
    every headline now carries its spread)."""
    import statistics
    ok = [v for v in vals if v is not None]
    if not ok:
        return None
    return {"median": round(statistics.median(ok), digits),
            "min": round(min(ok), digits), "max": round(max(ok), digits)}


def jnp_ravel_first(x):
    import jax
    leaves = jax.tree_util.tree_leaves(x)
    return leaves[0].reshape(-1)[0]


def flops_of(jitted, *args):
    """XLA's own flop estimate for one call of a jitted function, or None."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception as e:
        log(f"[bench] cost_analysis unavailable: {e!r}")
        return None


def bench_abr(n_lanes=8192, n_steps=128, iters=4, profile_dir=None,
              n_repeats=3):
    import jax
    import jax.numpy as jnp

    import mansy_immersivevideostreaming_tpu as mansy
    from mansy_immersivevideostreaming_tpu.models.abr_nets import MansyActorCritic
    from mansy_immersivevideostreaming_tpu.rl.rollout import init_lanes, make_collector
    from mansy_immersivevideostreaming_tpu.sim.env import (
        generate_environment_samples, observe_mansy,
    )

    cfg = mansy.default_config()
    data_ok = os.path.isdir(os.path.join(cfg.datasets_base_dir, "Jin2022"))
    if data_ok:
        from mansy_immersivevideostreaming_tpu.sim.tables import build_sim_tables
        vids = cfg.video_split["Jin2022"]["train"]
        users = cfg.user_split["Jin2022"]["train"]
        traces = cfg.network_split["4G"]["train"]
        tables = build_sim_tables(cfg, "Jin2022", "4G", vids, users, traces,
                                  cfg.qoe_split["train"])
        samples = jnp.asarray(generate_environment_samples(
            len(vids), len(users), len(traces), 4))
        log(f"[bench] real Jin2022/4G tables: {len(vids)} videos x "
            f"{len(users)} users x {len(traces)} traces")
    else:
        from mansy_immersivevideostreaming_tpu.sim.tables import synthetic_sim_tables
        tables = synthetic_sim_tables(num_videos=8, num_users=8, num_traces=8,
                                      num_chunks=60, num_qoe=4)
        samples = jnp.asarray(generate_environment_samples(8, 8, 8, 4))
        log("[bench] dataset tree unavailable -> synthetic tables")

    policy = MansyActorCritic(hidden_dim=128, action_space=15)
    t0 = time.time()
    state0 = init_lanes(tables, samples, n_lanes)
    obs0 = jax.jit(jax.vmap(lambda s: observe_mansy(tables, s)))(state0)
    params = jax.jit(policy.init)(jax.random.PRNGKey(0), obs0)["params"]
    jax.block_until_ready(params)
    log(f"[bench] abr init: {time.time() - t0:.1f}s")
    apply_fn = lambda p, o: policy.apply({"params": p}, o)

    collect = make_collector(apply_fn, observe_mansy, tables, samples,
                             n_lanes, n_steps, train=True)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    states, traj, logs, lv = collect(params, state0, key)
    jax.block_until_ready(traj.reward)
    log(f"[bench] abr compile+first run: {time.time() - t0:.1f}s")

    box = {"states": states, "i": 0}

    def one_collect():
        box["i"] += 1
        s, traj, logs, lv = collect(params, box["states"],
                                    jax.random.fold_in(key, box["i"]))
        box["states"] = s
        return traj.reward

    rates = []
    with _maybe_profile(profile_dir, "abr"):
        for r in range(n_repeats):
            iters_done, dt = steady_rate(one_collect, min_seconds=8.0,
                                         chunk=iters)
            rates.append(iters_done * n_lanes * n_steps / dt)
            log(f"[bench] abr rollout repeat {r + 1}/{n_repeats}: {n_lanes} "
                f"lanes x {n_steps} steps x {iters_done} iters in {dt:.2f}s "
                f"-> {rates[-1]:,.0f} env-steps/s")
    import statistics
    rate = statistics.median(rates)
    flops = flops_of(collect, params, states, key)
    mfus = None
    if flops:
        # cost_analysis counts the collector's n_steps-long lax.scan body
        # ONCE (see bench_mtio), so `flops` is one env step over all lanes;
        # per-env-step flops = flops / n_lanes.  MFU is rate-proportional
        # (constant FLOP/step), so derive per repeat.
        mfus = [f_rate * (flops / n_lanes) / PEAK_FLOPS_V5E
                for f_rate in rates]
        log(f"[bench] abr collect: {flops / 1e9:.2f} GFLOP/scan-body "
            f"({flops / n_lanes / 1e6:.2f} MFLOP/env-step) -> "
            f"MFU {statistics.median(mfus) * 100:.2f}% of v5e bf16 peak")
    return rates, mfus


def bench_mtio(bs=512, iters=6, d_model=512, dim_feedforward=512,
               profile_dir=None, n_batches=32, bf16=False,
               teacher_forcing=False, n_repeats=3, deadline=None):
    """MTIO train throughput via the PRODUCTION path: the on-device epoch
    scan (vp_train.train_epoch, one dispatch per n_batches minibatches).

    Timing a per-step host loop through the axon tunnel measures dispatch
    latency, not device time (and the tunnel's block_until_ready is a weak
    fence — round-2's 8.3% 'MFU' was a dispatch artifact).  The epoch scan
    amortizes the tunnel out of the loop and is exactly what cli/run_models
    runs, so its samples/s IS the deliverable number.
    """
    import jax
    import jax.numpy as jnp

    # The first-epoch compile below is the single longest uninterruptible
    # step (263 s cold in BENCH_r04); entering it with less budget than it
    # needs turns a clean rc=0 exit into an external-timeout kill.
    if deadline is not None and deadline - time.time() < 60:
        raise RuntimeError("mtio skipped: under 60s of budget left before "
                           "the first-epoch compile")

    from mansy_immersivevideostreaming_tpu.models.mtio import ViewportTransformerMTIO
    from mansy_immersivevideostreaming_tpu.models import vp_train

    model = ViewportTransformerMTIO(d_model=d_model,
                                    dim_feedforward=dim_feedforward,
                                    fut_window=15,
                                    teacher_forcing=teacher_forcing,
                                    dtype=jnp.bfloat16 if bf16 else jnp.float32)
    optimizer = vp_train.make_optimizer(1e-4)
    state = vp_train.create_train_state(model, jax.random.PRNGKey(0), 5, optimizer)
    key = jax.random.PRNGKey(1)
    n = bs * n_batches
    data = {
        "history": jax.random.uniform(key, (n, 5, 2)),
        "current": jax.random.uniform(key, (n, 1, 2)),
        "future": jax.random.uniform(key, (n, 15, 2)),
    }
    perm = jnp.arange(n)
    t0 = time.time()
    state, losses = vp_train.train_epoch(model, optimizer, state, data, bs,
                                         perm, key)
    float(losses[-1])
    log(f"[bench] mtio compile+first epoch ({n_batches} steps): "
        f"{time.time() - t0:.1f}s (bs {bs}, d_model {d_model}"
        f"{', bf16' if bf16 else ''}{', teacher-forced' if teacher_forcing else ''})")

    box = {"state": state}

    def one_epoch():
        box["state"], losses = vp_train.train_epoch(
            model, optimizer, box["state"], data, bs, perm, key)
        return losses[-1]

    rates = []
    with _maybe_profile(profile_dir, "mtio"):
        for r in range(n_repeats):
            if deadline is not None and time.time() > deadline and rates:
                log(f"[bench] mtio: deadline reached after {r} repeats")
                break
            epochs_done, dt = steady_rate(one_epoch, min_seconds=6.0, chunk=1)
            rates.append(epochs_done * n_batches * bs / dt)
            log(f"[bench] mtio train repeat {r + 1}/{n_repeats}: "
                f"{epochs_done * n_batches} steps x bs {bs} in {dt:.2f}s "
                f"(epoch-scan path) -> {rates[-1]:,.0f} samples/s "
                f"(torch-CPU baseline {BASELINE_MTIO_SAMPLES}) "
                f"=> {rates[-1] / BASELINE_MTIO_SAMPLES:,.0f}x")
    import statistics
    state = box["state"]
    # Per-sample FLOPs.  The ONLY safe live source is the epoch scan itself:
    # it was compiled above, so lower().compile() is a persistent-cache hit.
    # Never compile a NEW program here — BENCH_r04 died cold-compiling
    # train_step for cost_analysis after every measurement was already done.
    flops_per_sample = None
    parity = (bs, d_model, bf16, teacher_forcing) == (512, 512, False, False)
    if deadline is None or time.time() < deadline:
        epoch_flops = flops_of(vp_train.train_epoch, model, optimizer,
                               jax.tree.map(jnp.copy, state), data, bs,
                               perm, key)
        if epoch_flops:
            # XLA's cost_analysis counts a lax.scan body ONCE, not x trip
            # count (measured: the 32-minibatch epoch program reports
            # 289 GFLOP = exactly the round-3 per-STEP train_step cost at
            # parity shapes), so epoch_flops IS the per-step flops.
            flops_per_sample = epoch_flops / bs
            if parity:
                ratio = flops_per_sample / (MTIO_PARITY_GFLOP_PER_SAMPLE * 1e9)
                if not (0.5 < ratio < 2.0):  # scan-count semantics changed
                    log(f"[bench] mtio live FLOP estimate {ratio:.2f}x the "
                        "round-3 train_step measurement -> using the cached one")
                    flops_per_sample = None
    if flops_per_sample is None and parity:
        flops_per_sample = MTIO_PARITY_GFLOP_PER_SAMPLE * 1e9
        log("[bench] mtio MFU from round-3 cached FLOP estimate "
            f"({MTIO_PARITY_GFLOP_PER_SAMPLE * 512:.1f} GFLOP/step at parity shapes)")
    mfus = None
    if flops_per_sample:
        mfus = [f_rate * flops_per_sample / PEAK_FLOPS_V5E for f_rate in rates]
        log(f"[bench] mtio: {flops_per_sample * bs / 1e9:.2f} GFLOP/step -> "
            f"MFU {statistics.median(mfus) * 100:.2f}% of v5e bf16 peak")
    return rates, mfus


def _maybe_profile(profile_dir, tag):
    """Profile context for the steady-state loop (SURVEY §5: jax.profiler is
    this framework's replacement for the reference's wall-clock prints)."""
    import contextlib
    if not profile_dir:
        return contextlib.nullcontext()
    from mansy_immersivevideostreaming_tpu.utils.profiling import profile_to
    target = os.path.join(profile_dir, tag)
    os.makedirs(target, exist_ok=True)
    log(f"[bench] capturing jax.profiler trace -> {target}")
    return profile_to(target)


def mtio_sweep(profile_dir=None):
    """Batch-size / d_model sweep for the MFU analysis (VERDICT r2 item 4).
    Prints one stderr table row per config; returns rows.  ``profile_dir``
    captures a trace of the parity config only (one trace per sweep — later
    configs would clobber it)."""
    import statistics
    rows = []
    configs = [(512, 512), (1024, 512), (2048, 512), (4096, 512),
               (8192, 512), (512, 1024), (2048, 1024)]
    for bs, d_model in configs:
        parity = (bs, d_model) == (512, 512)
        try:
            rates, mfus = bench_mtio(bs=bs, iters=6, d_model=d_model,
                                     dim_feedforward=d_model, n_repeats=1,
                                     profile_dir=profile_dir if parity else None)
        except Exception as e:  # e.g. HBM OOM at the largest configs
            log(f"[sweep] bs={bs} d_model={d_model}: FAILED ({type(e).__name__})")
            rows.append({"bs": bs, "d_model": d_model,
                         "samples_per_sec": None, "mfu": None,
                         "error": type(e).__name__})
            continue
        rate = statistics.median(rates)
        mfu = statistics.median(mfus) if mfus else None
        rows.append({"bs": bs, "d_model": d_model,
                     "samples_per_sec": round(rate, 1),
                     "mfu": round(mfu, 5) if mfu else None})
        log(f"[sweep] bs={bs} d_model={d_model}: {rate:,.0f} samples/s, "
            f"MFU {mfu * 100:.2f}%" if mfu else f"[sweep] bs={bs}: {rate:,.0f}")
    log("[sweep] " + json.dumps(rows))
    return rows


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture jax.profiler traces of the steady-state "
                             "loops into DIR (view with TensorBoard)")
    parser.add_argument("--mtio-sweep", action="store_true",
                        help="run the MTIO batch-size/d_model MFU sweep "
                             "instead of the standard bench")
    parser.add_argument("--mtio-tf", action="store_true",
                        help="measure the --teacher-forcing single-pass train "
                             "decode (f32 + bf16, bs 512/2048) instead of the "
                             "standard bench")
    parser.add_argument("--skip-abr", action="store_true",
                        help="skip the ABR headline (for quick MTIO runs)")
    args = parser.parse_args(argv)

    import jax
    # One cache dir shared with every CLI entry point (utils/prng.py) so the
    # driver's bench run reuses the round's compiles.  BENCH_r04 had two
    # caches (repo-local .jax_cache here vs ~/.mansy_jax_cache in the CLIs),
    # each cold half the time.
    from mansy_immersivevideostreaming_tpu.utils.prng import enable_compilation_cache
    enable_compilation_cache()
    log(f"[bench] devices: {jax.devices()}  (budget {BENCH_BUDGET:.0f}s)")
    if args.mtio_tf:
        import statistics
        rows = []
        for bs, bf16 in [(512, False), (2048, False), (512, True),
                         (2048, True)]:
            try:
                rates, mfus = bench_mtio(bs=bs, bf16=bf16,
                                         teacher_forcing=True, n_repeats=1)
            except Exception as e:
                log(f"[tf] bs={bs} bf16={bf16}: FAILED ({type(e).__name__})")
                rows.append({"bs": bs, "bf16": bf16, "samples_per_sec": None,
                             "mfu": None, "error": type(e).__name__})
                continue
            rows.append({"bs": bs, "bf16": bf16,
                         "samples_per_sec": round(statistics.median(rates), 1),
                         "mfu": round(statistics.median(mfus), 5) if mfus else None})
        ok = [r for r in rows if r.get("samples_per_sec")]
        print(json.dumps({"metric": "mtio_teacher_forced_sweep",
                          "value": ok[0]["samples_per_sec"] if ok else None,
                          "unit": "samples/s", "sweep": rows}), flush=True)
        return
    if args.mtio_sweep:
        rows = mtio_sweep(args.profile)
        ok = [r for r in rows if r.get("samples_per_sec")]
        print(json.dumps({"metric": "mtio_sweep",
                          "value": ok[0]["samples_per_sec"] if ok else None,
                          "unit": "samples/s", "sweep": rows}), flush=True)
        return
    import statistics
    out = None
    if not args.skip_abr:
        abr_rates, abr_mfus = bench_abr(profile_dir=args.profile)
        abr_rate = statistics.median(abr_rates)
        out = {
            "metric": "abr_env_steps_per_sec",
            "value": round(abr_rate, 1),
            "unit": "steps/s",
            "vs_baseline": round(abr_rate / BASELINE_ENV_STEPS, 2),
            "dispersion": dispersion(abr_rates),
        }
        if abr_mfus:
            out["mfu"] = round(statistics.median(abr_mfus), 5)
            out["mfu_dispersion"] = dispersion(abr_mfus, digits=5)
        # Print the headline IMMEDIATELY: BENCH_r04 finished every
        # measurement and then died in the MTIO phase's cold compiles with
        # nothing on stdout.  The enriched line below supersedes this one
        # when the budget allows (the driver keeps the tail; both parse).
        print(json.dumps(out), flush=True)
    try:
        mtio_rates, mtio_mfus = bench_mtio(
            profile_dir=args.profile, deadline=T_START + BENCH_BUDGET - 20)
    except Exception as e:  # secondary benchmark must not sink the headline
        log(f"[bench] mtio bench failed: {e!r}")
        mtio_rates = mtio_mfus = None
    mtio_rate = statistics.median(mtio_rates) if mtio_rates else None
    mtio_mfu = statistics.median(mtio_mfus) if mtio_mfus else None
    if args.skip_abr:
        if mtio_rate is None:
            print(json.dumps({"metric": "mtio_samples_per_sec",
                              "value": None, "unit": "samples/s"}), flush=True)
            return
        print(json.dumps({"metric": "mtio_samples_per_sec",
                          "value": round(mtio_rate, 1), "unit": "samples/s",
                          "vs_baseline": round(mtio_rate / BASELINE_MTIO_SAMPLES, 2),
                          "mtio_mfu": round(mtio_mfu, 5) if mtio_mfu else None,
                          "mtio_dispersion": dispersion(mtio_rates)}),
              flush=True)
        return
    if mtio_rate is not None:
        out["mtio_samples_per_sec"] = round(mtio_rate, 1)
        out["mtio_vs_baseline"] = round(mtio_rate / BASELINE_MTIO_SAMPLES, 2)
        out["mtio_dispersion"] = dispersion(mtio_rates)
        if mtio_mfu is not None:
            out["mtio_mfu"] = round(mtio_mfu, 5)
            out["mtio_mfu_dispersion"] = dispersion(mtio_mfus, digits=5)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
