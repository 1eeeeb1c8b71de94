"""Benchmark: full fused filter update on the flagship config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: particle-likelihood point evaluations per second per chip,
measured over the complete fused measurement step (clip/sample, the
likelihood-field kernel over [particles x 96 points], the beam raycast
over [particles x 3 beams], weight update, bias, expectation, jump/TF
smoothing, covariance, systematic resampling, noise redraw) at 1M
particles — i.e. the whole per-scan device graph, not an isolated gather.

Baseline: the reference C++ node's real-time demo workload
(BASELINE.md): 64 particles x (96 likelihood + 3 beam) points per
measurement at the ~10 Hz scan rate it keeps up with =
64 * 99 * 10 = 63,360 particle-point evals/sec on one CPU.
``vs_baseline`` = value / 63,360.

Run on the real chip (no platform override).  Secondary numbers go to
stderr; the driver parses stdout's single JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    n_particles = 1 << (14 if quick else 20)   # 1M particles flagship
    # Build inputs on the CPU backend (engine construction is many tiny
    # ops — dispatching them to a remote chip would dominate), then
    # materialize on the accelerator via host numpy.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        eng, args_cpu = ge._build_engine_and_inputs(
            num_particles=n_particles, cloud_points=4096, seed=0,
            # nearest-cell sampling — since r5 this IS the shipped
            # default (config.py LikelihoodParams.interp; all three
            # Tier-3 gates certified under it, docs/TIER3_GATE.json)
            fast=True,
        )
    args = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), args_cpu)

    # breakdown controls (diagnostics, not the headline run)
    import dataclasses
    import os
    if os.environ.get("BENCH_NO_BEAM"):
        eng.params.use_beam_model = False
    if os.environ.get("BENCH_LIKE_POINTS"):
        eng.params.likelihood = dataclasses.replace(
            eng.params.likelihood,
            num_points=int(os.environ["BENCH_LIKE_POINTS"]),
        )
    like_pts = eng.params.likelihood.num_points
    beam_pts = eng.params.beam.num_points if eng.params.use_beam_model else 0

    # NOTE: no buffer donation — the axon remote backend rejects donated
    # buffers at execution time (INVALID_ARGUMENT).
    step = jax.jit(eng._measurement_step)

    # warmup / compile.  NOTE: through the remote-chip relay,
    # block_until_ready returns before device execution completes, so
    # all timing below forces an actual VALUE fetch; iterations chain
    # through the particle state, so fetching the final state's weights
    # cannot complete until every step has physically run.
    t0 = time.monotonic()
    out = step(*args)
    _ = float(np.asarray(out[0].prob[0]))
    compile_s = time.monotonic() - t0
    print(f"compile+first-run: {compile_s:.1f}s", file=sys.stderr)

    # Warm up to steady state: the scan is consistent with the map, so a
    # few updates converge the particle cloud exactly as in deployment;
    # steady-state tracking is the rate that matters (and the regime
    # where the local-table Pallas scoring kernels engage).  Each step
    # gets a fresh RNG key (a plain argument — no recompile).
    # Disjoint key ranges per bench section: the main steady-state loop
    # consumes keys[:26]; reusing any of those for the fallback /
    # default / global rows would repeat identical computations that a
    # persistent executable cache could make unrepresentatively fast.
    import jax as _jax
    keys = _jax.random.split(args[1], 64)
    warmup = 2 if quick else 6
    state = out[0]
    for i in range(warmup):
        out = step(state, keys[i], *args[2:])
        state = out[0]
    _ = float(np.asarray(state.prob[0]))

    iters = 3 if quick else 20
    t0 = time.monotonic()
    for i in range(iters):
        out = step(state, keys[warmup + i], *args[2:])
        state = out[0]
    _ = float(np.asarray(state.prob[0]))
    dt = (time.monotonic() - t0) / iters

    updates_per_sec = 1.0 / dt
    evals_per_sec = n_particles * (like_pts + beam_pts) / dt
    baseline = 64 * (like_pts + beam_pts) * 10.0

    # which measurement tier actually ran at steady state (0 = grouped
    # Pallas kernel, 1 = per-point box kernel, 2 = XLA gather)
    tier_like = int(np.asarray(out[-1]["tier_like"]))
    tier_beam = int(np.asarray(out[-1]["tier_beam"]))
    print(
        f"step: {dt*1e3:.2f} ms | {updates_per_sec:.1f} filter updates/s "
        f"at {n_particles} particles | {evals_per_sec:.3e} point-evals/s "
        f"| tiers: like={tier_like} beam={tier_beam}",
        file=sys.stderr,
    )

    extra = {
        "filter_updates_per_sec": updates_per_sec,
        "num_particles": n_particles,
        "points_per_particle": like_pts + beam_pts,
        "step_ms": dt * 1e3,
        "baseline_evals_per_sec": baseline,
        "tier_like": tier_like,
        "tier_beam": tier_beam,
    }

    if not quick and not os.environ.get("BENCH_HEADLINE_ONLY"):
        # --- fallback row: unconverged spread (startup / kidnapped /
        # global localization) — the grouped envelopes cannot fit, so
        # this is the honest cost whenever tracking is NOT converged.
        # Same compiled graph (tiers are lax.cond); the state is pinned
        # wide each iteration with a value-preserving data dependency on
        # the previous step so the relay timing still chains.
        with jax.default_device(cpu):
            eng.initial_pose(
                np.zeros(3), np.asarray([0.0, 0.0, 0.0, 1.0]),
                np.diag([1.0, 1.0, 1.0, 0.1, 0.1, 1.0]),
            )
            wide_cpu = eng.pstate
        wide = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), wide_cpu)
        wout = step(wide, keys[26], *args[2:])
        _ = float(np.asarray(wout[0].prob[0]))          # compile-check/warm
        t0 = time.monotonic()
        iters_fb = 5
        for i in range(iters_fb):
            dep = wout[0].prob[0] * 0.0
            pinned = wide._replace(pos=wide.pos + dep)
            wout = step(pinned, keys[27 + i], *args[2:])
        _ = float(np.asarray(wout[0].prob[0]))
        dt_fb = (time.monotonic() - t0) / iters_fb
        extra["fallback_step_ms"] = dt_fb * 1e3
        extra["fallback_tier_like"] = int(np.asarray(wout[-1]["tier_like"]))
        extra["fallback_tier_beam"] = int(np.asarray(wout[-1]["tier_beam"]))
        print(
            f"fallback (unconverged) step: {dt_fb*1e3:.2f} ms | tiers: "
            f"like={extra['fallback_tier_like']} "
            f"beam={extra['fallback_tier_beam']}",
            file=sys.stderr,
        )

        # --- trilinear-option row: interp=trilinear (the optional
        # smooth-interpolation mode; the shipped default is nearest
        # since r5) at steady state.
        cpu2 = jax.devices("cpu")[0]
        with jax.default_device(cpu2):
            eng_d, args_d_cpu = ge._build_engine_and_inputs(
                num_particles=n_particles, cloud_points=4096, seed=0,
                interp="trilinear",
            )
        args_d = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)),
                              args_d_cpu)
        step_d = jax.jit(eng_d._measurement_step)
        t0 = time.monotonic()
        out_d = step_d(*args_d)
        _ = float(np.asarray(out_d[0].prob[0]))
        print(f"trilinear compile+first-run: {time.monotonic()-t0:.1f}s",
              file=sys.stderr)
        state_d = out_d[0]
        for i in range(6):
            out_d = step_d(state_d, keys[32 + i], *args_d[2:])
            state_d = out_d[0]
        _ = float(np.asarray(state_d.prob[0]))
        t0 = time.monotonic()
        iters_d = 10
        for i in range(iters_d):
            out_d = step_d(state_d, keys[38 + i], *args_d[2:])
            state_d = out_d[0]
        _ = float(np.asarray(state_d.prob[0]))
        dt_d = (time.monotonic() - t0) / iters_d
        extra["trilinear_step_ms"] = dt_d * 1e3
        extra["trilinear_tier_like"] = int(np.asarray(out_d[-1]["tier_like"]))
        extra["trilinear_tier_beam"] = int(np.asarray(out_d[-1]["tier_beam"]))
        print(
            f"trilinear (option) step: {dt_d*1e3:.2f} ms | tiers: "
            f"like={extra['trilinear_tier_like']} "
            f"beam={extra['trilinear_tier_beam']}",
            file=sys.stderr,
        )

        # --- global-localization row: the REALISTIC unconverged step.
        # The fallback row above is the full-point-count worst case; in
        # the reference, entering global localization shrinks the
        # sampled point count (setGlobalLocalizationStatus,
        # lidar_measurement_model_likelihood.cpp:63-77) — num_points *
        # num_particles / n_active, floored at num_points_global=8 —
        # and the engine compiles the GLOBAL-MODE graph specialization
        # (8 likelihood slots, beam dropped at its 0 budget) the host
        # selects above num_particles.  Seed >= 100k particles via the
        # actual service (standable surface x yaw grid,
        # src/mcl_3dl.cpp:1039-1099) and measure the step with the
        # state re-pinned to the full seeded count each iteration (the
        # in-step 0.75x decay would otherwise shrink the workload
        # mid-measurement).
        with jax.default_device(cpu):
            eng_g, args_g_cpu = ge._build_engine_and_inputs(
                num_particles=1 << 14, cloud_points=4096, seed=0,
                fast=True,
                extra_params=dict(global_localization_grid_lin=0.1,
                                  global_localization_grid_ang=0.1),
            )
            n_seeded = eng_g.global_localization()
            args_g_cpu = (eng_g.pstate,) + args_g_cpu[1:]
        args_g = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)),
                              args_g_cpu)
        step_g = eng_g._step_global     # the engine's own global graph
        t0 = time.monotonic()
        gout = step_g(*args_g)
        _ = float(np.asarray(gout[0].prob[0]))
        print(f"global compile+first-run: {time.monotonic()-t0:.1f}s",
              file=sys.stderr)
        state_g = args_g[0]
        t0 = time.monotonic()
        iters_g = 5
        for i in range(iters_g):
            dep = gout[0].prob[0] * 0.0
            pinned = state_g._replace(pos=state_g.pos + dep)
            gout = step_g(pinned, keys[48 + i], *args_g[2:])
        _ = float(np.asarray(gout[0].prob[0]))
        dt_g = (time.monotonic() - t0) / iters_g
        extra["global_mode_step_ms"] = dt_g * 1e3
        extra["global_mode_particles"] = int(n_seeded)
        extra["global_mode_capacity"] = int(args_g[0].pos.shape[0])
        print(
            f"global-localization step: {dt_g*1e3:.2f} ms at "
            f"{n_seeded} seeded particles (capacity "
            f"{extra['global_mode_capacity']}, 8 pts/particle)",
            file=sys.stderr,
        )

    print(json.dumps({
        "metric": "particle_likelihood_evals_per_sec_chip",
        "value": evals_per_sec,
        "unit": "evals/s",
        "vs_baseline": evals_per_sec / baseline,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
