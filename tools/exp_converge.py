"""CPU diagnostic: does the bench world converge, and do the grouped
fast paths engage at its steady state?

Runs the bench configuration (16k particles by default — CPU-sized) to
steady state, then reports particle spread, per-(point, group) box
extent percentiles against the (BX, BY, ZW) kernel box, and the `fits`
flags both grouped models would see.  Writes a JSON artifact next to
BENCH_NOTES.md when --out is given.

Usage: python tools/exp_converge.py [--n 16384] [--steps 10] [--out f.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--dump", type=str, default="",
                    help="save the steady state + sampled points to .npz "
                         "for offline envelope/bin parameter sweeps")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) backend instead of CPU")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from mcl_3dl_tpu.math import quat as mq
    from mcl_3dl_tpu.ops import grouped as og

    n = args.n
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        eng, args_cpu = ge._build_engine_and_inputs(
            num_particles=n, cloud_points=4096, seed=0, fast=True)
    sargs = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), args_cpu)
    step = jax.jit(eng._measurement_step)

    t0 = time.monotonic()
    out = step(*sargs)
    _ = float(np.asarray(out[0].prob[0]))
    print(f"compile+first: {time.monotonic()-t0:.0f}s", file=sys.stderr)
    keys = jax.random.split(sargs[1], args.steps + 2)
    state = out[0]
    hist = []
    for i in range(args.steps):
        out = step(state, keys[i], *sargs[2:])
        state = out[0]
        pos = np.asarray(state.pos)
        rot = np.asarray(state.rot)
        rpy = np.asarray(mq.to_rpy(jnp.asarray(rot)))
        hist.append({
            "step": i,
            "pos_std": pos.std(0).round(4).tolist(),
            "rpy_std": rpy.std(0).round(4).tolist(),
            "yaw_span": float(rpy[:, 2].max() - rpy[:, 2].min()),
            "e_pos": np.asarray(out[-1]["e_pos"]).round(3).tolist(),
        })
        print(hist[-1], file=sys.stderr)

    # grouped-path boxes on the final state, using the engine's own
    # clip+sample so the points match what the step actually scores
    from mcl_3dl_tpu.models.likelihood import clip_mask
    from mcl_3dl_tpu.models.samplers import sample_uniform

    lp = eng.params.likelihood
    cloud, cloud_valid = sargs[5], sargs[7]
    keep = cloud_valid & clip_mask(cloud, lp.clip_near, lp.clip_far,
                                   lp.clip_z_min, lp.clip_z_max)
    pts, ok, _ = sample_uniform(keys[-1], cloud, keep, lp.num_points)

    df = sargs[2]
    posd, rotd = state.pos, state.rot
    rmat = mq.rotation_matrix(mq.normalize(rotd))
    active = state.active_mask() > 0
    if args.dump:
        np.savez(args.dump, pos=np.asarray(posd), rot=np.asarray(rotd),
                 active=np.asarray(active), pts=np.asarray(pts),
                 ok=np.asarray(ok))
    cap = og.default_overflow_cap(n)
    stats = og.group_stats(posd, rmat, rotd, df.weights, float(df.cell),
                           df.origin, active)
    lo, fits_kg = og.group_boxes(stats, pts, df.field.shape)

    # raw envelope extents per (point, bin), before the in-map clip
    p32 = pts.astype(jnp.float32)
    lo_f = jnp.zeros((pts.shape[0], og.G_GROUPS, 3), jnp.float32)
    hi_f = jnp.zeros_like(lo_f)
    for i in range(3):
        lo_i = stats.a_min[:, 9 + i][None, :]
        hi_i = stats.a_max[:, 9 + i][None, :]
        for j in range(3):
            amin = stats.a_min[:, 3 * i + j][None, :]
            amax = stats.a_max[:, 3 * i + j][None, :]
            pj = p32[:, j][:, None]
            lo_i = lo_i + jnp.minimum(amin * pj, amax * pj)
            hi_i = hi_i + jnp.maximum(amin * pj, amax * pj)
        lo_f = lo_f.at[..., i].set(lo_i)
        hi_f = hi_f.at[..., i].set(hi_i)
    ext = np.asarray(jnp.ceil(hi_f).astype(jnp.int32)
                     - jnp.floor(lo_f).astype(jnp.int32) + 1)
    anyg = np.asarray(stats.any_active)
    okp = np.asarray(ok)
    e = ext[okp][:, anyg, :].reshape(-1, 3)
    pct = {q: np.percentile(e, q, axis=0).round(1).tolist()
           for q in (50, 90, 95, 99, 100)}
    fits_frac = float(np.asarray(
        jnp.mean(fits_kg[okp][:, anyg].astype(jnp.float32))))
    n_over = int(np.asarray(stats.n_over))
    fits_all = bool(np.asarray(
        jnp.all(fits_kg | ~ok[:, None]))) and n_over <= cap

    report = {
        "n_particles": n,
        "steps": args.steps,
        "history": hist,
        "box": [og.BX, og.BY, og.ZW],
        "bins": [og.G_YAW, og.G_PITCH, og.G_ROLL],
        "env_sigma": og.ENV_SIGMA,
        "overflow": {"n_over": n_over, "cap": cap},
        "ext_percentiles": pct,
        "like_fits_fraction": fits_frac,
        "like_fits_all": fits_all,
    }
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
