"""Offline sweep of grouped-path bin/envelope parameters on a dumped
steady state (tools/exp_converge.py --dump).

Pure numpy re-implementation of ops/grouped.py's group_stats/group_boxes
with configurable (yaw, pitch, roll) bin counts and envelope sigmas, so
tuning doesn't need a convergence rerun.  For each config prints:
outlier fraction (-> overflow cap needs), fits fraction / all, and the
in-map extent percentiles against candidate (BX, BY) boxes.

Usage: python tools/exp_envelope_sweep.py /tmp/steady16k.npz
"""

import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def quat_to_mat(q):
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    m = np.empty((len(q), 3, 3), np.float32)
    m[:, 0, 0] = 1 - 2 * (y * y + z * z)
    m[:, 0, 1] = 2 * (x * y - z * w)
    m[:, 0, 2] = 2 * (x * z + y * w)
    m[:, 1, 0] = 2 * (x * y + z * w)
    m[:, 1, 1] = 1 - 2 * (x * x + z * z)
    m[:, 1, 2] = 2 * (y * z - x * w)
    m[:, 2, 0] = 2 * (x * z - y * w)
    m[:, 2, 1] = 2 * (y * z + x * w)
    m[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return m


def rpy_from_quat(q):
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def main():
    d = np.load(sys.argv[1])
    pos, rot = d["pos"], d["rot"]
    active, pts, ok = d["active"], d["pts"], d["ok"]

    import jax
    jax.config.update("jax_platforms", "cpu")
    import __graft_entry__ as ge
    eng, _ = ge._build_engine_and_inputs(16384, 256, 0, True)
    df = eng.map.df
    w = np.asarray(df.weights, np.float64)
    cell = float(df.cell)
    origin = np.asarray(df.origin, np.float64)
    dims3 = df.field.shape

    n = len(pos)
    rmat = quat_to_mat(rot / np.linalg.norm(rot, axis=1, keepdims=True))
    a9 = (rmat * w[None, :, None]).reshape(n, 9) / cell
    b3 = (pos * w - origin) / cell
    A = np.concatenate([a9, b3], 1).astype(np.float64)
    roll, pitch, yaw = rpy_from_quat(rot)
    p_ok = pts[ok].astype(np.float64)

    def run(nyaw, npitch, nroll, s1, s2, boxxy):
        act = active.copy()
        ylo, yhi = yaw[act].min(), yaw[act].max()
        yb = np.clip(((yaw - ylo) / max(yhi - ylo, 1e-6) * nyaw).astype(int),
                     0, nyaw - 1)
        g = yb
        for v, nb in ((pitch, npitch), (roll, nroll)):
            if nb > 1:
                med = np.median(v[act])
                g = g * nb + (v > med).astype(int)
            # nb == 1: no split
        nbins = nyaw * npitch * nroll
        out = np.zeros(n, bool)
        lo_b = np.zeros((nbins, 12))
        hi_b = np.zeros((nbins, 12))
        anyb = np.zeros(nbins, bool)
        for gg in range(nbins):
            m = (g == gg) & act
            if not m.any():
                continue
            anyb[gg] = True
            mu, sd = A[m].mean(0), A[m].std(0)
            inl1 = m & (np.abs(A - mu) <= s1 * sd + 1e-3).all(1)
            if not inl1.any():
                inl1 = m
            mu2, sd2 = A[inl1].mean(0), A[inl1].std(0)
            env_lo = np.maximum(mu2 - s2 * sd2 - 1e-3, A[inl1].min(0))
            env_hi = np.minimum(mu2 + s2 * sd2 + 1e-3, A[inl1].max(0))
            out |= m & ((A < env_lo) | (A > env_hi)).any(1)
            lo_b[gg], hi_b[gg] = env_lo, env_hi
        frac_over = (out & act).sum() / max(act.sum(), 1)

        # interval boxes, in-map clip
        K = len(p_ok)
        box = (boxxy, boxxy, 128)
        fits = np.ones((K, nbins), bool)
        exts = []
        for i in range(3):
            lo_i = np.broadcast_to(lo_b[None, :, 9 + i], (K, nbins)).copy()
            hi_i = np.broadcast_to(hi_b[None, :, 9 + i], (K, nbins)).copy()
            for j in range(3):
                amin = lo_b[None, :, 3 * i + j]
                amax = hi_b[None, :, 3 * i + j]
                pj = p_ok[:, j][:, None]
                lo_i = lo_i + np.minimum(amin * pj, amax * pj)
                hi_i = hi_i + np.maximum(amin * pj, amax * pj)
            lo_q = np.floor(lo_i).astype(int)
            hi_q = np.ceil(hi_i).astype(int)
            lo_in = np.maximum(lo_q, 0)
            hi_in = np.minimum(hi_q, dims3[i] - 1)
            e = hi_in - lo_in + 1
            fits &= e <= box[i]
            exts.append(e)
        ext = np.stack(exts, -1)[:, anyb, :].reshape(-1, 3)
        fits_frac = fits[:, anyb].mean()
        fits_all = bool(fits[:, anyb].all())
        p99 = np.percentile(ext, 99, 0).astype(int)
        p100 = ext.max(0)
        print(f"yaw={nyaw:2d} pitch={npitch} roll={nroll} s1={s1} s2={s2} "
              f"box={boxxy}: over={frac_over*100:5.2f}%  "
              f"fits={fits_frac*100:5.1f}% all={fits_all}  "
              f"p99={p99} max={p100}")
        return fits_all, frac_over

    print(f"N={n} active={active.sum()} K_ok={len(p_ok)} dims={dims3}")
    print(f"pos std {pos[active].std(0).round(3)}  "
          f"rpy std {np.std([roll[active], pitch[active], yaw[active]], 1).round(3)}")
    configs = itertools.product(
        (12, 16, 24), (2,), (2,), (2.8, 3.0, 3.2, 3.5))
    for nyaw, npitch, nroll, s2 in configs:
        run(nyaw, npitch, nroll, max(3.5, s2), s2, 12)


if __name__ == "__main__":
    main()
