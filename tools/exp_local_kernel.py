"""On-chip check of the local-table likelihood kernel: correctness vs
the XLA path and throughput at 1M particles x 96 points."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mcl_3dl_tpu.map.distance_field import build_distance_field
    from mcl_3dl_tpu.math import quat as mq
    from mcl_3dl_tpu.models.likelihood import likelihood_measure

    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pts = rng.uniform(-4, 4, (20000, 3))
        pts[:, 2] = np.abs(pts[:, 2]) * 0.25
        df_cpu = build_distance_field(pts, 0.1, 0.6, pack_corners=False)
    df = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), df_cpu)

    N = 1 << 20
    K = 96
    pos_h = (np.array([0.5, -0.3, 0.4])
             + rng.normal(0, 0.1, (N, 3))).astype(np.float32)
    yaw = rng.normal(0, 0.02, N)
    rot_h = np.stack([np.zeros(N), np.zeros(N),
                      np.sin(yaw / 2), np.cos(yaw / 2)], 1).astype(np.float32)
    scan_h = rng.uniform(-5, 5, (K, 3)).astype(np.float32)
    pos, rot, scan = (jnp.asarray(a) for a in (pos_h, rot_h, scan_h))
    valid = jnp.ones(K, bool)

    def run(local):
        def f(p):
            lik, q = likelihood_measure(
                df, p, rot, scan, valid, 0.2, 0.05, 5.0,
                trilinear=False, local_kernel=local,
            )
            # chain: shift positions by a likelihood-dependent epsilon
            return p + (lik[:, None] * 0.0), lik, q
        g = jax.jit(f)
        t0 = time.monotonic()
        p, lik, q = g(pos)
        _ = float(np.asarray(lik[0]))
        print(f"  local={local} compile: {time.monotonic()-t0:.1f}s",
              flush=True)
        t0 = time.monotonic()
        for _ in range(5):
            p, lik, q = g(p)
        _ = float(np.asarray(lik[0]))
        dt = (time.monotonic() - t0) / 5
        return dt, np.asarray(lik), np.asarray(q)

    dt_x, lik_x, q_x = run(False)
    print(f"XLA path: {dt_x*1e3:.1f} ms -> {N*K/dt_x/1e6:.0f} M lookups/s",
          flush=True)
    dt_l, lik_l, q_l = run(True)
    print(f"local-kernel path: {dt_l*1e3:.1f} ms -> "
          f"{N*K/dt_l/1e6:.0f} M lookups/s", flush=True)
    err = np.abs(lik_l - lik_x).max()
    qerr = np.abs(q_l - q_x).max()
    print(f"max |lik diff| = {err:.2e}, max |quality diff| = {qerr:.2e}",
          flush=True)
    assert err < 1e-3 and qerr < 1e-5, "MISMATCH"
    print("OK", flush=True)


if __name__ == "__main__":
    main()
