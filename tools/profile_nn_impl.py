"""A/B the icp_core correspondence search: XLA distance-matrix vs Pallas
streaming NN (ops/pallas/nn_kernel.py) at the fused step's real shapes —
s2s (1024 x 1024) and submap (1024 x 8192) — plus a raw nn-kernel
bandwidth/roofline measurement. Run on the TPU chip."""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

from icp_tpu.models.icp import icp_core
from icp_tpu.utils.masking import pad_points


def bench_icp(N, M, reps=20):
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-10, 10, (M, 2)).astype(np.float32)
    th = 0.05
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                 np.float32)
    src = (tgt[rng.integers(0, M, N)] - [0.2, -0.1]) @ R
    sp, sm = pad_points(src, N)
    tp, tm = pad_points(tgt, M)
    args = (jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp),
            jnp.asarray(tm), jnp.eye(2, dtype=jnp.float32),
            jnp.zeros(2, jnp.float32))
    kw = dict(method="point_to_point", max_iterations=30,
              error_threshold=1e-12, max_corr_dist=1.0, use_gate=True)
    out = {}
    for impl in ("xla", "pallas"):
        res = icp_core(*args, nn_impl=impl, **kw)
        np.asarray(res.error)
        t0 = time.perf_counter()
        for _ in range(reps):
            res = icp_core(*args, nn_impl=impl, **kw)
        np.asarray(res.error)
        dt = (time.perf_counter() - t0) / reps
        out[impl] = (dt, int(res.iters), np.asarray(res.R),
                     np.asarray(res.t), float(res.error))
        print(f"  icp_core {N}x{M} nn={impl}: {dt*1e3:.2f} ms/align, "
              f"iters={int(res.iters)}, err={float(res.error):.2e}")
    dR = np.abs(out["xla"][2] - out["pallas"][2]).max()
    dt_ = np.abs(out["xla"][3] - out["pallas"][3]).max()
    print(f"  parity: |dR|={dR:.2e} |dt|={dt_:.2e} "
          f"iters {out['xla'][1]} vs {out['pallas'][1]}")
    return out


def bench_raw_nn(N, M, reps=50):
    """Raw NN query rates: pairs/s and effective bandwidth for both impls."""
    from icp_tpu.ops.nn import nn_query
    from icp_tpu.ops.pallas.nn_kernel import nn_pallas
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.uniform(-10, 10, (N, 2)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(-10, 10, (M, 2)), jnp.float32)
    msk = jnp.ones(M, bool)

    for name, fn in (
        ("xla", jax.jit(lambda a, b, m: nn_query(a, b, m))),
        ("pallas", jax.jit(lambda a, b, m: nn_pallas(a, b, m))),
    ):
        d, i = fn(src, tgt, msk)
        np.asarray(d)
        t0 = time.perf_counter()
        for _ in range(reps):
            d, i = fn(src, tgt, msk)
        np.asarray(d)
        dt = (time.perf_counter() - t0) / reps
        pairs = N * M / dt
        # streaming kernel HBM traffic: target tiles re-read once per
        # source tile; XLA path additionally writes+reads the (N, M) matrix
        tn = 256
        stream_bytes = (N / tn) * M * 12 + N * 16
        mat_bytes = stream_bytes + 2 * N * M * 4
        bw = (stream_bytes if name == "pallas" else mat_bytes) / dt / 1e9
        print(f"  nn {name} {N}x{M}: {dt*1e6:.0f} us, "
              f"{pairs/1e9:.2f} Gpairs/s, ~{bw:.0f} GB/s effective")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    print("— fused-step shapes —")
    bench_icp(1024, 1024)
    bench_icp(1024, 8192)
    print("— raw NN kernel —")
    bench_raw_nn(1024, 8192)
    bench_raw_nn(4096, 65536)
