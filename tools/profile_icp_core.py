"""Microbench icp_core's per-iteration cost via iteration-count slopes.

The network-attached TPU adds a ~25 ms round trip to every host-visible
call, so single-call timings measure the tunnel. Instead:

* selection kernels run K times inside one jitted fori_loop (the loop
  carries the result so XLA can't hoist it); per-call cost = slope.
* icp_core runs with error_threshold=0 (always max_iterations) at two
  iteration counts; per-iteration cost = (t2 - t1) / (n2 - n1).

Shapes are the fused-step submap ICP shapes (src 1024 x tgt 8192, gated).

Usage: python tools/profile_icp_core.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from icp_tpu.ops.nn import pairwise_sqdist
from icp_tpu.utils.masking import BIG, masked_centroid


def timeit(fn, *args, reps=12):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    N, M = 1024, 8192
    src = jnp.asarray(rng.normal(size=(N, 2)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(M, 2)) * 3, jnp.float32)
    smask = jnp.asarray(rng.random(N) < 0.7)
    tmask = jnp.asarray(rng.random(M) < 0.8)

    def sel_gather(s, tgt, tmask):
        center = masked_centroid(tgt, tmask)
        d = pairwise_sqdist(s, tgt, tmask, center=center)
        idx = jnp.argmin(d, axis=-1)
        dist = jnp.sqrt(jnp.take_along_axis(d, idx[:, None], axis=-1)[:, 0])
        nearest = tgt[idx]
        return dist, nearest

    def sel_onehot(s, tgt, tmask):
        center = masked_centroid(tgt, tmask)
        d = pairwise_sqdist(s, tgt, tmask, center=center)
        dmin = jnp.min(d, axis=-1)
        hot = (d == dmin[:, None]).astype(jnp.float32)
        hot = hot / jnp.sum(hot, axis=-1, keepdims=True)
        nearest = hot @ tgt
        return jnp.sqrt(dmin), nearest

    def looped(sel, k):
        @jax.jit
        def f(s, tgt, tmask):
            def body(i, carry):
                dist, near = sel(carry, tgt, tmask)
                # feed the result back so iterations can't be hoisted
                return carry + 1e-9 * near * dist[:, None]
            return lax.fori_loop(0, k, body, s)
        return f

    for name, sel in [("gather", sel_gather), ("one-hot", sel_onehot)]:
        t8 = timeit(looped(sel, 8), src, tgt, tmask)
        t72 = timeit(looped(sel, 72), src, tgt, tmask)
        per = (t72 - t8) / 64
        print(f"selection {name:8s}: {per*1e6:7.1f} us/iter "
              f"(t8={t8*1e3:.1f} ms, t72={t72*1e3:.1f} ms)", flush=True)

    # icp_core per-iteration slope at submap shapes
    from icp_tpu.models.icp import icp_core
    R0 = jnp.eye(2, dtype=jnp.float32)
    t0v = jnp.zeros(2, jnp.float32)
    th = 0.05
    Rt = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                  np.float32)
    tgt2 = jnp.asarray(
        np.concatenate([np.asarray(src) @ Rt.T + [0.1, -0.05],
                        rng.normal(size=(M - N, 2)) * 3]).astype(np.float32))

    for method in ("point_to_point", "point_to_line"):
        def f(n_it, s, sm, t, tm):
            return icp_core(s, sm, t, tm, R0, t0v, method=method,
                            max_iterations=n_it, error_threshold=0.0,
                            max_corr_dist=1.5, use_gate=True)
        t10 = timeit(jax.jit(partial(f, 10)), src, smask, tgt2, tmask)
        t74 = timeit(jax.jit(partial(f, 74)), src, smask, tgt2, tmask)
        per = (t74 - t10) / 64
        print(f"icp_core {method:16s}: {per*1e6:7.1f} us/iter "
              f"(t10={t10*1e3:.1f} ms, t74={t74*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
