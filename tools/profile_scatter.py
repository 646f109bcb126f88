"""Scatter design micro-variants for the raytrace compaction plan."""
from __future__ import annotations

import os
import sys
import time

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

K = 16


def bench_rep(make_body, carry0, n=5, k=K):
    @jax.jit
    def run(c):
        c, _ = lax.scan(lambda cc, _: (make_body(cc), None), c, None,
                        length=k)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x), c)

    out = run(carry0)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(carry0)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def floor_time(n=10):
    f = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(f(z))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(z))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    ny, nx = 2365, 2485
    V = ny * nx
    fl = floor_time()
    print(f"floor {fl*1e3:.2f} ms", flush=True)

    def report(name, t, k=K):
        print(f"{name:48s} {(t - fl)/k*1e3:8.3f} ms", flush=True)

    E = 655360
    idx = jnp.asarray(rng.integers(0, V, E), jnp.int32)
    idx_sorted = jnp.sort(idx)
    vals = jnp.full((E,), -0.4, jnp.float32)
    uni = jnp.asarray(rng.permutation(V)[:E].astype(np.int32))  # unique
    uni_sorted = jnp.sort(uni)

    g0 = jnp.zeros((V,), jnp.float32)

    def mk(indices, unique):
        def body(c):
            g, acc = c
            g2 = g.at[indices].add(vals + acc * 1e-30, mode="drop",
                                   unique_indices=unique)
            return g2 * 0.5, acc + g2[0]
        return body

    report("scatter 655k dup unsorted", bench_rep(mk(idx, False), (g0, jnp.float32(0))))
    report("scatter 655k dup sorted", bench_rep(mk(idx_sorted, False), (g0, jnp.float32(0))))
    report("scatter 655k unique unsorted", bench_rep(mk(uni, True), (g0, jnp.float32(0))))
    report("scatter 655k unique sorted", bench_rep(mk(uni_sorted, True), (g0, jnp.float32(0))))

    for Eb in (327680, 262144, 131072):
        ib = idx_sorted[:Eb]
        vb = vals[:Eb]

        def body(c):
            g, acc = c
            g2 = g.at[ib].add(vb + acc * 1e-30, mode="drop")
            return g2 * 0.5, acc + g2[0]
        report(f"scatter {Eb} dup sorted", bench_rep(body, (g0, jnp.float32(0))))

    # full compaction pipeline: sort actives-first, slice, scatter
    act = jnp.asarray(rng.random(E) < 0.28)
    Eb = 262144

    def body(c):
        g, acc = c
        key = jnp.where(act, idx, jnp.int32(2**30)) + jnp.int32(acc * 1e-30)
        s_idx, = lax.sort((key,), num_keys=1, is_stable=False),
        s_idx = s_idx[0][:Eb]
        v = jnp.where(s_idx < 2**30, -0.4, 0.0)
        s_idx = jnp.where(s_idx < 2**30, s_idx, V)
        g2 = g.at[s_idx].add(v, mode="drop")
        return g2 * 0.5, acc + g2[0]
    report(f"sort+slice {Eb}+scatter pipeline",
           bench_rep(body, (g0, jnp.float32(0))))

    # segment-dedup pipeline: sort, head flags, counts via cumsum-diff,
    # unique scatter of heads only (still E-sized scatter w/ drops)
    def body(c):
        g, acc = c
        key = jnp.where(act, idx, jnp.int32(2**30)) + jnp.int32(acc * 1e-30)
        (sk,) = lax.sort((key,), num_keys=1, is_stable=False),
        sk = sk[0]
        head = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
        # count per segment: positions of next head - this head
        pos = jnp.arange(E, dtype=jnp.int32)
        # next-head position via cummax from the right is awkward; use
        # segment id + bincount-free trick: count = scatter of ones, so
        # just scatter ones at sk (same cost) — skip; here test the cheap
        # variant: unique scatter at head positions with value l_miss *
        # run length approximated by 1 (TIMING ONLY, not exact)
        live = head & (sk < 2**30)
        tgt_i = jnp.where(live, sk, V)
        g2 = g.at[tgt_i[:Eb]].add(jnp.where(live[:Eb], -0.4, 0.0),
                                  mode="drop", unique_indices=True)
        return g2 * 0.5, acc + g2[0]
    report(f"sort+dedup+unique scatter {Eb} (timing shape)",
           bench_rep(body, (g0, jnp.float32(0))))


if __name__ == "__main__":
    main()
