"""Multi-device sharding tests on the 8-way virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

import importlib.util
import os

from icp_tpu.parallel.mesh import make_mesh
from icp_tpu.parallel.sweep_shard import sweep_scores_sharded
from icp_tpu.parallel.dist_pose_graph import gn_step_sharded, gn_step_cg_sharded
from icp_tpu.parallel.sharded_grid import raytrace_update_sharded
from icp_tpu.ops.sweep import sweep_scores
from icp_tpu.ops.raytrace import raytrace_update
from icp_tpu.models.pose_graph import optimize_dense
import pytest

pytestmark = pytest.mark.slow


def _graft():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_sweep_sharded_matches_single():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-3, 3, (64, 2)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(-3, 3, (64, 2)), jnp.float32)
    m = jnp.ones(64, bool)
    angles = jnp.asarray(np.linspace(-np.pi, np.pi, 32), jnp.float32)
    toff = jnp.zeros(2, jnp.float32)
    mesh = make_mesh(8)
    got = sweep_scores_sharded(mesh, src, m, tgt, m, angles, toff, chunk=4)
    want = sweep_scores(src, m, tgt, m, angles, toff, chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def _graph(rng, n_nodes=12, per_dev=3, n_dev=8):
    n_edges = per_dev * n_dev
    nodes = jnp.asarray(
        np.cumsum(rng.normal(scale=0.2, size=(n_nodes, 3)), 0), jnp.float32)
    node_mask = jnp.ones(n_nodes, bool)
    ei = jnp.asarray(np.arange(n_edges) % (n_nodes - 1), jnp.int32)
    ej = ei + 1
    z = jnp.asarray(rng.normal(scale=0.1, size=(n_edges, 3)), jnp.float32)
    om = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n_edges, 3, 3))
    edge_mask = jnp.ones(n_edges, bool)
    return nodes, node_mask, ei, ej, z, om, edge_mask


def test_gn_sharded_matches_dense_single_step():
    rng = np.random.default_rng(1)
    nodes, nm, ei, ej, z, om, em = _graph(rng)
    mesh = make_mesh(8)
    got = gn_step_sharded(mesh, nodes, nm, ei, ej, z, om, em, jnp.int32(0))
    want, _ = optimize_dense(nodes, nm, ei, ej, z, om, em, jnp.int32(0),
                             n_iterations=1, convergence_eps=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


def test_gn_cg_matches_dense_single_step():
    rng = np.random.default_rng(2)
    nodes, nm, ei, ej, z, om, em = _graph(rng)
    mesh = make_mesh(8)
    got = gn_step_cg_sharded(mesh, nodes, nm, ei, ej, z, om, em,
                             jnp.int32(0), cg_iters=100)
    want, _ = optimize_dense(nodes, nm, ei, ej, z, om, em, jnp.int32(0),
                             n_iterations=1, convergence_eps=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-2, atol=1e-3)


def test_raytrace_sharded_matches_single():
    rng = np.random.default_rng(3)
    grid = jnp.zeros((40, 40), jnp.float32)
    origin = jnp.asarray([20, 20], jnp.int32)
    hits = jnp.asarray(rng.integers(0, 40, (32, 2)), jnp.int32)
    ok = jnp.ones(32, bool)
    args = (jnp.float32(0.85), jnp.float32(-0.4),
            jnp.float32(-8.0), jnp.float32(8.0))
    mesh = make_mesh(8)
    got = raytrace_update_sharded(mesh, grid, origin, hits, ok, *args,
                                  max_steps=64)
    want = raytrace_update(grid, origin, hits, ok, *args, max_steps=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gn_schur_matches_dense_single_step():
    """Distributed Schur-complement reduction is EXACT: one step matches
    the dense reference iteration, including loop-closure cross edges and
    padded/masked edges."""
    from icp_tpu.parallel.dist_pose_graph import (
        partition_graph, gn_step_schur_sharded,
    )
    rng = np.random.default_rng(5)
    n = 40
    # odometry chain + 3 loop closures spanning chunks + 2 masked edges
    ei_l = list(range(n - 1)) + [2, 11, 5] + [0, 0]
    ej_l = list(range(1, n)) + [31, 38, 22] + [1, 2]
    E = len(ei_l)
    nodes = jnp.asarray(
        np.cumsum(rng.normal(scale=0.2, size=(n, 3)), 0), jnp.float32)
    nm = jnp.ones(n, bool)
    z = jnp.asarray(rng.normal(scale=0.1, size=(E, 3)), jnp.float32)
    om_np = rng.normal(size=(E, 3, 3)).astype(np.float32)
    om_np = om_np @ om_np.transpose(0, 2, 1) + 3 * np.eye(3, dtype=np.float32)
    om = jnp.asarray(om_np)
    em = jnp.asarray([True] * (E - 2) + [False, False])
    ei = jnp.asarray(ei_l, jnp.int32)
    ej = jnp.asarray(ej_l, jnp.int32)

    mesh = make_mesh(8)
    part = partition_graph(n, ei, ej, z, om, em, 8, fix_node=0)
    assert part.sep_ids.size < n          # separator is a strict subset
    got = gn_step_schur_sharded(mesh, nodes, nm, part)
    want, _ = optimize_dense(nodes, nm, ei, ej, z, om, em, jnp.int32(0),
                             n_iterations=1, convergence_eps=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_raytrace_block_sharded_matches_single():
    """Grid-block (row) sharded map update == single-device full-grid
    update; the log-odds array stays sharded in and out."""
    from icp_tpu.parallel.sharded_grid import (
        raytrace_update_block_sharded, block_sharding,
    )
    rng = np.random.default_rng(4)
    ny, nx = 64, 40                       # 8 row blocks of 8 rows
    mesh = make_mesh(8)
    grid_host = jnp.asarray(rng.normal(0, 0.5, (ny, nx)), jnp.float32)
    grid = jax.device_put(grid_host, block_sharding(mesh))
    origin = jnp.asarray([17, 33], jnp.int32)
    # include out-of-bounds endpoints: parity must cover the drop path
    hits = jnp.asarray(rng.integers(-8, 72, (48, 2)), jnp.int32)
    ok = jnp.asarray(rng.random(48) > 0.1)
    args = (jnp.float32(0.85), jnp.float32(-0.4),
            jnp.float32(-8.0), jnp.float32(8.0))
    got = raytrace_update_block_sharded(mesh, grid, origin, hits, ok, *args,
                                        max_steps=96)
    assert got.sharding.spec == jax.sharding.PartitionSpec("d", None)
    want = raytrace_update(grid_host, origin, hits, ok, *args, max_steps=96)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # deduplicated free-cell scatter (RLE compaction): sum-exact vs the
    # duplicate scatter, on both the compact path and the overflow
    # fallback (cap 8 << unique cells)
    for cap in (512, 8):
        got_d = raytrace_update_block_sharded(
            mesh, grid, origin, hits, ok, *args, max_steps=96,
            free_unique_cap=cap)
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(want),
                                   atol=1e-4)


def test_graft_entry_compiles():
    mod = _graft()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    R = np.asarray(out[0])
    assert np.isfinite(R).all()
    # recovers the 0.3 rad rotation baked into the example
    th = np.arctan2(R[1, 0], R[0, 0])
    assert abs(th - 0.3) < 0.05


def test_graft_dryrun_multichip():
    mod = _graft()
    mod.dryrun_multichip(8)


def test_optimize_schur_converges_like_dense():
    """Multi-iteration Schur GN reaches the dense optimizer's fixed point."""
    from icp_tpu.parallel.dist_pose_graph import (
        partition_graph, optimize_schur,
    )
    rng = np.random.default_rng(6)
    nodes, nm, ei, ej, z, om, em = _graph(rng, n_nodes=24, per_dev=4)
    mesh = make_mesh(8)
    part = partition_graph(24, ei, ej, z, om, em, 8, fix_node=0)
    got, it_s = optimize_schur(mesh, nodes, nm, part, n_iterations=20)
    want, _ = optimize_dense(nodes, nm, ei, ej, z, om, em, jnp.int32(0),
                             n_iterations=20)
    assert it_s <= 20
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)
