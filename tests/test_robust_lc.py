"""Robust (DCS) loop-closure edges — models.pose_graph.robust_omega.

A bad closure with the reference's scale/err weight explosion must not
drag a consistent odometry chain when flagged robust; unflagged behavior
must match the plain reference GN exactly (default-off semantics).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from icp_tpu.models.pose_graph import PoseGraph2D, robust_omega


def _chain_graph(n=30, robust_flag=False, bad_weight=5e4):
    """Consistent straight-line odometry + ONE wildly wrong LC edge."""
    pg = PoseGraph2D()
    for k in range(n):
        pg.add_node(np.array([k * 1.0, 0.0, 0.0], np.float32))
    z = np.array([1.0, 0.0, 0.0], np.float32)
    for k in range(1, n):
        pg.add_edge(k - 1, k, z, np.eye(3, dtype=np.float32) * 100.0)
    # closure claims node n-1 sits 3 m off its true position, at the
    # near-perfect-re-match weight (the slam.py:583-597 explosion)
    z_bad = np.array([-(n - 1) + 3.0, 1.0, 0.0], np.float32)
    pg.add_edge(n - 1, 0, z_bad, np.eye(3, dtype=np.float32) * bad_weight,
                robust=robust_flag)
    return pg


def test_robust_omega_downweights_large_residuals():
    e = jnp.asarray([[0.01, 0.0, 0.0], [3.0, 1.0, 0.0]], jnp.float32)
    om = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 100.0, (2, 1, 1))
    rb = jnp.asarray([True, True])
    out = np.asarray(robust_omega(e, om, rb, 1.0))
    # tiny residual: chi2=0.01 -> s = min(1, 2/(1.01)) = 1 -> unchanged
    np.testing.assert_allclose(out[0], np.eye(3) * 100.0, rtol=1e-5)
    # large residual: chi2=1000 -> s ~ 2/1001 -> weight ~ 100 * 4e-6
    assert out[1][0, 0] < 0.01
    # unflagged edges never touched
    rb_off = jnp.asarray([False, False])
    out2 = np.asarray(robust_omega(e, om, rb_off, 1.0))
    np.testing.assert_allclose(out2, np.asarray(om), rtol=1e-6)


def test_bad_closure_drags_plain_gn_but_not_robust():
    pg_plain = _chain_graph(robust_flag=False)
    pg_plain.optimize(n_iterations=30)
    drag_plain = abs(float(pg_plain.nodes[-1][0]) - 29.0)

    pg_rob = _chain_graph(robust_flag=True)
    pg_rob.optimize(n_iterations=30)
    drag_rob = abs(float(pg_rob.nodes[-1][0]) - 29.0)

    # the uncapped bad closure owns the solve; DCS rejects it
    assert drag_plain > 1.0, drag_plain
    assert drag_rob < 0.05, drag_rob


def test_robust_consistent_closure_keeps_full_weight():
    """A CORRECT closure must survive DCS untouched: flagging good edges
    robust must not weaken their correction."""
    n = 20
    pg = PoseGraph2D()
    # drifted odometry: true poses x=k, estimates drift +0.02/step
    for k in range(n):
        pg.add_node(np.array([k * 1.02, 0.0, 0.0], np.float32))
    z = np.array([1.02, 0.0, 0.0], np.float32)   # consistent w/ estimates
    for k in range(1, n):
        pg.add_edge(k - 1, k, z, np.eye(3, dtype=np.float32))
    # ground-truth closure: node n-1 really is at x = n-1
    z_lc = np.array([-(n - 1.0), 0.0, 0.0], np.float32)
    pg.add_edge(n - 1, 0, z_lc, np.eye(3, dtype=np.float32) * 1e4,
                robust=True)
    pg.optimize(n_iterations=30)
    # strong correct closure pins the endpoint near truth
    assert abs(float(pg.nodes[-1][0]) - (n - 1.0)) < 0.05


@pytest.mark.parametrize("strategy", ["cg", "schur"])
def test_robust_matches_across_strategies(strategy):
    """DCS reweighting must give the same fixed point through the
    matrix-free PCG and distributed Schur paths as through the dense
    solve (same graph, same flags)."""
    import jax
    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.parallel.dist_pose_graph import (
        optimize_cg, optimize_schur, partition_graph)

    pg = _chain_graph(n=24, robust_flag=True)
    pg.optimize(n_iterations=30)              # dense path (24 < 2000)
    assert pg.last_strategy == "dense"
    dense_nodes = np.stack(pg.nodes)

    pg2 = _chain_graph(n=24, robust_flag=True)
    nodes, nm, ei, ej, z, om, em, rb = pg2._packed()
    mesh = make_mesh(min(4, len(jax.devices())))
    if strategy == "cg":
        out, _ = optimize_cg(mesh, jnp.asarray(nodes), jnp.asarray(nm),
                             ei, ej, z, om, em, 0, n_iterations=30,
                             robust_mask=rb, robust_phi=1.0)
    else:
        part = partition_graph(nodes.shape[0], ei, ej, z, om, em,
                               int(mesh.devices.size), 0, robust=rb)
        out, _ = optimize_schur(mesh, jnp.asarray(nodes), jnp.asarray(nm),
                                part, n_iterations=30, robust_phi=1.0)
    got = np.asarray(out)[:24]
    np.testing.assert_allclose(got, dense_nodes, atol=2e-3)


def test_optimize_divergence_guard():
    """A solve that leaves the graph WORSE than it started (or
    non-finite) must be rejected wholesale when even the damped retries
    fail — the streamed estimate is always a valid fallback (round-4
    guard; the stress-route terminal BA exploded 0.54 m -> 8e5 m
    without it)."""
    pg = _chain_graph(n=10, robust_flag=False, bad_weight=1.0)
    before_nodes = np.stack(pg.nodes)

    def corrupt(n_iterations, fix_node, convergence_eps, damping=0.0):
        for k in range(pg.n_nodes):
            pg._nodes[k] = pg._nodes[k] + 1e6
    pg._optimize_inner = corrupt
    pg.optimize(n_iterations=5)
    assert pg.last_strategy is None or "rejected" in str(pg.last_strategy)
    np.testing.assert_allclose(np.stack(pg.nodes), before_nodes)


def test_optimize_divergence_guard_lm_retry():
    """When plain GN diverges but a damped solve descends, the guard must
    ACCEPT the Levenberg-Marquardt retry instead of discarding the whole
    solve (round-5: the reject-only guard threw away the stress route's
    terminal BA that an LM retry lands). Simulated by an inner solve that
    corrupts at damping == 0 and takes a real improving step otherwise."""
    pg = _chain_graph(n=10, robust_flag=False, bad_weight=100.0)
    before = pg.total_error()
    real_inner = pg._optimize_inner

    calls = []

    def flaky(n_iterations, fix_node, convergence_eps, damping=0.0):
        calls.append(damping)
        if damping == 0.0:
            for k in range(pg.n_nodes):
                pg._nodes[k] = pg._nodes[k] + 1e6   # divergent plain GN
        else:
            real_inner(n_iterations, fix_node, convergence_eps,
                       damping=damping)
    pg._optimize_inner = flaky
    pg.optimize(n_iterations=10)
    after = pg.total_error()
    assert "+lm(" in str(pg.last_strategy), pg.last_strategy
    assert np.isfinite(after) and after < before   # chi2 DECREASED
    assert calls[0] == 0.0 and len(calls) >= 2     # retried with damping


def test_optimize_dense_lm_damping_descends():
    """The damped dense step must still descend on a normal graph and at
    damping=0 must equal the plain GN solve bit-for-bit (reference
    parity, /root/reference/utilities/pose_graph.py:92-127)."""
    from icp_tpu.models.pose_graph import optimize_dense

    pg = _chain_graph(n=12, robust_flag=False, bad_weight=100.0)
    nodes, nm, ei, ej, z, om, em, rb = pg._packed()
    args = (jnp.asarray(nodes), jnp.asarray(nm), jnp.asarray(ei),
            jnp.asarray(ej), jnp.asarray(z), jnp.asarray(om),
            jnp.asarray(em), jnp.int32(0), jnp.asarray(rb),
            jnp.float32(1.0))
    out0, _ = optimize_dense(*args, n_iterations=10)
    out0_explicit, _ = optimize_dense(*args, jnp.float32(0.0),
                                      n_iterations=10)
    np.testing.assert_array_equal(np.asarray(out0),
                                  np.asarray(out0_explicit))

    out_lm, _ = optimize_dense(*args, jnp.float32(0.1), n_iterations=10)
    from icp_tpu.models.pose_graph import total_error
    err_before = float(total_error(args[0], *args[2:7]))
    err_lm = float(total_error(jnp.asarray(out_lm), *args[2:7]))
    assert err_lm < err_before
