"""SE(2) pose-graph Gauss-Newton — batched edges, jitted solves.

Re-design of PoseGraph2D (/root/reference/utilities/pose_graph.py:42-195).
The reference assembles a dense 3n x 3n normal matrix edge-by-edge in Python
and calls np.linalg.solve per iteration. Here:

* error + Jacobians for ALL edges are one batched computation
  (reference's per-edge _error_and_jacobians, pose_graph.py:138-180);
* the dense H is built with two scatter-adds (block indices precomputed),
  and the GN iteration loop is a lax.while_loop — the whole optimize() is
  one XLA program;
* for large graphs a matrix-free preconditioned-CG path avoids the dense
  3n x 3n matrix entirely (Hx is an edge-gather/scatter, block-Jacobi
  preconditioner) — this is also the formulation that shards across devices
  (icp_tpu.parallel.dist_pose_graph);
* capacities (nodes/edges) are padded to power-of-two buckets so the
  growing graph reuses a handful of compiled programs.

Anchor semantics match the reference exactly (pose_graph.py:109-114): the
fixed node's rows/cols are zeroed and its diagonal block set to 1e10*I,
which decouples it from the rest of the system.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from icp_tpu.utils.masking import next_pow2
from icp_tpu.utils.se2 import wrap_angle, vec_to_pose

ANCHOR_WEIGHT = 1e10


def edge_terms(nodes, ei, ej, z, omega, edge_mask):
    """Batched error and H/b contributions for all edges.

    nodes: (N, 3) [x, y, theta]; ei/ej: (E,) int32; z: (E, 3); omega:
    (E, 3, 3); edge_mask: (E,). Returns (e, A, B) with masked edges zeroed
    via omega weighting downstream.

    Reference math: _error_and_jacobians
    (/root/reference/utilities/pose_graph.py:138-180).
    """
    xi = nodes[ei]                                   # (E, 3)
    xj = nodes[ej]
    th_i = xi[:, 2]
    c, s = jnp.cos(th_i), jnp.sin(th_i)
    # R(theta_i)^T rows: [[c, s], [-s, c]]
    dt = xj[:, :2] - xi[:, :2]                       # (E, 2)
    pred_x = c * dt[:, 0] + s * dt[:, 1]
    pred_y = -s * dt[:, 0] + c * dt[:, 1]
    dth = wrap_angle(xj[:, 2] - xi[:, 2])

    e = jnp.stack(
        [pred_x - z[:, 0], pred_y - z[:, 1], wrap_angle(dth - z[:, 2])],
        axis=-1,
    )                                                # (E, 3)

    # d(Ri^T dt)/dtheta_i rows: [[-s, c], [-c, -s]] @ dt
    dx = -s * dt[:, 0] + c * dt[:, 1]
    dy = -c * dt[:, 0] - s * dt[:, 1]

    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    A = jnp.stack([
        jnp.stack([-c, -s, dx], -1),
        jnp.stack([s, -c, dy], -1),
        jnp.stack([zeros, zeros, -ones], -1),
    ], axis=-2)                                      # (E, 3, 3)
    B = jnp.stack([
        jnp.stack([c, s, zeros], -1),
        jnp.stack([-s, c, zeros], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], axis=-2)
    return e, A, B


def robust_omega(e, omega, robust_mask, phi):
    """Dynamic Covariance Scaling (DCS, Agarwal et al. 2013) reweighting
    for flagged edges: s = min(1, 2*phi / (phi + chi2)), omega *= s^2.

    A well-explained closure (chi2 <= phi) keeps full weight; a closure
    whose residual stays large under the current estimate — or a pile of
    correlated re-closures dragging against the rest of the graph — is
    smoothly down-weighted instead of dominating the solve. Unflagged
    edges (odometry) are untouched, and with no flagged edges this is the
    reference's plain GN (/root/reference/utilities/pose_graph.py:92-127).
    Recomputed from the CURRENT estimate every GN iteration (IRLS).
    """
    chi2 = jnp.einsum("ei,eij,ej->e", e, omega, e)
    s = jnp.minimum(1.0, 2.0 * phi / (phi + chi2))
    s = jnp.where(robust_mask, s, 1.0)
    return omega * (s * s)[:, None, None]


def _block_products(e, A, B, omega, edge_mask):
    """Per-edge H blocks and b segments, masked."""
    w = edge_mask.astype(e.dtype)[:, None, None]
    om = omega * w
    AtO = jnp.einsum("eij,eik->ejk", A, om)          # A^T omega  (E, 3, 3)
    BtO = jnp.einsum("eij,eik->ejk", B, om)
    Hii = jnp.einsum("ejk,ekl->ejl", AtO, A)
    Hij = jnp.einsum("ejk,ekl->ejl", AtO, B)
    Hji = jnp.einsum("ejk,ekl->ejl", BtO, A)
    Hjj = jnp.einsum("ejk,ekl->ejl", BtO, B)
    bi = jnp.einsum("ejk,ek->ej", AtO, e)
    bj = jnp.einsum("ejk,ek->ej", BtO, e)
    return Hii, Hij, Hji, Hjj, bi, bj


def _scatter_dense(n, ei, ej, Hii, Hij, Hji, Hjj, bi, bj):
    """Assemble dense (3n, 3n) H and (3n,) b from per-edge blocks."""
    H = jnp.zeros((3 * n, 3 * n), Hii.dtype)
    b = jnp.zeros((3 * n,), bi.dtype)
    r = jnp.arange(3)

    def rows(idx):                                   # (E, 3)
        return 3 * idx[:, None] + r[None, :]

    ri, rj = rows(ei), rows(ej)
    H = H.at[ri[:, :, None], ri[:, None, :]].add(Hii)
    H = H.at[ri[:, :, None], rj[:, None, :]].add(Hij)
    H = H.at[rj[:, :, None], ri[:, None, :]].add(Hji)
    H = H.at[rj[:, :, None], rj[:, None, :]].add(Hjj)
    b = b.at[ri].add(bi)
    b = b.at[rj].add(bj)
    return H, b


@partial(jax.jit, static_argnames=("n_iterations",))
def optimize_dense(nodes, node_mask, ei, ej, z, omega, edge_mask,
                   fix_node, robust_mask=None, robust_phi=1.0,
                   damping=0.0, *,
                   n_iterations: int = 20, convergence_eps=1e-6):
    """Gauss-Newton with dense solve; whole loop is one XLA program.

    Reference: PoseGraph2D.optimize
    (/root/reference/utilities/pose_graph.py:83-134). ``robust_mask``
    flags edges for DCS reweighting (robust_omega); None/all-False keeps
    exact reference semantics. ``damping`` > 0 switches the step to
    Levenberg-Marquardt: (H + damping * diag(H)) dx = -b — used by the
    divergence-guard retry ladder (see PoseGraph2D.optimize); 0 is the
    bit-faithful reference GN step. Returns (nodes, iters_run).
    """
    n = nodes.shape[0]
    pad_diag = jnp.logical_not(node_mask)            # free padded nodes
    if robust_mask is None:
        robust_mask = jnp.zeros(ei.shape[0], bool)

    def cond(carry):
        it, _, stop = carry
        return (it < n_iterations) & jnp.logical_not(stop)

    def body(carry):
        it, cur, _ = carry
        e, A, B = edge_terms(cur, ei, ej, z, omega, edge_mask)
        om_eff = robust_omega(e, omega, robust_mask, robust_phi)
        blocks = _block_products(e, A, B, om_eff, edge_mask)
        H, b = _scatter_dense(n, ei, ej, *blocks)

        # anchor: zero row/col, big diagonal (pose_graph.py:109-114)
        idx3 = jnp.arange(3 * n)
        anchor_rows = (idx3 // 3) == fix_node
        H = jnp.where(anchor_rows[:, None] | anchor_rows[None, :], 0.0, H)
        H = H + jnp.diag(
            jnp.where(anchor_rows, ANCHOR_WEIGHT, 0.0)
            + jnp.where(jnp.repeat(pad_diag, 3), 1.0, 0.0)
        )
        b = jnp.where(anchor_rows, 0.0, b)
        # Levenberg-Marquardt diagonal scaling (no-op at damping == 0)
        H = H + jnp.diag(damping * jnp.diag(H))

        dx = jnp.linalg.solve(H, -b)
        bad = jnp.any(jnp.isnan(dx)) | jnp.any(jnp.isinf(dx))
        dx = jnp.where(bad, 0.0, dx)
        dxr = dx.reshape(n, 3)
        new = jnp.stack([
            cur[:, 0] + dxr[:, 0],
            cur[:, 1] + dxr[:, 1],
            wrap_angle(cur[:, 2] + dxr[:, 2]),
        ], axis=-1)
        new = jnp.where(node_mask[:, None], new, cur)
        step_norm = jnp.linalg.norm(dx)
        stop = bad | (step_norm < convergence_eps)
        return (it + 1, new, stop)

    it, nodes_out, _ = lax.while_loop(cond, body, (jnp.int32(0), nodes,
                                                   jnp.bool_(False)))
    return nodes_out, it


@jax.jit
def total_error(nodes, ei, ej, z, omega, edge_mask):
    """Sum of weighted squared edge errors (pose_graph.py:188-195)."""
    e, _, _ = edge_terms(nodes, ei, ej, z, omega, edge_mask)
    w = edge_mask.astype(e.dtype)
    return jnp.sum(w * jnp.einsum("ei,eij,ej->e", e, omega, e))


class PoseGraph2D:
    """Host-side growing graph with device-side batched optimization.

    API mirrors the reference class (add_node/add_edge/optimize/
    get_poses_as_matrices/total_error, pose_graph.py:42-195) so the
    orchestrator reads the same.
    """

    def __init__(self):
        self._nodes: list[np.ndarray] = []
        self._edges_i: list[int] = []
        self._edges_j: list[int] = []
        self._edges_z: list[np.ndarray] = []
        self._edges_om: list[np.ndarray] = []
        self._edges_rb: list[bool] = []     # robust (DCS) flag per edge
        self.robust_phi = 1.0               # DCS phi (chi2 scale)
        self._min_nc = 2
        self._min_ec = 2
        self._mesh = None            # set_mesh: distributed Schur solve
        self._dist_threshold = 1024
        # strategy limits (see optimize): above _cg_node_threshold nodes
        # the dense 3n x 3n solve is replaced by matrix-free PCG even
        # without a mesh; the distributed path falls back from Schur to
        # PCG when the per-device dense block (3(i_cap+s))^2 f32 would
        # exceed _schur_dense_budget bytes or the separator count exceeds
        # _max_separators (dense closure clusters make every endpoint of
        # every cross-chunk edge a separator).
        # 2000: the dense path pads to pow2 node buckets, and the TPU LU
        # custom call OOMs its scoped VMEM past a ~6k x 6k system
        # (measured: bucket 4096 -> 12288^2 LU dies; 2048 -> 6144^2 fits)
        self._cg_node_threshold = 2000
        self._schur_dense_budget = 1 << 30
        self._max_separators = 2000
        self.last_strategy = None    # "dense" | "cg" | "schur" | "dist_cg"

    def set_mesh(self, mesh, node_threshold: int = 1024):
        """Enable the distributed solve: above ``node_threshold`` nodes,
        optimize() runs the exact Schur-complement GN sharded over ``mesh``
        (parallel/dist_pose_graph.py) instead of the single-device dense
        solve. Below it the dense path stays — it is faster for small
        graphs and numerically identical (both are exact GN steps)."""
        self._mesh = mesh
        self._dist_threshold = int(node_threshold)

    def reserve(self, n_nodes: int, n_edges: int | None = None):
        """Pin the packed capacity buckets so every optimize() of a run
        compiles one program (callers that know the run length use this;
        capacities still grow past the reservation if exceeded)."""
        self._min_nc = next_pow2(max(int(n_nodes), 2))
        self._min_ec = next_pow2(max(int(n_edges if n_edges is not None
                                         else 2 * n_nodes), 2))

    # ── mutation ─────────────────────────────────────────────────────────
    def add_node(self, pose_vec) -> int:
        self._nodes.append(np.asarray(pose_vec, np.float32).copy())
        return len(self._nodes) - 1

    def add_edge(self, i, j, measurement, information=None,
                 robust: bool = False):
        """``robust=True`` flags the edge for DCS reweighting during
        optimization (loop-closure edges; see robust_omega). Default False
        = exact reference behavior."""
        self._edges_i.append(int(i))
        self._edges_j.append(int(j))
        self._edges_z.append(np.asarray(measurement, np.float32).copy())
        om = np.eye(3, dtype=np.float32) if information is None else np.asarray(
            information, np.float32
        ).copy()
        self._edges_om.append(om)
        self._edges_rb.append(bool(robust))

    @property
    def nodes(self):
        return self._nodes

    @property
    def n_nodes(self):
        return len(self._nodes)

    @property
    def n_edges(self):
        return len(self._edges_i)

    # ── packing ──────────────────────────────────────────────────────────
    def _packed(self):
        n = len(self._nodes)
        e = len(self._edges_i)
        nc = max(next_pow2(max(n, 2)), self._min_nc)
        ec = max(next_pow2(max(e, 2)), self._min_ec)
        nodes = np.zeros((nc, 3), np.float32)
        nodes[:n] = np.stack(self._nodes) if n else 0
        node_mask = np.arange(nc) < n
        ei = np.zeros(ec, np.int32)
        ej = np.zeros(ec, np.int32)
        z = np.zeros((ec, 3), np.float32)
        om = np.zeros((ec, 3, 3), np.float32)
        rb = np.zeros(ec, bool)
        if e:
            ei[:e] = self._edges_i
            ej[:e] = self._edges_j
            z[:e] = np.stack(self._edges_z)
            om[:e] = np.stack(self._edges_om)
            rb[:e] = self._edges_rb
        edge_mask = np.arange(ec) < e
        return nodes, node_mask, ei, ej, z, om, edge_mask, rb

    # ── optimisation ─────────────────────────────────────────────────────
    # Levenberg-Marquardt retry ladder for the divergence guard: each
    # rung re-runs the solve with (H + lambda diag(H)) dx = -b; larger
    # lambda = shorter, more gradient-like steps (lambda -> inf recovers
    # the untouched state, so SOME rung always stops the divergence —
    # the question the ladder answers is how much progress survives).
    _lm_ladder = (1e-3, 1e-1, 10.0, 1e3)

    def optimize(self, n_iterations=20, fix_node=0, convergence_eps=1e-6):
        """Gauss-Newton with a DIVERGENCE GUARD and a damped (LM) retry:
        the pre-solve state is snapshotted; if the plain-GN solve leaves
        the graph with a higher (or non-finite) total error than it
        started with, the solve is re-run from the snapshot with
        Levenberg-Marquardt damping, escalating lambda over _lm_ladder
        until a rung strictly DECREASES chi2. Plain GN has no line
        search / trust region; on a hard graph (e.g. many cross-heading
        closures far from linearization validity) a bad step can
        compound over iterations into an absurd trajectory — measured: a
        terminal BA on the self-intersecting stress route exploded
        0.54 m -> 8e5 m, and the round-4 reject-only guard then threw
        away a solve a damped retry lands. Only if NO rung improves is
        the solve rejected outright (streamed estimate kept). Plain GN
        that already descends never sees damping, so reference parity
        (/root/reference/utilities/pose_graph.py:92-127) is untouched."""
        if self.n_nodes < 2 or self.n_edges == 0:
            return
        before = self.total_error()
        snapshot = [v.copy() for v in self._nodes]
        self._optimize_inner(n_iterations, fix_node, convergence_eps)
        after = self.total_error()
        if np.isfinite(after) and after <= before * 1.5 + 1e-6:
            return
        diverged_to = after
        best_after = np.inf
        best_nodes = None
        best_lam = None
        for lam in self._lm_ladder:
            self._nodes = [v.copy() for v in snapshot]
            self._optimize_inner(n_iterations, fix_node, convergence_eps,
                                 damping=lam)
            after = self.total_error()
            if np.isfinite(after) and after < best_after:
                best_after = after
                best_nodes = [v.copy() for v in self._nodes]
                best_lam = lam
            if np.isfinite(after) and after < before - 1e-12:
                break                       # this rung descends; take it
        if best_nodes is not None and best_after < before - 1e-12:
            self._nodes = best_nodes
            self.last_strategy = f"{self.last_strategy}+lm({best_lam:g})"
            print(f"  [info] GN diverged (chi2 {before:.3g} -> "
                  f"{diverged_to:.3g}); LM retry lambda={best_lam:g} "
                  f"accepted (chi2 -> {best_after:.3g})")
            return
        self._nodes = snapshot
        self.last_strategy = f"{self.last_strategy}+rejected"
        print(f"  [warn] pose-graph solve rejected (chi2 "
              f"{before:.3g} -> {diverged_to:.3g}; best damped retry "
              f"{best_after:.3g}); keeping prior estimate")

    def _optimize_inner(self, n_iterations, fix_node, convergence_eps,
                        damping=0.0):
        if (self._mesh is not None
                and self._mesh.devices.size > 1
                and self.n_nodes >= self._dist_threshold):
            return self._optimize_distributed(
                n_iterations, fix_node, convergence_eps, damping
            )
        if self.n_nodes >= self._cg_node_threshold:
            # dense 3n x 3n assembly + solve is O(n^2) memory / O(n^3)
            # flops — at 50k keyframes that is 90 GB of H. Matrix-free
            # PCG on a 1-device mesh reuses the sharded formulation
            # without collectives.
            return self._optimize_cg(n_iterations, fix_node,
                                     convergence_eps, mesh=None,
                                     damping=damping)
        self.last_strategy = "dense"
        nodes, node_mask, ei, ej, z, om, edge_mask, rb = self._packed()
        out, _ = optimize_dense(
            jnp.asarray(nodes), jnp.asarray(node_mask),
            jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(z),
            jnp.asarray(om), jnp.asarray(edge_mask),
            jnp.int32(fix_node),
            jnp.asarray(rb), jnp.float32(self.robust_phi),
            jnp.float32(damping),
            n_iterations=int(n_iterations),
            convergence_eps=convergence_eps,
        )
        out = np.asarray(out)
        for k in range(self.n_nodes):
            self._nodes[k] = out[k]

    def _coarse_correct(self, fix_node: int, stride: int):
        """Hierarchical initialization for huge chains (HOG-Man-style).

        Block-Jacobi PCG propagates information roughly cg_iters nodes
        per GN step, so on a 50k-node odometry chain a loop closure's
        correction never reaches the far side and the optimizer stalls
        at the streamed trajectory (measured: 50k-keyframe ATE stuck at
        1.29 m with ate_stream == ate_final). Remedy: condense every
        ``stride``-th node into a supernode graph (segment odometry
        composed from the CURRENT estimate with information scaled by
        1/stride; each loop-closure edge re-anchored to its endpoints'
        supernodes by composing the current-estimate offsets), solve it
        with the DENSE GN (supernode count ~ n/stride ~ 1000: one small
        device solve moves information across the whole graph at once),
        then interpolate each supernode's world-frame correction along
        its segment (linear in translation, wrapped-linear in yaw).
        Local odometry is preserved to first order; the subsequent CG
        polish only has to fix short-range residuals, which is exactly
        what block-Jacobi PCG is good at."""
        n = self.n_nodes
        sup = list(range(0, n, stride))
        if sup[-1] != n - 1:
            sup.append(n - 1)
        ns = len(sup)
        sup_arr = np.asarray(sup)
        nodes_np = np.stack(self._nodes)

        def vec_to_T(v):
            c, s = np.cos(v[2]), np.sin(v[2])
            return np.array([[c, -s, v[0]], [s, c, v[1]], [0, 0, 1]],
                            np.float64)

        def T_to_vec(T):
            return np.array([T[0, 2], T[1, 2],
                             np.arctan2(T[1, 0], T[0, 0])], np.float32)

        Ts = np.zeros((n, 3, 3), np.float64)
        c = np.cos(nodes_np[:, 2]); s = np.sin(nodes_np[:, 2])
        Ts[:, 0, 0] = c; Ts[:, 0, 1] = -s; Ts[:, 0, 2] = nodes_np[:, 0]
        Ts[:, 1, 0] = s; Ts[:, 1, 1] = c; Ts[:, 1, 2] = nodes_np[:, 1]
        Ts[:, 2, 2] = 1.0

        def rel(a, b):
            Ta = Ts[a]
            R = Ta[:2, :2]
            inv = np.eye(3)
            inv[:2, :2] = R.T
            inv[:2, 2] = -R.T @ Ta[:2, 2]
            return T_to_vec(inv @ Ts[b])

        cg = PoseGraph2D()
        cg.robust_phi = self.robust_phi
        for k in sup:
            cg.add_node(nodes_np[k])
        # segment odometry from the current estimate; the segment is an
        # unconstrained chain between closures, so this is exact up to
        # the last optimize's residuals. Info ~ 1/stride (variances add)
        seg_info = np.eye(3, dtype=np.float32) / float(stride)
        for k in range(ns - 1):
            cg.add_edge(k, k + 1, rel(sup[k], sup[k + 1]), seg_info)
        # re-anchor non-chain (loop-closure) edges to their supernodes
        sup_of = np.minimum(np.round(np.arange(n) / stride).astype(int),
                            ns - 1)
        ei_a = np.asarray(self._edges_i)
        ej_a = np.asarray(self._edges_j)
        non_chain = np.where(np.abs(ei_a - ej_a) != 1)[0]
        for e in non_chain:
            i, j = int(ei_a[e]), int(ej_a[e])
            a, b = int(sup_of[i]), int(sup_of[j])
            if a == b:
                continue
            Za = vec_to_T(rel(sup[a], i))      # offset supernode -> node
            Zb = vec_to_T(rel(sup[b], j))
            Zij = vec_to_T(self._edges_z[e])
            z_ab = T_to_vec(Za @ Zij @ np.linalg.inv(Zb))
            # deliberately NOT robust at the coarse level: before the
            # first global correction a TRUE closure's residual is the
            # full accumulated drift (metres), so chi2 >> phi and DCS
            # would suppress exactly the edges this level exists to
            # apply (measured: 50k ATE stuck at 0.82 m with robust
            # coarse edges vs the target <0.3). The information cap
            # bounds outlier damage here; DCS guards the FINE polish,
            # where initialization is good and residual magnitude is
            # meaningful.
            cg.add_edge(a, b, z_ab, self._edges_om[e])
        cg.optimize(n_iterations=30,
                    fix_node=int(sup_of[fix_node]))

        # world-frame correction per supernode, interpolated along segments
        new_sup = np.stack(cg._nodes)
        dxy = new_sup[:, :2] - nodes_np[sup_arr, :2]
        dth = ((new_sup[:, 2] - nodes_np[sup_arr, 2] + np.pi)
               % (2 * np.pi) - np.pi)
        seg = np.clip(np.searchsorted(sup_arr, np.arange(n),
                                      side="right") - 1, 0, ns - 2)
        a = sup_arr[seg]
        b = sup_arr[seg + 1]
        t = (np.arange(n) - a) / np.maximum(b - a, 1)
        ddth = ((dth[seg + 1] - dth[seg] + np.pi) % (2 * np.pi)) - np.pi
        dthi = dth[seg] + ddth * t
        # rotate each node about its segment-start supernode by the
        # interpolated yaw correction (preserves intra-segment odometry
        # to first order), translate by the start correction, then
        # distribute the residual ENDPOINT mismatch linearly so both
        # supernodes land exactly on their coarse-solved poses
        rot_c = np.cos(dthi); rot_s = np.sin(dthi)
        px = nodes_np[:, 0] - nodes_np[a, 0]
        py = nodes_np[:, 1] - nodes_np[a, 1]
        qx = nodes_np[a, 0] + dxy[seg][:, 0] + rot_c * px - rot_s * py
        qy = nodes_np[a, 1] + dxy[seg][:, 1] + rot_s * px + rot_c * py
        # endpoint mismatch of each segment under the rotate-about-start
        # map (evaluated at the segment END, t=1)
        eb_c = np.cos(dth[seg + 1]); eb_s = np.sin(dth[seg + 1])
        bx = nodes_np[b, 0] - nodes_np[a, 0]
        by = nodes_np[b, 1] - nodes_np[a, 1]
        mx = (nodes_np[b, 0] + dxy[seg + 1][:, 0]
              - (nodes_np[a, 0] + dxy[seg][:, 0] + eb_c * bx - eb_s * by))
        my = (nodes_np[b, 1] + dxy[seg + 1][:, 1]
              - (nodes_np[a, 1] + dxy[seg][:, 1] + eb_s * bx + eb_c * by))
        qx = qx + t * mx
        qy = qy + t * my
        qth = nodes_np[:, 2] + dthi
        out = np.stack([qx, qy,
                        ((qth + np.pi) % (2 * np.pi)) - np.pi],
                       axis=1).astype(np.float32)
        # pin the anchored node exactly
        out[fix_node] = nodes_np[fix_node]
        for k in range(n):
            self._nodes[k] = out[k]

    # coarse-init threshold: below it plain PCG converges fine
    _coarse_threshold = 5000

    def _optimize_cg(self, n_iterations, fix_node, convergence_eps,
                     mesh=None, damping=0.0):
        """Matrix-free block-Jacobi PCG Gauss-Newton (single- or multi-
        device) — the O(edges)-memory path for graphs past the dense/Schur
        regimes. Above _coarse_threshold nodes a hierarchical coarse
        solve initializes the correction globally first (see
        _coarse_correct); the PCG then polishes locally."""
        from icp_tpu.parallel.dist_pose_graph import optimize_cg
        if mesh is None:
            from icp_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(1)
        if self.n_nodes >= self._coarse_threshold and damping == 0.0:
            # the coarse init moves the state before the damped polish;
            # on an LM retry (damping > 0) skip it so the ladder damps
            # the WHOLE correction, not just the fine level
            stride = max(2, self.n_nodes // 1000)
            self._coarse_correct(int(fix_node), stride)
        self.last_strategy = "cg" if int(mesh.devices.size) == 1 else \
            "dist_cg"
        nodes, node_mask, ei, ej, z, om, edge_mask, rb = self._packed()
        out, _ = optimize_cg(
            mesh, jnp.asarray(nodes), jnp.asarray(node_mask),
            ei, ej, z, om, edge_mask, int(fix_node),
            n_iterations=int(n_iterations), convergence_eps=convergence_eps,
            robust_mask=rb, robust_phi=self.robust_phi,
            damping=damping,
        )
        out = np.asarray(out)
        for k in range(self.n_nodes):
            self._nodes[k] = out[k]

    def _optimize_distributed(self, n_iterations, fix_node, convergence_eps,
                              damping=0.0):
        """Distributed GN sharded over the mesh — the scale path replacing
        the reference's dense O(n^3) solve
        (/root/reference/utilities/pose_graph.py:83-134).

        Strategy: partition the graph (topology-only, once per optimize
        call) and run the EXACT Schur-complement step — one local dense
        factorization + one psum round per iteration — unless the
        partition says Schur has stopped being cheap: dense closure
        clusters promote every endpoint of every cross-chunk edge to the
        separator set, and the per-device dense block is
        (3 (i_cap + s))^2 f32. Past _schur_dense_budget bytes or
        _max_separators separators, fall back to the matrix-free PCG
        step over the same mesh (O(edges) memory, psum per Hx)."""
        # deferred import: parallel.dist_pose_graph imports this module
        from icp_tpu.parallel.dist_pose_graph import (
            optimize_schur, partition_graph, schur_within_limits,
        )
        nodes, node_mask, ei, ej, z, om, edge_mask, rb = self._packed()
        n_dev = int(self._mesh.devices.size)
        part = partition_graph(nodes.shape[0], ei, ej, z, om, edge_mask,
                               n_dev, int(fix_node), robust=rb)
        if not schur_within_limits(
                part, max_separators=self._max_separators,
                cg_node_threshold=self._cg_node_threshold,
                dense_budget=self._schur_dense_budget):
            return self._optimize_cg(n_iterations, fix_node,
                                     convergence_eps, mesh=self._mesh,
                                     damping=damping)
        self.last_strategy = "schur"
        out, _ = optimize_schur(
            self._mesh, jnp.asarray(nodes), jnp.asarray(node_mask), part,
            n_iterations=int(n_iterations), convergence_eps=convergence_eps,
            robust_phi=self.robust_phi, damping=damping,
        )
        out = np.asarray(out)
        for k in range(self.n_nodes):
            self._nodes[k] = out[k]

    # ── accessors ────────────────────────────────────────────────────────
    def get_poses_as_matrices(self):
        out = []
        for v in self._nodes:
            x, y, th = float(v[0]), float(v[1]), float(v[2])
            c, s = np.cos(th), np.sin(th)
            out.append(np.array([[c, -s, x], [s, c, y], [0.0, 0.0, 1.0]],
                                np.float32))
        return out

    def total_error(self) -> float:
        if self.n_edges == 0:
            return 0.0
        nodes, _, ei, ej, z, om, edge_mask, _rb = self._packed()
        return float(total_error(
            jnp.asarray(nodes), jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(z), jnp.asarray(om), jnp.asarray(edge_mask),
        ))
