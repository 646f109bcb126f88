import numpy as np

from icp_tpu.models.pose_graph import PoseGraph2D


def np_vec_to_pose(v):
    x, y, th = v
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s, x], [s, c, y], [0, 0, 1]])


def np_rel(Ti, Tj):
    T = np.linalg.inv(Ti) @ Tj
    return np.array([T[0, 2], T[1, 2], np.arctan2(T[1, 0], T[0, 0])])


class NpPoseGraph:
    """Clean-room NumPy oracle of the reference optimizer
    (utilities/pose_graph.py:83-180), used to check parity."""

    def __init__(self):
        self.nodes = []
        self.edges = []

    def add_node(self, v):
        self.nodes.append(np.asarray(v, float).copy())
        return len(self.nodes) - 1

    def add_edge(self, i, j, z, om=None):
        om = np.eye(3) if om is None else np.asarray(om, float)
        self.edges.append((i, j, np.asarray(z, float).copy(), om.copy()))

    def _err_jac(self, i, j, z):
        xi, xj = self.nodes[i], self.nodes[j]
        th = xi[2]
        c, s = np.cos(th), np.sin(th)
        RiT = np.array([[c, s], [-s, c]])
        dt = xj[:2] - xi[:2]
        wrap = lambda a: (a + np.pi) % (2 * np.pi) - np.pi
        pred = RiT @ dt
        e = np.array([pred[0] - z[0], pred[1] - z[1],
                      wrap(wrap(xj[2] - xi[2]) - z[2])])
        dRiT = np.array([[-s, c], [-c, -s]]) @ dt
        A = np.zeros((3, 3)); A[:2, :2] = -RiT; A[:2, 2] = dRiT; A[2, 2] = -1
        B = np.zeros((3, 3)); B[:2, :2] = RiT; B[2, 2] = 1
        return e, A, B

    def optimize(self, n_iterations=20, fix_node=0, eps=1e-6):
        n = len(self.nodes)
        if n < 2 or not self.edges:
            return
        for _ in range(n_iterations):
            H = np.zeros((3 * n, 3 * n)); b = np.zeros(3 * n)
            for (i, j, z, om) in self.edges:
                e, A, B = self._err_jac(i, j, z)
                si, sj = 3 * i, 3 * j
                H[si:si+3, si:si+3] += A.T @ om @ A
                H[si:si+3, sj:sj+3] += A.T @ om @ B
                H[sj:sj+3, si:si+3] += B.T @ om @ A
                H[sj:sj+3, sj:sj+3] += B.T @ om @ B
                b[si:si+3] += A.T @ om @ e
                b[sj:sj+3] += B.T @ om @ e
            sf = 3 * fix_node
            H[sf:sf+3, :] = 0; H[:, sf:sf+3] = 0
            H[sf:sf+3, sf:sf+3] = np.eye(3) * 1e10
            b[sf:sf+3] = 0
            dx = np.linalg.solve(H, -b)
            wrap = lambda a: (a + np.pi) % (2 * np.pi) - np.pi
            for k in range(n):
                self.nodes[k][0] += dx[3*k]
                self.nodes[k][1] += dx[3*k+1]
                self.nodes[k][2] = wrap(self.nodes[k][2] + dx[3*k+2])
            if np.linalg.norm(dx) < eps:
                break


def _build_square_loop(pg, drift=0.1):
    """Square trajectory with odometry drift and one loop-closure edge."""
    true = [
        [0, 0, 0], [2, 0, 0], [4, 0, np.pi/2], [4, 2, np.pi/2],
        [4, 4, np.pi], [2, 4, np.pi], [0, 4, -np.pi/2],
        [0, 2, -np.pi/2], [0, 0.0, 0],
    ]
    rng = np.random.default_rng(0)
    noisy = [np.array(true[0], float)]
    for k in range(1, len(true)):
        noisy.append(np.array(true[k], float)
                     + rng.normal(scale=drift, size=3) * [1, 1, 0.3])
    for v in noisy:
        pg.add_node(v)
    for k in range(1, len(true)):
        z = np_rel(np_vec_to_pose(true[k-1]), np_vec_to_pose(true[k]))
        pg.add_edge(k - 1, k, z, np.eye(3))
    # loop closure: last pose is back at the first
    z_lc = np_rel(np_vec_to_pose(true[-1]), np_vec_to_pose(true[0]))
    pg.add_edge(len(true) - 1, 0, z_lc, np.eye(3) * 100.0)
    return true


def test_pose_graph_matches_numpy_oracle():
    pg = PoseGraph2D()
    ref = NpPoseGraph()
    _build_square_loop(pg)
    _build_square_loop(ref)
    pg.optimize(n_iterations=20)
    ref.optimize(n_iterations=20)
    got = np.stack(pg.nodes)
    want = np.stack(ref.nodes)
    np.testing.assert_allclose(got[:, :2], want[:, :2], atol=5e-3)
    dth = (got[:, 2] - want[:, 2] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dth, 0, atol=5e-3)


def test_pose_graph_closes_loop():
    pg = PoseGraph2D()
    true = _build_square_loop(pg, drift=0.15)
    err_before = pg.total_error()
    pg.optimize(n_iterations=30)
    err_after = pg.total_error()
    assert err_after < err_before * 0.1
    # corrected trajectory should be close to ground truth
    got = np.stack(pg.nodes)
    want = np.array(true, float)
    assert np.abs(got[:, :2] - want[:, :2]).max() < 0.25


def test_pose_graph_anchor_fixed():
    pg = PoseGraph2D()
    _build_square_loop(pg)
    first_before = pg.nodes[0].copy()
    pg.optimize(n_iterations=10, fix_node=0)
    np.testing.assert_allclose(pg.nodes[0], first_before, atol=1e-5)


def test_pose_graph_noop_cases():
    pg = PoseGraph2D()
    pg.optimize()  # no nodes: must not raise
    pg.add_node([0, 0, 0])
    pg.optimize()  # single node, no edges
    assert pg.n_nodes == 1


def test_get_poses_as_matrices():
    pg = PoseGraph2D()
    pg.add_node([1.0, 2.0, 0.5])
    T = pg.get_poses_as_matrices()[0]
    np.testing.assert_allclose(T, np_vec_to_pose([1, 2, 0.5]), atol=1e-6)
