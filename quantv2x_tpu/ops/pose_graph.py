"""2D pose-graph optimization + cross-agent box alignment (pure jnp).

Native replacement for the reference's g2o dependency:
  - sub_modules/pose_graph_optim.py:9-150 (PoseGraphOptimization2D wrapping
    g2o SE2 vertices/edges) -> fixed-iteration Gauss-Newton on a dense
    normal system (L agents => 3L unknowns; L <= 8 so dense is optimal);
  - sub_modules/box_align_v2.py:105-439 (agent pose correction from stage-1
    detections): greedy center matching of per-agent detected boxes across
    agent pairs, Kabsch/weighted-SVD relative-pose estimates, pose graph
    solve with the ego gauge-fixed.
"""

import functools

import jax
import jax.numpy as jnp


def _wrap(a):
    return a - jnp.floor(a / (2 * jnp.pi) + 0.5) * (2 * jnp.pi)


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_pose_graph_2d(poses, edges_ij, edges_z, edges_w, iters: int = 10):
    """Gauss-Newton over SE2 poses with the first pose fixed.

    poses: (L, 3) [x, y, theta] initial estimates.
    edges_ij: (E, 2) int — constraint from pose i to pose j.
    edges_z: (E, 3) measured relative pose of j in i's frame.
    edges_w: (E,) weights (0 disables an edge — static-shape padding).
    Returns optimized (L, 3).
    """
    L = poses.shape[0]
    E = edges_ij.shape[0]

    def residual_and_jac(x):
        xi = x[edges_ij[:, 0]]
        xj = x[edges_ij[:, 1]]
        ci, si = jnp.cos(xi[:, 2]), jnp.sin(xi[:, 2])
        dx = xj[:, 0] - xi[:, 0]
        dy = xj[:, 1] - xi[:, 1]
        # measured j-in-i
        r = jnp.stack(
            [
                ci * dx + si * dy - edges_z[:, 0],
                -si * dx + ci * dy - edges_z[:, 1],
                _wrap(xj[:, 2] - xi[:, 2] - edges_z[:, 2]),
            ],
            axis=-1,
        )  # (E, 3)
        # jacobians wrt (xi, xj)
        zeros = jnp.zeros((E,))
        ones = jnp.ones((E,))
        Ji = jnp.stack([
            jnp.stack([-ci, -si, -si * dx + ci * dy], -1),
            jnp.stack([si, -ci, -ci * dx - si * dy], -1),
            jnp.stack([zeros, zeros, -ones], -1),
        ], axis=-2)                                   # (E, 3, 3)
        Jj = jnp.stack([
            jnp.stack([ci, si, zeros], -1),
            jnp.stack([-si, ci, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ], axis=-2)
        return r, Ji, Jj

    def gn_step(x, _):
        r, Ji, Jj = residual_and_jac(x)
        w = edges_w[:, None, None]
        H = jnp.zeros((3 * L, 3 * L))
        b = jnp.zeros((3 * L,))

        def scatter(H, b, Ja, Jb, ia, ib):
            HaaT = jnp.einsum("eki,ekj->eij", Ja * w, Ja)
            HabT = jnp.einsum("eki,ekj->eij", Ja * w, Jb)
            HbbT = jnp.einsum("eki,ekj->eij", Jb * w, Jb)
            ba = jnp.einsum("eki,ek->ei", Ja * w, r)
            bb = jnp.einsum("eki,ek->ei", Jb * w, r)
            idx_a = ia[:, None] * 3 + jnp.arange(3)[None, :]
            idx_b = ib[:, None] * 3 + jnp.arange(3)[None, :]
            H = H.at[idx_a[:, :, None], idx_a[:, None, :]].add(HaaT)
            H = H.at[idx_a[:, :, None], idx_b[:, None, :]].add(HabT)
            H = H.at[idx_b[:, :, None], idx_a[:, None, :]].add(
                jnp.swapaxes(HabT, -1, -2))
            H = H.at[idx_b[:, :, None], idx_b[:, None, :]].add(HbbT)
            b = b.at[idx_a].add(ba)
            b = b.at[idx_b].add(bb)
            return H, b

        H, b = scatter(H, b, Ji, Jj, edges_ij[:, 0], edges_ij[:, 1])
        # gauge fix: clamp pose 0 with a strong prior
        H = H.at[jnp.arange(3), jnp.arange(3)].add(1e6)
        H = H + 1e-6 * jnp.eye(3 * L)
        dx = jnp.linalg.solve(H, -b)
        x_new = x + dx.reshape(L, 3)
        x_new = x_new.at[:, 2].set(_wrap(x_new[:, 2]))
        return x_new, None

    out, _ = jax.lax.scan(gn_step, poses, None, length=iters)
    return out


def estimate_relative_pose_2d(src_pts, dst_pts, weights):
    """Weighted Kabsch in 2D: finds (t, theta) with dst ~= R(theta) src + t.

    src_pts/dst_pts: (N, 2); weights: (N,) (0 = padding). Returns (3,).
    """
    wsum = jnp.maximum(weights.sum(), 1e-6)
    mu_s = (src_pts * weights[:, None]).sum(0) / wsum
    mu_d = (dst_pts * weights[:, None]).sum(0) / wsum
    s = src_pts - mu_s
    d = dst_pts - mu_d
    cov = jnp.einsum("ni,nj->ij", d * weights[:, None], s)
    theta = jnp.arctan2(cov[1, 0] - cov[0, 1], cov[0, 0] + cov[1, 1])
    c, si = jnp.cos(theta), jnp.sin(theta)
    R = jnp.array([[c, -si], [si, c]])
    t = mu_d - R @ mu_s
    return jnp.array([t[0], t[1], theta])


def box_align(agent_poses_xyyaw, boxes_per_agent, boxes_mask, agent_mask,
              match_radius: float = 3.0, gn_iters: int = 10):
    """Correct noisy agent poses from per-agent detected box centers.

    agent_poses_xyyaw: (L, 3) noisy [x, y, yaw(rad)] world poses.
    boxes_per_agent: (L, M, 2) detected box centers in each agent's frame.
    boxes_mask: (L, M) bool. agent_mask: (L,).
    Returns corrected (L, 3). Parity: box_align_v2.box_alignment_relative.
    """
    L, M, _ = boxes_per_agent.shape

    def to_world(pose, pts):
        c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
        R = jnp.array([[c, -s], [s, c]])
        return pts @ R.T + pose[:2]

    world_pts = jax.vmap(to_world)(agent_poses_xyyaw, boxes_per_agent)

    pairs = [(i, j) for i in range(L) for j in range(L) if i < j]
    edges_ij, edges_z, edges_w = [], [], []
    for i, j in pairs:
        # greedy nearest matching in (noisy) world frame
        d = jnp.linalg.norm(
            world_pts[i][:, None, :] - world_pts[j][None, :, :], axis=-1
        )
        d = jnp.where(boxes_mask[i][:, None] & boxes_mask[j][None, :], d,
                      jnp.inf)
        best_j = jnp.argmin(d, axis=1)
        best_d = jnp.min(d, axis=1)
        matched = best_d < match_radius
        w = matched.astype(jnp.float32)
        # relative pose of agent j in agent i's frame from matched centers
        src = boxes_per_agent[j][best_j]      # j-frame points
        dst = boxes_per_agent[i]              # i-frame points
        z = estimate_relative_pose_2d(src, dst, w)
        n = w.sum()
        valid_edge = (n >= 2) & agent_mask[i] & agent_mask[j]
        edges_ij.append((i, j))
        edges_z.append(z)
        edges_w.append(jnp.where(valid_edge, n, 0.0))

    edges_ij = jnp.asarray(edges_ij, jnp.int32)
    edges_z = jnp.stack(edges_z)
    edges_w = jnp.stack(edges_w)
    return solve_pose_graph_2d(agent_poses_xyyaw, edges_ij, edges_z, edges_w,
                               iters=gn_iters)
