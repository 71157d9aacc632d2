"""Line landmarks in the sliding-window BA.

The reference's ``use_line`` path adds structural-line landmarks to the
estimator: triangulation (``feature_manager.cpp:1151-1315`` triangulateLine),
a line-only refinement with poses fixed (``estimator.cpp:4202-4270``
onlyLineOpt), joint optimization with 2-dim point-to-line residuals over every
observing frame (``estimator.cpp:4500-4537`` optimizationwithLine), outlier
culling (``feature_manager.cpp:1372-1442`` removeLineOutlier), and
marginalization of frame-0 lines (``estimator.cpp:4680-4712`` — drop set is
the line block only).

TPU redesign: lines live in a padded ``LineTracks`` table of orthonormal
4-vectors expressed in the ANCHOR-FRAME CAMERA — the reference's ``LINEINCAM``
variant (``lineProjectionFactor_incamera`` / ``_instartframe``,
line_projection_factor.cpp). Camera-anchored lines are gauge-invariant like
anchored point landmarks: a rigid motion of the window carries them along, so
they exert no authority over the yaw/position gauge that ``double2vector``
re-anchors after every solve (world-frame lines fight that re-anchoring and
drag the window — measurably, on exact-data replays). Each (line, frame)
observation yields one 2-row factor on (pose_i, pose_j, ex_cam, orth_l); the
anchor observation's pose/extrinsic Jacobians cancel analytically
(instartframe). ``onlyLineOpt`` becomes an embarrassingly-parallel batched GN:
with poses fixed every line is an independent 4-dim problem, so the whole
refinement is one ``vmap`` over a ``lax.scan`` — no Ceres graph, no ordering.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..frontend.lines import orth_to_plk, plk_to_orth
from ..geometry.se3 import pose_boxplus, pose_compose
from ..geometry.so3 import quat_to_mat
from .layout import PER_FRAME, StateLayout
from .window import WindowState


class LineTracks(NamedTuple):
    """Padded line-landmark table (``LL`` slots over ``F`` frames).

    ``obs[l, f] = [x1, y1, x2, y2]`` — segment endpoints on the undistorted
    normalized plane (``lineobs``, the per-frame observation the reference
    stores in ``lineFeaturePerFrame``).
    """

    orth: jax.Array         # [LL, 4] orthonormal line in the anchor camera
    active: jax.Array       # [LL] bool — slot in use
    solve_ok: jax.Array     # [LL] bool — is_triangulation
    start_frame: jax.Array  # [LL] int32
    obs: jax.Array          # [LL, F, 4]
    obs_valid: jax.Array    # [LL, F] bool


def empty_line_tracks(max_lines: int, num_frames: int, dtype=jnp.float32) -> LineTracks:
    ll, f = max_lines, num_frames
    return LineTracks(
        orth=jnp.zeros((ll, 4), dtype),
        active=jnp.zeros((ll,), bool),
        solve_ok=jnp.zeros((ll,), bool),
        start_frame=jnp.zeros((ll,), jnp.int32),
        obs=jnp.zeros((ll, f, 4), dtype),
        obs_valid=jnp.zeros((ll, f), bool),
    )


# ---------------------------------------------------------------------------
# Geometry helpers
# ---------------------------------------------------------------------------


def plk_cam_to_world(plk_c: jax.Array, cam_pose: jax.Array) -> jax.Array:
    """Plücker coordinates camera→world given camera pose (R_wc, t_wc):
    ``n_w = R n_c + [t]ₓ R v_c, v_w = R v_c`` (``plk_to_pose``,
    utility/line_geometry.cpp)."""
    R = quat_to_mat(cam_pose[..., 3:7])
    t = cam_pose[..., 0:3]
    n_c, v_c = plk_c[..., 0:3], plk_c[..., 3:6]
    v_w = jnp.einsum("...ij,...j->...i", R, v_c)
    n_w = jnp.einsum("...ij,...j->...i", R, n_c) + jnp.cross(t, v_w)
    return jnp.concatenate([n_w, v_w], axis=-1)


def line_residual_cam(pose_i, pose_j, ex, orth, obs4):
    """Point-to-line residual of an ANCHOR-CAMERA line observed in frame j
    (``lineProjectionFactor_incamera::Evaluate``): cam_i line → world →
    cam_j, then signed endpoint distances to the projected infinite line.
    For j == i the pose/extrinsic dependence cancels analytically — the
    reference's ``_instartframe`` variant."""
    from ..frontend.lines import plk_transform

    plk_ci = orth_to_plk(orth)
    cam_i = pose_compose(pose_i, ex)
    cam_j = pose_compose(pose_j, ex)
    plk_w = plk_cam_to_world(plk_ci, cam_i)
    plk_cj = plk_transform(plk_w, cam_j[..., 3:7], cam_j[..., 0:3])
    nc = plk_cj[..., 0:3]
    l_norm = jnp.sqrt(jnp.maximum(nc[..., 0] ** 2 + nc[..., 1] ** 2, 1e-12))
    e1 = obs4[..., 0] * nc[..., 0] + obs4[..., 1] * nc[..., 1] + nc[..., 2]
    e2 = obs4[..., 2] * nc[..., 0] + obs4[..., 3] * nc[..., 1] + nc[..., 2]
    return jnp.stack([e1, e2], axis=-1) / l_norm[..., None]


def _plane_of_obs(obs4: jax.Array, dtype):
    """Plane through the camera origin and the two endpoint rays
    (``pi_from_ppp(p1, p2, 0)``): normal = p1 × p2, d = 0."""
    p1 = jnp.stack([obs4[..., 0], obs4[..., 1], jnp.ones_like(obs4[..., 0])], axis=-1)
    p2 = jnp.stack([obs4[..., 2], obs4[..., 3], jnp.ones_like(obs4[..., 0])], axis=-1)
    return jnp.cross(p1, p2)


def triangulate_lines(state: WindowState, lines: LineTracks,
                      min_obs: int = 5, min_cos_theta: float = 0.998,
                      enabled: jax.Array | bool = True) -> LineTracks:
    """Two-view line triangulation for untriangulated slots
    (``feature_manager.cpp:1151-1315``): among all non-anchor observations,
    pick the one whose back-projected plane is most oblique to the anchor
    plane (smallest cos θ between normals, both expressed in the anchor
    camera); gate at ``cos θ ≤ 0.998``; intersect the two planes into a
    camera-frame plücker (dual-matrix construction) and store anchor-camera
    orthonormal coordinates."""
    ll, f = lines.obs_valid.shape
    dtype = lines.obs.dtype
    cams = pose_compose(state.poses, state.ex_cam)          # [F,7] world_T_cam

    used_num = jnp.sum(lines.obs_valid, axis=1)
    want = (
        lines.active & ~lines.solve_ok & (used_num >= min_obs)
        & (lines.start_frame < f - 3)
        & jnp.asarray(enabled)
    )

    def one(l_obs, l_valid, si):
        cam_i = cams[si]
        R_i = quat_to_mat(cam_i[3:7])
        t_i = cam_i[0:3]
        obs_i = l_obs[si]
        ni = _plane_of_obs(obs_i, dtype)
        ni = ni / jnp.maximum(jnp.linalg.norm(ni), 1e-12)

        # endpoints of every frame's observation, moved into cam-i coordinates
        R_j = quat_to_mat(cams[:, 3:7])                     # [F,3,3]
        t_j = cams[:, 0:3]
        R_ij = jnp.einsum("ab,fbc->fac", R_i.T, R_j)        # [F,3,3]
        t_ij = jnp.einsum("ab,fb->fa", R_i.T, t_j - t_i)    # [F,3]
        p3 = jnp.einsum("fab,fb->fa", R_ij, jnp.stack(
            [l_obs[:, 0], l_obs[:, 1], jnp.ones(f, dtype)], -1)) + t_ij
        p4 = jnp.einsum("fab,fb->fa", R_ij, jnp.stack(
            [l_obs[:, 2], l_obs[:, 3], jnp.ones(f, dtype)], -1)) + t_ij
        # plane through (p3, p4, t_ij): pi_from_ppp
        nj = jnp.cross(p3 - t_ij, p4 - t_ij)
        dj = -jnp.sum(nj * t_ij, axis=-1)
        nj_unit = nj / jnp.maximum(jnp.linalg.norm(nj, axis=-1, keepdims=True), 1e-12)

        cos_t = jnp.sum(nj_unit * ni[None, :], axis=-1)
        cand = l_valid & (jnp.arange(f) != si)
        cos_t = jnp.where(cand, cos_t, 1.0)
        jbest = jnp.argmin(cos_t)
        ok = cos_t[jbest] <= min_cos_theta

        # dual-plücker intersection of anchor plane and best plane (pipi_plk)
        pii = jnp.concatenate([ni, jnp.zeros(1, dtype)])
        pij = jnp.concatenate([nj[jbest], dj[jbest, None]])
        M = pii[:, None] * pij[None, :] - pij[:, None] * pii[None, :]
        n_c = M[0:3, 3]
        v_c = jnp.stack([M[2, 1], M[0, 2], M[1, 0]])
        plk_c = jnp.concatenate([n_c, v_c])
        # LINEINCAM: the line stays in the anchor camera's frame
        return plk_to_orth(plk_c), ok

    orth_new, tri_ok = jax.vmap(one)(lines.obs, lines.obs_valid, lines.start_frame)
    do = want & tri_ok
    orth = jnp.where(do[:, None], orth_new, lines.orth)
    return lines._replace(orth=orth, solve_ok=lines.solve_ok | do)


# ---------------------------------------------------------------------------
# Factor linearization into the dense row-block
# ---------------------------------------------------------------------------


def line_solve_mask(lines: LineTracks, num_frames: int, min_obs: int = 5) -> jax.Array:
    """The reference's per-line gate: ``used_num ≥ LINE_MIN_OBS &&
    start_frame < WINDOW_SIZE-2 && is_triangulation`` (estimator.cpp:4511)."""
    used_num = jnp.sum(lines.obs_valid, axis=1)
    return (
        lines.active & lines.solve_ok & (used_num >= min_obs)
        & (lines.start_frame < num_frames - 3)
    )


def _line_factor22(pose_i, pose_j, ex, orth, obs4, sqrt_info_scale):
    """Whitened residual + Jacobian wrt [δpose_i(6), δpose_j(6), δex(6),
    δorth(4)]. For the anchor observation (i == j) the pose/extrinsic columns
    cancel to zero (instartframe)."""

    def r_of(d):
        return sqrt_info_scale * line_residual_cam(
            pose_boxplus(pose_i, d[0:6]), pose_boxplus(pose_j, d[6:12]),
            pose_boxplus(ex, d[12:18]), orth + d[18:22], obs4,
        )

    z = jnp.zeros(22, pose_i.dtype)
    return r_of(z), jax.jacfwd(r_of)(z)


def linearize_lines(state: WindowState, lines: LineTracks, layout: StateLayout,
                    sqrt_info_scale, loss_delta, min_obs: int = 5,
                    lm_filter: jax.Array | None = None,
                    frame_filter: jax.Array | None = None):
    """All (line, frame) observation factors flattened to ``[LL·F]`` row
    pairs; each touches pose_i (anchor), pose_j, ex_cam and its own 4 line
    columns (``lineProjectionFactor_incamera``; Huber(1.0) robust loss).
    Scatter is ADDITIVE so the coinciding pose_i/pose_j columns of the anchor
    observation sum to the correct total derivative."""
    from .assembly import rows_to_dense_add
    from .factors import huber_weight

    ll, f = lines.obs_valid.shape
    line_ok = line_solve_mask(lines, f, min_obs)
    if lm_filter is not None:
        line_ok = line_ok & lm_filter

    ls = jnp.repeat(jnp.arange(ll), f)
    js = jnp.tile(jnp.arange(f), ll)
    si = lines.start_frame[ls]
    valid = line_ok[ls] & lines.obs_valid[ls, js]
    if frame_filter is not None:
        valid = valid & frame_filter[js]

    def one(l, i, j):
        return _line_factor22(
            state.poses[i], state.poses[j], state.ex_cam, lines.orth[l],
            lines.obs[l, j], sqrt_info_scale,
        )

    r, J = jax.vmap(one)(ls, si, js)             # [B,2], [B,2,22]
    w = huber_weight(jnp.sum(r * r, axis=-1), loss_delta)[:, None]
    r = r * w
    J = J * w[:, :, None]

    col_idx = jnp.concatenate(
        [
            (PER_FRAME * si)[:, None] + jnp.arange(6)[None, :],
            (PER_FRAME * js)[:, None] + jnp.arange(6)[None, :],
            jnp.tile(jnp.arange(layout.ex_cam, layout.ex_cam + 6), (ll * f, 1)),
            (layout.line0 + 4 * ls)[:, None] + jnp.arange(4)[None, :],
        ],
        axis=1,
    )  # [B, 22]
    return rows_to_dense_add(J, col_idx, r, valid, layout.total)


def line_residuals(state: WindowState, lines: LineTracks,
                   sqrt_info_scale, loss_delta, min_obs: int = 5) -> jax.Array:
    """Residual-only evaluation matching :func:`linearize_lines`'s whitening
    and robust reweighting (the LM cost probe)."""
    from .factors import huber_weight

    ll, f = lines.obs_valid.shape
    line_ok = line_solve_mask(lines, f, min_obs)
    ls = jnp.repeat(jnp.arange(ll), f)
    js = jnp.tile(jnp.arange(f), ll)
    si = lines.start_frame[ls]
    valid = line_ok[ls] & lines.obs_valid[ls, js]

    def one(l, i, j):
        return sqrt_info_scale * line_residual_cam(
            state.poses[i], state.poses[j], state.ex_cam, lines.orth[l],
            lines.obs[l, j],
        )

    r = jax.vmap(one)(ls, si, js)
    w = huber_weight(jnp.sum(r * r, axis=-1), loss_delta)[:, None]
    return jnp.where(valid[:, None], r * w, 0.0).reshape(-1)


# ---------------------------------------------------------------------------
# onlyLineOpt: batched per-line refinement with poses fixed
# ---------------------------------------------------------------------------


def _solve_spd4(H: jax.Array, g: jax.Array) -> jax.Array:
    """Unrolled 4×4 Cholesky solve — pure arithmetic (no LU/eigh lowering, so
    it runs on the TPU VPU in any dtype and vmaps for free)."""
    L = jnp.zeros_like(H)
    for i in range(4):
        s = H[i, i] - sum(L[i, k] ** 2 for k in range(i))
        di = jnp.sqrt(jnp.maximum(s, 1e-12))
        L = L.at[i, i].set(di)
        for j in range(i + 1, 4):
            s = H[j, i] - sum(L[j, k] * L[i, k] for k in range(i))
            L = L.at[j, i].set(s / di)
    # forward/back substitution, unrolled
    y = jnp.zeros(4, H.dtype)
    for i in range(4):
        y = y.at[i].set((g[i] - sum(L[i, k] * y[k] for k in range(i))) / L[i, i])
    x = jnp.zeros(4, H.dtype)
    for i in reversed(range(4)):
        x = x.at[i].set(
            (y[i] - sum(L[k, i] * x[k] for k in range(i + 1, 4))) / L[i, i]
        )
    return x


def only_line_opt(state: WindowState, lines: LineTracks, sqrt_info_scale,
                  min_obs: int = 5, iters: int = 4,
                  loss_delta: float = 1.0) -> LineTracks:
    """Line-only refinement with all poses/extrinsics held constant
    (``estimator.cpp:4202-4270``). With poses fixed the problem decouples per
    line into independent 4-dim GN solves — one ``vmap`` over a scan, every
    line refined simultaneously on the VPU."""
    from .factors import cauchy_weight

    ll, f = lines.obs_valid.shape
    dtype = lines.obs.dtype
    line_ok = line_solve_mask(lines, f, min_obs)

    def one_line(orth0, obs, obs_valid, si):
        def r_of(orth):
            def per_frame(j):
                return line_residual_cam(
                    state.poses[si], state.poses[j], state.ex_cam, orth, obs[j])

            r = jax.vmap(per_frame)(jnp.arange(f))          # [F,2]
            w = cauchy_weight(jnp.sum(r * r, axis=-1), loss_delta)[:, None]
            return jnp.where(obs_valid[:, None], sqrt_info_scale * r * w, 0.0)

        def gn_step(orth, _):
            r = r_of(orth).reshape(-1)
            J = jax.jacfwd(lambda o: r_of(o).reshape(-1))(orth)   # [2F,4]
            H = J.T @ J + 1e-6 * jnp.eye(4, dtype=dtype)
            g = J.T @ r
            d = -_solve_spd4(H, g)
            orth_new = orth + d
            better = jnp.sum(r_of(orth_new) ** 2) < jnp.sum(r * r)
            return jnp.where(better, orth_new, orth), None

        orth_fin, _ = jax.lax.scan(gn_step, orth0, None, length=iters)
        return orth_fin

    orth_new = jax.vmap(one_line)(lines.orth, lines.obs, lines.obs_valid,
                                  lines.start_frame)
    orth = jnp.where(line_ok[:, None], orth_new, lines.orth)
    return lines._replace(orth=orth)


def remove_line_outliers(state: WindowState, lines: LineTracks,
                         min_obs: int = 5, max_reproj: float = 3.0 / 500.0,
                         max_depth: float = 10.0) -> LineTracks:
    """Cull bad lines (``feature_manager.cpp:1372-1482``): negative-depth or
    far-away lines die; so does any line whose WORST point-to-line
    reprojection error over its observations exceeds ``3.0/500`` (the
    reference erases the feature outright — ``linefeature.erase`` — so a
    culled slot deactivates rather than lingering for re-triangulation; its
    factors never reach the joint solve or the marginalization prior)."""
    ll, f = lines.obs_valid.shape
    line_ok = line_solve_mask(lines, f, min_obs)

    def one(orth, obs, obs_valid, si):
        def per_frame(j):
            return line_residual_cam(
                state.poses[si], state.poses[j], state.ex_cam, orth, obs[j])

        r = jax.vmap(per_frame)(jnp.arange(f))              # [F,2]
        err = jnp.max(jnp.where(obs_valid[:, None], jnp.abs(r), 0.0))

        # distance of the line to the anchor camera: d = |n|/|v|, directly in
        # the anchor-camera parameterization
        plk_c = orth_to_plk(orth)
        d = jnp.linalg.norm(plk_c[0:3]) / jnp.maximum(jnp.linalg.norm(plk_c[3:6]), 1e-9)
        return (err < max_reproj) & (d < max_depth)

    good = jax.vmap(one)(lines.orth, lines.obs, lines.obs_valid, lines.start_frame)
    kill = line_ok & ~good
    return lines._replace(
        solve_ok=lines.solve_ok & ~kill,
        active=lines.active & ~kill,
        obs_valid=lines.obs_valid & ~kill[:, None],
    )


# ---------------------------------------------------------------------------
# Sliding
# ---------------------------------------------------------------------------


def slide_old_lines(state: WindowState, lines: LineTracks) -> LineTracks:
    """MARGIN_OLD: the observation window rolls left; lines anchored at the
    dropped frame 0 re-express their plücker coordinates in frame 1's camera
    (an exact frame change — no depth-freezing, unlike point re-anchoring);
    slots with no remaining observations die (``removeLineBack`` +
    ``removeBackShiftDepthline``). ``state`` is the PRE-slide state."""
    from ..frontend.lines import plk_transform

    anchored0 = lines.active & (lines.start_frame == 0)
    cam0 = pose_compose(state.poses[0], state.ex_cam)
    cam1 = pose_compose(state.poses[1], state.ex_cam)
    plk_c0 = orth_to_plk(lines.orth)
    plk_w = plk_cam_to_world(plk_c0, cam0)
    plk_c1 = plk_transform(plk_w, cam1[3:7], cam1[0:3])
    orth = jnp.where((anchored0 & lines.solve_ok)[:, None],
                     plk_to_orth(plk_c1), lines.orth)

    obs = jnp.roll(lines.obs, -1, axis=1).at[:, -1].set(0.0)
    obs_valid = jnp.roll(lines.obs_valid, -1, axis=1).at[:, -1].set(False)
    start_frame = jnp.maximum(lines.start_frame - 1, 0)
    active = lines.active & jnp.any(obs_valid, axis=1)
    return lines._replace(
        orth=orth, obs=obs, obs_valid=obs_valid, start_frame=start_frame,
        active=active, solve_ok=lines.solve_ok & active,
    )


def slide_new_lines(lines: LineTracks) -> LineTracks:
    """MARGIN_SECOND_NEW: frame F-2's observation is replaced by F-1's
    (``FeatureManager::removeLineFront``)."""
    ll, f = lines.obs_valid.shape
    obs = lines.obs.at[:, f - 2].set(lines.obs[:, f - 1]).at[:, f - 1].set(0.0)
    obs_valid = (
        lines.obs_valid.at[:, f - 2].set(lines.obs_valid[:, f - 1])
        .at[:, f - 1].set(False)
    )
    start_frame = jnp.where(lines.start_frame == f - 1, f - 2, lines.start_frame)
    active = lines.active & jnp.any(obs_valid, axis=1)
    return lines._replace(
        obs=obs, obs_valid=obs_valid, start_frame=start_frame, active=active,
        solve_ok=lines.solve_ok & active,
    )
