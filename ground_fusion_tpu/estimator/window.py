"""Sliding-window state as fixed-shape pytrees.

The reference scatters its window state over ~20 C++ arrays + Ceres raw
pointers (``estimator.h:267-282``: Ps, Rs, Vs, Bas, Bgs, pre_integrations,
para_Pose...). Here the whole optimizable state is two NamedTuples of
fixed-shape arrays so a window step jits once and runs entirely on device:

- :class:`WindowState` — the "camera block": poses, speed-bias, extrinsics,
  time offsets, wheel intrinsics, plane. Flattened tangent layout defined by
  :class:`.layout.StateLayout`.
- :class:`Tracks` — the landmark block: padded feature-track tensor
  ``[ML, F, 5]`` with validity masks (the reference's ``FeaturePerId`` list,
  ``feature_manager.h:103-150``, as arrays).

Sliding the window (``Estimator::slideWindow``, ``estimator.cpp:3638-3795``)
becomes array rolls + mask updates — no allocation, same shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import pose_identity, pose_apply, pose_apply_inv, pose_compose
from ..geometry.so3 import quat_conj, quat_mul
from .layout import PER_FRAME, StateLayout


class WindowState(NamedTuple):
    """Optimizable camera-block state over ``F = window_size + 1`` frames."""

    poses: jax.Array     # [F, 7] body-in-world (p, q_wxyz)
    sbs: jax.Array       # [F, 9] (v, ba, bg)
    ex_cam: jax.Array    # [7] body_T_cam
    td: jax.Array        # [] camera-IMU time offset
    ex_wheel: jax.Array  # [7] body_T_wheel
    s_wheel: jax.Array   # [3] (sx, sy, sw)
    td_wheel: jax.Array  # []
    plane_q: jax.Array   # [4] q_pw (plane-from-world)
    plane_z: jax.Array   # [] z_pw
    rcv_dt: jax.Array    # [F, 4] GNSS receiver clock bias per constellation (m)
    rcv_ddt: jax.Array   # [F] receiver clock drift (m/s)
    yaw_enu: jax.Array   # [] ENU-local yaw offset
    anc_ecef: jax.Array  # [3] ECEF anchor

    @property
    def dtype(self):
        return self.poses.dtype


class Tracks(NamedTuple):
    """Padded landmark table (``ML`` slots over ``F`` frames).

    ``obs[l, f] = [x, y, vx, vy, depth_meas]`` — undistorted normalized-plane
    coordinates, image velocity (normalized units/s), and the RGBD depth
    sample (0 where absent), mirroring ``FeaturePerFrame``
    (``feature_manager.h:58-99``).
    """

    inv_depth: jax.Array    # [ML] inverse depth in the anchor frame
    active: jax.Array      # [ML] bool — slot in use
    solve_ok: jax.Array    # [ML] bool — triangulated / depth good (flag != failed)
    depth_fixed: jax.Array  # [ML] bool — depth measured by RGBD, held constant
    start_frame: jax.Array  # [ML] int32 anchor frame index
    obs: jax.Array          # [ML, F, 5]
    obs_valid: jax.Array    # [ML, F] bool


def empty_state(num_frames: int, dtype=jnp.float32) -> WindowState:
    eye = pose_identity(dtype)
    return WindowState(
        poses=jnp.tile(eye, (num_frames, 1)),
        sbs=jnp.zeros((num_frames, 9), dtype),
        ex_cam=eye,
        td=jnp.zeros((), dtype),
        ex_wheel=eye,
        s_wheel=jnp.ones((3,), dtype),
        td_wheel=jnp.zeros((), dtype),
        plane_q=jnp.array([1.0, 0, 0, 0], dtype),
        plane_z=jnp.zeros((), dtype),
        rcv_dt=jnp.zeros((num_frames, 4), dtype),
        rcv_ddt=jnp.zeros((num_frames,), dtype),
        yaw_enu=jnp.zeros((), dtype),
        anc_ecef=jnp.zeros((3,), dtype),
    )


def empty_tracks(max_landmarks: int, num_frames: int, dtype=jnp.float32) -> Tracks:
    ml, f = max_landmarks, num_frames
    return Tracks(
        inv_depth=jnp.full((ml,), 0.2, dtype),
        active=jnp.zeros((ml,), bool),
        solve_ok=jnp.zeros((ml,), bool),
        depth_fixed=jnp.zeros((ml,), bool),
        start_frame=jnp.zeros((ml,), jnp.int32),
        obs=jnp.zeros((ml, f, 5), dtype),
        obs_valid=jnp.zeros((ml, f), bool),
    )


# ---------------------------------------------------------------------------
# Tangent-space flatten / retract against the StateLayout
# ---------------------------------------------------------------------------


def retract(state: WindowState, delta: jax.Array, layout: StateLayout) -> WindowState:
    """Apply a flat tangent update (layout order) to the camera block.

    Pose blocks use the manifold ⊞ (p += δp, q ⊗ deltaQ(δθ)); everything else
    is additive — identical to the reference's local parameterizations.
    """
    from ..geometry.se3 import pose_boxplus

    f = state.poses.shape[0]
    d_frames = delta[: PER_FRAME * f].reshape(f, PER_FRAME)
    poses = pose_boxplus(state.poses, d_frames[:, 0:6])
    sbs = state.sbs + d_frames[:, 6:15]
    ex_cam = pose_boxplus(state.ex_cam, delta[layout.ex_cam : layout.ex_cam + 6])
    td = state.td + delta[layout.td]
    ex_wheel = pose_boxplus(state.ex_wheel, delta[layout.ex_wheel : layout.ex_wheel + 6])
    s_wheel = state.s_wheel + delta[layout.s_wheel : layout.s_wheel + 3]
    td_wheel = state.td_wheel + delta[layout.td_wheel]
    from ..geometry.so3 import quat_exp, quat_normalize

    plane_q = quat_normalize(
        quat_mul(state.plane_q, quat_exp(delta[layout.plane : layout.plane + 3]))
    )
    plane_z = state.plane_z + delta[layout.plane + 3]
    rcv_dt = state.rcv_dt + delta[layout.gnss_dt : layout.gnss_dt + 4 * f].reshape(f, 4)
    rcv_ddt = state.rcv_ddt + delta[layout.gnss_ddt : layout.gnss_ddt + f]
    yaw_enu = state.yaw_enu + delta[layout.yaw_enu]
    anc_ecef = state.anc_ecef + delta[layout.anc_ecef : layout.anc_ecef + 3]
    return WindowState(poses, sbs, ex_cam, td, ex_wheel, s_wheel, td_wheel,
                       plane_q, plane_z, rcv_dt, rcv_ddt, yaw_enu, anc_ecef)


def boxminus(state: WindowState, ref: WindowState, layout: StateLayout) -> jax.Array:
    """Flat tangent difference ``state ⊟ ref`` in layout order — the Δx the
    marginalization prior evaluates (``marginalization_factor.cpp:356-375``)."""
    dp = state.poses[:, 0:3] - ref.poses[:, 0:3]
    dq = 2.0 * quat_mul(quat_conj(ref.poses[:, 3:7]), state.poses[:, 3:7])[..., 1:4]
    dsb = state.sbs - ref.sbs
    d_frames = jnp.concatenate([dp, dq, dsb], axis=-1).reshape(-1)
    d_ex = jnp.concatenate(
        [
            state.ex_cam[0:3] - ref.ex_cam[0:3],
            2.0 * quat_mul(quat_conj(ref.ex_cam[3:7]), state.ex_cam[3:7])[1:4],
        ]
    )
    d_exw = jnp.concatenate(
        [
            state.ex_wheel[0:3] - ref.ex_wheel[0:3],
            2.0 * quat_mul(quat_conj(ref.ex_wheel[3:7]), state.ex_wheel[3:7])[1:4],
        ]
    )
    d_plane = jnp.concatenate(
        [
            2.0 * quat_mul(quat_conj(ref.plane_q), state.plane_q)[1:4],
            (state.plane_z - ref.plane_z)[None],
        ]
    )
    return jnp.concatenate(
        [
            d_frames,
            d_ex,
            (state.td - ref.td)[None],
            d_exw,
            state.s_wheel - ref.s_wheel,
            (state.td_wheel - ref.td_wheel)[None],
            d_plane,
            (state.rcv_dt - ref.rcv_dt).reshape(-1),
            state.rcv_ddt - ref.rcv_ddt,
            (state.yaw_enu - ref.yaw_enu)[None],
            state.anc_ecef - ref.anc_ecef,
        ]
    )


# ---------------------------------------------------------------------------
# Sliding (device-side part)
# ---------------------------------------------------------------------------


def slide_old_state(state: WindowState) -> WindowState:
    """MARGIN_OLD: drop frame 0, duplicate the newest into the freed slot
    (``Estimator::slideWindow`` MARGIN_OLD branch, ``estimator.cpp:3648-3704``:
    after the swap loop, slot WINDOW_SIZE keeps a copy of the newest state as
    the prediction for the incoming frame)."""
    poses = jnp.roll(state.poses, -1, axis=0).at[-1].set(state.poses[-1])
    sbs = jnp.roll(state.sbs, -1, axis=0).at[-1].set(state.sbs[-1])
    rcv_dt = jnp.roll(state.rcv_dt, -1, axis=0).at[-1].set(state.rcv_dt[-1])
    rcv_ddt = jnp.roll(state.rcv_ddt, -1, axis=0).at[-1].set(state.rcv_ddt[-1])
    return state._replace(poses=poses, sbs=sbs, rcv_dt=rcv_dt, rcv_ddt=rcv_ddt)


def slide_new_state(state: WindowState) -> WindowState:
    """MARGIN_SECOND_NEW: frame F-2 is overwritten by frame F-1
    (``estimator.cpp:3706-3760``)."""
    f = state.poses.shape[0]
    poses = state.poses.at[f - 2].set(state.poses[f - 1])
    sbs = state.sbs.at[f - 2].set(state.sbs[f - 1])
    rcv_dt = state.rcv_dt.at[f - 2].set(state.rcv_dt[f - 1])
    rcv_ddt = state.rcv_ddt.at[f - 2].set(state.rcv_ddt[f - 1])
    return state._replace(poses=poses, sbs=sbs, rcv_dt=rcv_dt, rcv_ddt=rcv_ddt)


def slide_old_tracks(state: WindowState, tracks: Tracks) -> Tracks:
    """MARGIN_OLD landmark bookkeeping (``FeatureManager::removeBackShiftDepth``,
    ``feature_manager.cpp:818-857``): features anchored at frame 0 re-anchor to
    frame 1 with depth re-projected through the relative pose; features that
    lose all observations deactivate; all windows roll left.

    ``state`` must be the *pre-slide* state (frame 0 still present)."""
    ml, f = tracks.obs_valid.shape
    dtype = tracks.obs.dtype
    anchored0 = tracks.active & (tracks.start_frame == 0)

    # world point from anchor 0, re-projected into frame 1's camera
    cam0 = pose_compose(state.poses[0], state.ex_cam)
    cam1 = pose_compose(state.poses[1], state.ex_cam)
    uv0 = tracks.obs[:, 0, 0:2]
    ray0 = jnp.concatenate([uv0, jnp.ones((ml, 1), dtype)], axis=-1)
    depth0 = 1.0 / jnp.maximum(tracks.inv_depth, 1e-6)
    pts_w = pose_apply(cam0, ray0 * depth0[:, None])
    pts_c1 = pose_apply_inv(cam1, pts_w)
    new_depth = pts_c1[:, 2]
    # depth-fixed (RGBD-measured) landmarks re-anchor to the SENSOR depth at
    # the new anchor frame when one is available — the reference reprojects
    # through the pose chain (feature_manager.cpp:838-845), which freezes any
    # instantaneous pose error into the held-constant depth forever; the
    # measured depth has no such feedback loop
    meas1 = tracks.obs[:, 1, 4]
    use_meas = tracks.depth_fixed & (meas1 > 0.1)
    new_depth = jnp.where(use_meas, meas1, new_depth)
    seen_at_1 = tracks.obs_valid[:, 1]
    shift_ok = anchored0 & seen_at_1 & (new_depth > 0.1)

    inv_depth = jnp.where(shift_ok, 1.0 / jnp.maximum(new_depth, 1e-3), tracks.inv_depth)
    active = tracks.active & jnp.where(anchored0, shift_ok, True)
    solve_ok = tracks.solve_ok & active
    start_frame = jnp.maximum(tracks.start_frame - 1, 0)

    obs = jnp.roll(tracks.obs, -1, axis=1).at[:, -1].set(0.0)
    obs_valid = jnp.roll(tracks.obs_valid, -1, axis=1).at[:, -1].set(False)
    # a slot with no remaining observations dies
    active = active & jnp.any(obs_valid, axis=1)
    return Tracks(inv_depth, active, solve_ok, tracks.depth_fixed, start_frame, obs, obs_valid)


def slide_new_tracks(tracks: Tracks) -> Tracks:
    """MARGIN_SECOND_NEW landmark bookkeeping (``FeatureManager::removeFront``,
    ``feature_manager.cpp:859-884``): observations at frame F-2 are replaced by
    those at F-1; anchors at F-1 move to F-2."""
    ml, f = tracks.obs_valid.shape
    obs = tracks.obs.at[:, f - 2].set(tracks.obs[:, f - 1]).at[:, f - 1].set(0.0)
    obs_valid = (
        tracks.obs_valid.at[:, f - 2].set(tracks.obs_valid[:, f - 1]).at[:, f - 1].set(False)
    )
    start_frame = jnp.where(tracks.start_frame == f - 1, f - 2, tracks.start_frame)
    active = tracks.active & jnp.any(obs_valid, axis=1)
    return tracks._replace(
        obs=obs, obs_valid=obs_valid, start_frame=start_frame, active=active,
        solve_ok=tracks.solve_ok & active,
    )
