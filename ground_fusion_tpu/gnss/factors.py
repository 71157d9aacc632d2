"""Device-side GNSS factors: pseudorange/Doppler + receiver clock chain.

TPU-native re-design of the tight GNSS coupling (``factor/
gnss_psr_dopp_factor.cpp:51-106`` psr+dopp residual with Sagnac, elevation
weighting and state interpolation between bracketing keyframes;
``gnss_dt_ddt_factor.cpp`` clock random-walk, coeff 50;
``gnss_ddt_smooth_factor.cpp`` drift smoothness, GNSS_DDT_WEIGHT): all epochs
of the window linearize as one vmapped batch over the padded ``[F, S]``
observation table; satellite positions/clocks and atmospheric delays are
host-precomputed constants (ephemeris evaluation is scalar/low-rate, SURVEY §7
stage 6), while everything touching optimized state — anchor, yaw, clocks,
poses, velocities — stays inside the differentiated residual.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..estimator.assembly import rows_to_dense
from ..estimator.layout import PER_FRAME, StateLayout
from ..estimator.window import WindowState
from .coords import EARTH_OMG, LIGHT_SPEED, WGS84_A, WGS84_E2

PSR_TO_DOPP_RATIO = 5.0
DT_INFO_COEFF = 50.0
DT_ANCHOR_COEFF = 1000.0  # gnss_dt_anchor_factor.hpp:12


def dt_anchor_factor(rcv_dt, coeff: float = DT_ANCHOR_COEFF):
    """gnss_dt_anchor_factor.cpp:5-18: anchor a receiver clock bias to 0 —
    r = dt·coeff, J = coeff. (Shipped but unreferenced in the estimator
    build; provided for factor-library parity.)"""
    r = jnp.atleast_1d(rcv_dt * coeff)
    return r, jnp.full((1, 1), coeff, dtype=r.dtype)
RELATIVE_SQRT_INFO = 10.0


class GnssObsWindow(NamedTuple):
    """Padded per-window satellite observations ([F, S] slots; slot (k, s)
    is an epoch bracketed by frames k and k+1 with interpolation ``ratio``
    and receiver clock dt[k]/ddt[k] — the reference's ``gnss_meas_buf[i]`` ↔
    ``para_rcv_dt + i·4`` pairing, estimator.cpp:3178-3207).

    REDUCED-OBSERVABLE form (round 5, f32 production viability): the
    reference evaluates absolute ECEF pseudorange geometry in Ceres doubles;
    at f32 the ~2.4e7 m ranges quantize at ~2 m and the anchor at ~0.4 m, so
    tight GNSS cannot work on the TPU's native dtype. Here every observation
    is reduced at HOST ingest (float64, :meth:`..gnss.ingest.reduce_obs`)
    against the alignment-time expansion anchor ``anc0``/its ENU rotation
    ``R0``, and the device residual touches only SMALL well-conditioned
    quantities: the state's anchor column becomes the ENU delta from anc0,
    range enters as the stable quadratic correction
    ``Δrng = (|d|² − 2 d·rvec0)/(rng0 + rng)``, and both Sagnac terms enter
    through precomputed direction vectors. Device math error < 1e-4 m at
    f32 (vs ~2 m for the absolute form)."""

    rvec0: jax.Array      # [F,S,3] R0ᵀ·(sat_pos − anc0)  (ENU, from anc0)
    rng0: jax.Array       # [F,S] ‖sat_pos − anc0‖ (denominators/units only)
    psr_red: jax.Array    # [F,S] psr − rng0 − sagnac0 + svdt·c − atm − tgd·c
    dopp_red: jax.Array   # [F,S] dopp_wl − svddt·c + Ω/c·ẑ·(sv_vel × anc0)
    sv_vel: jax.Array     # [F,S,3] R0ᵀ·sat velocity (ENU)
    sagnac_vec: jax.Array  # [F,S,3] Ω/c·R0ᵀ·(ẑ_ecef × sat_pos)
    dsag_vec: jax.Array   # [F,S,3] Ω/c·R0ᵀ·(ẑ_ecef × sv_vel)
    sys: jax.Array        # [F,S] int32 constellation 0..3
    pr_weight: jax.Array  # [F,S] sin(el)²/pr_uura · 10
    dp_weight: jax.Array  # [F,S] sin(el)²/dp_uura · 10 · PSR_TO_DOPP_RATIO
    ratio: jax.Array      # [F,S] interpolation toward frame k (reference
                          #       ts_ratio: epoch k sits between frames k, k+1)
    valid: jax.Array      # [F,S] bool


def empty_gnss_obs(num_frames: int, max_sats: int, dtype=jnp.float32) -> GnssObsWindow:
    f, s = num_frames, max_sats
    z = jnp.zeros((f, s), dtype)
    z3 = jnp.zeros((f, s, 3), dtype)
    return GnssObsWindow(
        rvec0=z3, rng0=z, psr_red=z, dopp_red=z, sv_vel=z3,
        sagnac_vec=z3, dsag_vec=z3,
        sys=jnp.zeros((f, s), jnp.int32), pr_weight=z, dp_weight=z,
        ratio=z, valid=jnp.zeros((f, s), bool),
    )


def ecef2rotation_j(ref: jax.Array) -> jax.Array:
    """Differentiable ENU rotation at an ECEF point (jnp twin of
    coords.ecef2rotation — the anchor is an optimized variable)."""
    x, y, z = ref[0], ref[1], ref[2]
    lon = jnp.arctan2(y, x)
    p = jnp.sqrt(x * x + y * y)
    lat = jnp.arctan2(z, p * (1.0 - WGS84_E2))

    def body(_, lat):
        sl = jnp.sin(lat)
        n = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * sl * sl)
        h = p / jnp.cos(lat) - n
        return jnp.arctan2(z, p * (1.0 - WGS84_E2 * n / (n + h)))

    lat = jax.lax.fori_loop(0, 5, body, lat)
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    so, co = jnp.sin(lon), jnp.cos(lon)
    return jnp.stack([
        jnp.stack([-so, -sl * co, cl * co]),
        jnp.stack([co, -sl * so, cl * so]),
        jnp.stack([jnp.zeros_like(so), cl, sl]),
    ])


def psr_dopp_residual_raw(Pi, Vi, Pj, Vj, rcv_dt, rcv_ddt, yaw_enu, danc_enu, o):
    """The 2-dim (psr, dopp) residual of gnss_psr_dopp_factor.cpp:51-106 in
    the REDUCED-OBSERVABLE form (see :class:`GnssObsWindow`), already
    multiplied by the elevation/URA weights. ``danc_enu`` is the anchor's
    ENU delta from the host-side expansion anchor anc0; every quantity here
    is O(km) or smaller, so the math is f32-stable.

    Range correction: with d = receiver ENU offset from anc0,
    ``rng² = rng0² − 2 d·rvec0 + |d|²``, so
    ``Δrng = rng − rng0 = q / (rng0 + rng)`` with ``q = |d|² − 2 d·rvec0``,
    evaluated by one fixed-point pass — catastrophic-cancellation-free.
    Sagnac terms use ``ẑ·(a × b)`` identities:
    ``ẑ·(sat × P) = ẑ·(sat × anc0) + (Ω/c·R0ᵀ(ẑ × sat))·d`` (constant part
    folded into psr_red at ingest; the direction vector is precomputed)."""
    ratio = o["ratio"]
    local_pos = ratio * Pi + (1.0 - ratio) * Pj
    local_vel = ratio * Vi + (1.0 - ratio) * Vj
    sy, cy = jnp.sin(yaw_enu), jnp.cos(yaw_enu)
    R_enu_local = jnp.stack([
        jnp.stack([cy, -sy, jnp.zeros_like(cy)]),
        jnp.stack([sy, cy, jnp.zeros_like(cy)]),
        jnp.stack([jnp.zeros_like(cy), jnp.zeros_like(cy), jnp.ones_like(cy)]),
    ])
    d = R_enu_local @ local_pos + danc_enu          # receiver ENU offset
    V = R_enu_local @ local_vel                     # receiver ENU velocity

    rvec0, rng0 = o["rvec0"], o["rng0"]
    q = jnp.dot(d, d) - 2.0 * jnp.dot(d, rvec0)
    drng = q / (2.0 * rng0)
    drng = q / (2.0 * rng0 + drng)                  # q/(rng0+rng), one pass
    r0 = (drng + jnp.dot(o["sagnac_vec"], d) + rcv_dt - o["psr_red"]) \
        * o["pr_weight"]

    unit = (rvec0 - d) / jnp.maximum(rng0 + drng, 1e-6)
    dopp_est = (jnp.dot(o["sv_vel"] - V, unit)
                + jnp.dot(o["dsag_vec"], d) + jnp.dot(o["sagnac_vec"], V)
                + rcv_ddt)
    r1 = (dopp_est + o["dopp_red"]) * o["dp_weight"]
    return jnp.stack([r0, r1])


def linearize_gnss_psr_dopp(state: WindowState, obs: GnssObsWindow,
                            gnss_ready: jax.Array, layout: StateLayout,
                            slot_filter: jax.Array | None = None):
    """All psr/dopp factors of the window → dense rows.

    Tangent per factor: [δPi(3), δVi(3), δPj(3), δVj(3), δdt, δddt, δyaw,
    δanc(3)] = 16 columns (the position/velocity parts of the bracketing
    frames — the factor never touches rotations, matching the reference's
    <2,7,9,7,9,1,1,1,3> zero blocks)."""
    f, s = obs.valid.shape
    dtype = state.poses.dtype
    ks = jnp.repeat(jnp.arange(f), s)          # epoch slot k ↔ frames (k, k+1)
    kj = jnp.minimum(ks + 1, f - 1)

    flat = jax.tree_util.tree_map(lambda a: a.reshape((f * s,) + a.shape[2:]), obs)
    valid = flat.valid & (ks <= f - 2) & gnss_ready
    if slot_filter is not None:
        valid = valid & slot_filter[ks]

    def one(b):
        kp, k = ks[b], kj[b]                   # i = slot, j = slot + 1
        o = {
            "rvec0": flat.rvec0[b], "rng0": flat.rng0[b],
            "psr_red": flat.psr_red[b], "dopp_red": flat.dopp_red[b],
            "sv_vel": flat.sv_vel[b],
            "sagnac_vec": flat.sagnac_vec[b], "dsag_vec": flat.dsag_vec[b],
            "pr_weight": flat.pr_weight[b], "dp_weight": flat.dp_weight[b],
            "ratio": flat.ratio[b],
        }
        dt_val = state.rcv_dt[kp, flat.sys[b]]
        ddt_val = state.rcv_ddt[kp]

        def r_of(d):
            return psr_dopp_residual_raw(
                state.poses[kp, 0:3] + d[0:3], state.sbs[kp, 0:3] + d[3:6],
                state.poses[k, 0:3] + d[6:9], state.sbs[k, 0:3] + d[9:12],
                dt_val + d[12], ddt_val + d[13], state.yaw_enu + d[14],
                state.anc_ecef + d[15:18], o,
            )

        z = jnp.zeros(18, dtype)
        r = r_of(z)
        J = jax.jacfwd(r_of)(z)
        return r, J

    r, J = jax.vmap(one)(jnp.arange(f * s))              # [B,2], [B,2,18]
    col_idx = jnp.concatenate(
        [
            (PER_FRAME * ks)[:, None] + jnp.arange(3)[None, :],        # Pi
            (PER_FRAME * ks + 6)[:, None] + jnp.arange(3)[None, :],    # Vi
            (PER_FRAME * kj)[:, None] + jnp.arange(3)[None, :],        # Pj
            (PER_FRAME * kj + 6)[:, None] + jnp.arange(3)[None, :],    # Vj
            (layout.gnss_dt + 4 * ks + flat.sys)[:, None],             # dt
            (layout.gnss_ddt + ks)[:, None],                           # ddt
            jnp.full((f * s, 1), layout.yaw_enu, jnp.int32),
            layout.anc_ecef + jnp.tile(jnp.arange(3)[None, :], (f * s, 1)),
        ],
        axis=1,
    )
    return rows_to_dense(J, col_idx, r, valid, layout.total)


def linearize_clock_chain(state: WindowState, frame_dts: jax.Array,
                          gnss_ready: jax.Array, ddt_weight, layout: StateLayout,
                          pair_filter: jax.Array | None = None):
    """Receiver clock factors between adjacent frames: 4 constellations ×
    (dt random walk, coeff 50) + (ddt smoothness, GNSS_DDT_WEIGHT)
    (estimator.cpp:3209-3230)."""
    f = state.rcv_dt.shape[0]
    dtype = state.poses.dtype
    ks = jnp.arange(1, f)

    # dt chain: r = dt_j − dt_i − 0.5 (ddt_i + ddt_j) Δt, per sys
    pairs_k = jnp.repeat(ks, 4)
    pairs_sys = jnp.tile(jnp.arange(4), f - 1)

    def dt_one(k, sy):
        dt_time = frame_dts[k]

        def r_of(d):
            dti = state.rcv_dt[k - 1, sy] + d[0]
            dtj = state.rcv_dt[k, sy] + d[1]
            ddi = state.rcv_ddt[k - 1] + d[2]
            ddj = state.rcv_ddt[k] + d[3]
            return ((dtj - dti - 0.5 * (ddi + ddj) * dt_time) * DT_INFO_COEFF)[None]

        z = jnp.zeros(4, dtype)
        return r_of(z), jax.jacfwd(r_of)(z)

    r_dt, J_dt = jax.vmap(dt_one)(pairs_k, pairs_sys)      # [(F-1)*4, 1], [.,1,4]
    cols_dt = jnp.stack(
        [
            layout.gnss_dt + 4 * (pairs_k - 1) + pairs_sys,
            layout.gnss_dt + 4 * pairs_k + pairs_sys,
            layout.gnss_ddt + pairs_k - 1,
            layout.gnss_ddt + pairs_k,
        ],
        axis=1,
    )
    pair_ok = gnss_ready & jnp.ones(f - 1, bool)
    if pair_filter is not None:
        pair_ok = pair_ok & pair_filter[ks]
    Jd1, rd1 = rows_to_dense(J_dt, cols_dt, r_dt, jnp.repeat(pair_ok, 4),
                             layout.total)

    # ddt smoothness: r = (ddt_i − ddt_j) · w
    def ddt_one(k):
        def r_of(d):
            return (((state.rcv_ddt[k - 1] + d[0]) - (state.rcv_ddt[k] + d[1]))
                    * ddt_weight)[None]

        z = jnp.zeros(2, dtype)
        return r_of(z), jax.jacfwd(r_of)(z)

    r_sm, J_sm = jax.vmap(ddt_one)(ks)
    cols_sm = jnp.stack([layout.gnss_ddt + ks - 1, layout.gnss_ddt + ks], axis=1)
    Jd2, rd2 = rows_to_dense(J_sm, cols_sm, r_sm, pair_ok, layout.total)
    return jnp.concatenate([Jd1, Jd2]), jnp.concatenate([rd1, rd2])
