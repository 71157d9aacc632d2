"""GNSS stack tests: coordinate round-trips, ephemeris sanity, SPP recovery,
psr/dopp factor consistency at ground truth, and clock-chain behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.layout import StateLayout
from ground_fusion_tpu.estimator.window import empty_state
from ground_fusion_tpu.gnss.coords import (
    LIGHT_SPEED,
    EARTH_OMG,
    ecef2geo,
    ecef2rotation,
    enu2ecef,
    geo2ecef,
    sat_azel,
)
from ground_fusion_tpu.gnss.ephemeris import eph2pos, eph2vel
from ground_fusion_tpu.gnss.factors import (
    GnssObsWindow,
    ecef2rotation_j,
    linearize_clock_chain,
    linearize_gnss_psr_dopp,
    psr_dopp_residual_raw,
)
from ground_fusion_tpu.gnss.spp import dopp_vel_solve, spp_solve

DT = jnp.float64


def test_geo_ecef_roundtrip():
    lla = np.array([np.deg2rad(31.0), np.deg2rad(121.4), 25.0])
    xyz = geo2ecef(lla)
    lla2 = ecef2geo(xyz)
    assert np.allclose(lla, lla2, atol=1e-9)
    R = ecef2rotation(xyz)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    # ENU up axis points away from Earth center
    assert np.dot(R[:, 2], xyz / np.linalg.norm(xyz)) > 0.99
    Rj = np.asarray(ecef2rotation_j(jnp.asarray(xyz)))
    assert np.allclose(R, Rj, atol=1e-9)


def _gps_eph():
    return dict(
        sys="GPS", sqrtA=np.sqrt(26559800.0), e=0.01, i0=np.deg2rad(55.0),
        OMG0=0.5, omg=0.3, M0=1.2, deln=4.8e-9, idot=7e-11, OMGd=-8e-9,
        cus=8e-6, cuc=3e-6, crs=50.0, crc=200.0, cis=1e-7, cic=2e-7,
        toe=7200.0, toc=7200.0, af0=1e-5, af1=1e-11, af2=0.0,
    )


def test_eph2pos_orbit_sanity():
    eph = _gps_eph()
    pos, dts = eph2pos(7500.0, eph)
    r = np.linalg.norm(pos)
    assert 2.5e7 < r < 2.8e7, f"orbit radius {r}"
    vel, ddts = eph2vel(7500.0, eph)
    # GPS orbital speed ~3.9 km/s in ECEF (minus Earth rotation ~up to 3.1km/s)
    assert 2000.0 < np.linalg.norm(vel) < 5000.0
    # finite-diff self-consistency over 1 s
    p2, _ = eph2pos(7501.0, eph)
    assert np.linalg.norm((p2 - pos) - vel) < 1.0


def _make_sats(rcv_ecef, n=8, seed=0):
    """Satellites on a 22000 km shell above the receiver's horizon."""
    rng = np.random.default_rng(seed)
    sats = []
    for k in range(n):
        az = rng.uniform(0, 2 * np.pi)
        el = rng.uniform(np.deg2rad(25), np.deg2rad(85))
        enu = 2.2e7 * np.array(
            [np.cos(el) * np.sin(az), np.cos(el) * np.cos(az), np.sin(el)]
        )
        sats.append(enu2ecef(rcv_ecef, enu))
    return np.stack(sats)


def test_spp_recovers_position():
    rcv = geo2ecef(np.array([np.deg2rad(31.0), np.deg2rad(121.4), 20.0]))
    sats = _make_sats(rcv, n=9)
    dt_gps, dt_bds = 12.5, 14.0          # meters
    obs = []
    for k, sp in enumerate(sats):
        sagnac = EARTH_OMG * (sp[0] * rcv[1] - sp[1] * rcv[0]) / LIGHT_SPEED
        sys = 0 if k % 2 == 0 else 3
        dt = dt_gps if sys == 0 else dt_bds
        obs.append(dict(
            sat_pos=sp, sys=sys, svdt=2e-5,
            psr=np.linalg.norm(sp - rcv) + sagnac + dt - 2e-5 * LIGHT_SPEED,
        ))
    est, rcv_dt, ok = spp_solve(obs, apply_atmo=False)
    assert ok
    assert np.linalg.norm(est - rcv) < 0.01, f"SPP err {np.linalg.norm(est - rcv)}"
    assert abs(rcv_dt[0] - dt_gps) < 0.01
    assert abs(rcv_dt[3] - dt_bds) < 0.01


def test_dopp_vel_solve():
    rcv = geo2ecef(np.array([np.deg2rad(31.0), np.deg2rad(121.4), 20.0]))
    v_rcv = np.array([1.2, -0.4, 0.1])
    ddt = 3.0
    sats = _make_sats(rcv, n=8, seed=1)
    rng = np.random.default_rng(2)
    obs = []
    for sp in sats:
        sv = rng.normal(0, 2500, 3)
        los = (sp - rcv) / np.linalg.norm(sp - rcv)
        dopp_est = np.dot(sv - v_rcv, los) + ddt
        obs.append(dict(sat_pos=sp, sat_vel=sv, svddt=0.0, dopp=-dopp_est))
    v_est, ddt_est, ok = dopp_vel_solve(obs, rcv)
    assert ok
    assert np.linalg.norm(v_est - v_rcv) < 1e-6
    assert abs(ddt_est - ddt) < 1e-6


def _window_gnss_obs(cfg, anc, yaw_enu, poses, vels, dt_vals, ddt_vals, n_sats=8):
    """Synthesize a consistent GnssObsWindow from ground-truth states: raw
    float64 pseudoranges/Dopplers exactly as a receiver would report them,
    then host-reduced against the expansion anchor ``anc`` — the same
    ingest path production uses (gnss/ingest.reduce_obs)."""
    from ground_fusion_tpu.gnss.ingest import reduce_obs

    f = cfg.num_frames
    s = n_sats
    R_el = ecef2rotation(anc)
    cy, sy = np.cos(yaw_enu), np.sin(yaw_enu)
    R_enu_local = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    R = R_el @ R_enu_local
    sats = _make_sats(anc, n=s, seed=3)
    rng = np.random.default_rng(4)
    sat_vel = rng.normal(0, 2500, (s, 3))

    tbl = {k: np.zeros((f, s)) for k in
           ("rng0", "psr_red", "dopp_red", "pr_weight", "dp_weight", "ratio")}
    vec = {k: np.zeros((f, s, 3)) for k in
           ("rvec0", "sv_vel", "sagnac_vec", "dsag_vec")}
    sysm = np.zeros((f, s), np.int32)
    valid = np.zeros((f, s), bool)
    for k in range(f - 1):            # epoch at frame k (ratio = 1)
        P_ecef = R @ np.asarray(poses[k, 0:3]) + anc
        V_ecef = R @ np.asarray(vels[k])
        for j in range(s):
            sp, sv = sats[j], sat_vel[j]
            rng_vec = sp - P_ecef
            rngn = np.linalg.norm(rng_vec)
            unit = rng_vec / rngn
            sagnac = EARTH_OMG * (sp[0] * P_ecef[1] - sp[1] * P_ecef[0]) / LIGHT_SPEED
            sys = j % 2 * 3           # GPS / BDS
            d_sagnac = EARTH_OMG / LIGHT_SPEED * (
                sv[0] * P_ecef[1] + sp[0] * V_ecef[1]
                - sv[1] * P_ecef[0] - sp[1] * V_ecef[0])
            dopp_est = np.dot(sv - V_ecef, unit) + d_sagnac + ddt_vals[k]
            raw = dict(sat_pos=sp, sat_vel=sv, svdt=0.0, svddt=0.0, tgd=0.0,
                       psr=rngn + sagnac + dt_vals[k, sys],
                       dopp_wl=-dopp_est)
            red = reduce_obs(anc, R_el, raw, atm=0.0)
            for key in ("rng0", "psr_red", "dopp_red"):
                tbl[key][k, j] = red[key]
            for key in ("rvec0", "sv_vel", "sagnac_vec", "dsag_vec"):
                vec[key][k, j] = red[key]
            tbl["pr_weight"][k, j] = 1.0
            tbl["dp_weight"][k, j] = 1.0
            tbl["ratio"][k, j] = 1.0
            sysm[k, j] = sys
            valid[k, j] = True
    return GnssObsWindow(
        rvec0=jnp.asarray(vec["rvec0"]), rng0=jnp.asarray(tbl["rng0"]),
        psr_red=jnp.asarray(tbl["psr_red"]), dopp_red=jnp.asarray(tbl["dopp_red"]),
        sv_vel=jnp.asarray(vec["sv_vel"]),
        sagnac_vec=jnp.asarray(vec["sagnac_vec"]),
        dsag_vec=jnp.asarray(vec["dsag_vec"]),
        sys=jnp.asarray(sysm), pr_weight=jnp.asarray(tbl["pr_weight"]),
        dp_weight=jnp.asarray(tbl["dp_weight"]), ratio=jnp.asarray(tbl["ratio"]),
        valid=jnp.asarray(valid),
    )


def test_psr_dopp_rows_zero_at_gt():
    cfg = Config()
    f = cfg.num_frames
    layout = StateLayout(f, cfg.solver.max_landmarks)
    anc = geo2ecef(np.array([np.deg2rad(31.0), np.deg2rad(121.4), 15.0]))
    yaw = 0.3
    rng = np.random.default_rng(5)
    poses_p = rng.normal(0, 2.0, (f, 3))
    vels = rng.normal(0, 0.5, (f, 3))
    dt_vals = np.tile(np.array([20.0, 0.0, 0.0, 35.0]), (f, 1)) \
        + np.arange(f)[:, None] * 0.5
    ddt_vals = np.full(f, 5.0)

    st = empty_state(f, DT)
    st = st._replace(
        poses=st.poses.at[:, 0:3].set(jnp.asarray(poses_p)),
        sbs=st.sbs.at[:, 0:3].set(jnp.asarray(vels)),
        rcv_dt=jnp.asarray(dt_vals),
        rcv_ddt=jnp.asarray(ddt_vals),
        yaw_enu=jnp.asarray(yaw, DT),
        anc_ecef=jnp.zeros(3, DT),   # ENU delta from the expansion anchor
    )
    obs = _window_gnss_obs(cfg, anc, yaw, np.asarray(st.poses), vels, dt_vals, ddt_vals)
    J, r = linearize_gnss_psr_dopp(st, obs, jnp.asarray(True), layout)
    assert float(jnp.max(jnp.abs(r))) < 1e-5, float(jnp.max(jnp.abs(r)))
    assert J.shape[1] == layout.total

    # clock chain: dt ramp of 0.5 m/frame with ddt=5 m/s over 0.1 s -> zero
    frame_dts = jnp.full(f, 0.1, DT)
    Jc, rc = linearize_clock_chain(st, frame_dts, jnp.asarray(True),
                                   jnp.asarray(10.0, DT), layout)
    assert float(jnp.max(jnp.abs(rc))) < 1e-8

    # perturbing the yaw must produce a nonzero residual (observability)
    st2 = st._replace(yaw_enu=st.yaw_enu + 0.01)
    _, r2 = linearize_gnss_psr_dopp(st2, obs, jnp.asarray(True), layout)
    assert float(jnp.max(jnp.abs(r2))) > 1e-2


def test_gnss_vi_align_recovers_yaw_anchor():
    """Full GNSS-VI alignment on synthetic epochs: SPP + Doppler yaw GN +
    anchor refinement must recover the true ENU-local yaw and anchor."""
    from ground_fusion_tpu.gnss.align import gnss_vi_align

    anc_true = geo2ecef(np.array([np.deg2rad(31.0), np.deg2rad(121.4), 18.0]))
    yaw_true = 0.42
    R_el = ecef2rotation(anc_true)
    cy, sy = np.cos(yaw_true), np.sin(yaw_true)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    R = R_el @ Rz

    rng = np.random.default_rng(9)
    n_ep = 8
    local_pos = np.cumsum(rng.normal(0, 1.0, (n_ep, 3)), axis=0)
    local_vels = rng.normal(0, 1.0, (n_ep, 3))
    local_vels[:, 2] = 0.1 * local_vels[:, 2]

    sats = _make_sats(anc_true, n=8, seed=12)
    sat_vel = rng.normal(0, 2500, (8, 3))
    epochs = []
    for k in range(n_ep):
        P = anc_true + R @ local_pos[k]
        V = R @ local_vels[k]
        ep = []
        for j in range(8):
            sp, sv = sats[j], sat_vel[j]
            los = (sp - P) / np.linalg.norm(sp - P)
            sagnac = EARTH_OMG * (sp[0] * P[1] - sp[1] * P[0]) / LIGHT_SPEED
            ep.append(dict(
                sat_pos=sp, sat_vel=sv, sys=0, svdt=0.0, svddt=0.0,
                psr=np.linalg.norm(sp - P) + sagnac + 8.0,
                dopp=-(np.dot(sv - V, los) + 2.0),
            ))
        epochs.append(ep)

    anc, yaw, rcv_dt, ok = gnss_vi_align(local_pos, local_vels, epochs)
    assert ok
    assert abs(yaw - yaw_true) < 5e-3, f"yaw {yaw} vs {yaw_true}"
    # anchor recovered to within a few meters (atmo model mismatch ~2.4 m)
    assert np.linalg.norm(anc - anc_true) < 5.0


def test_gnss_epoch_ts_ratio_attachment():
    """Epoch timing (VERDICT r2 missing #3): a mid-interval epoch must land
    at its bracketing lower slot with ts_ratio = (upper − t)/(upper − lower)
    (estimator.cpp:3193-3207), and the psr residual evaluated with that ratio
    must be unbiased where the old ratio-0 attachment was biased."""
    import dataclasses

    from ground_fusion_tpu.gnss.factors import psr_dopp_residual_raw
    from ground_fusion_tpu.pipeline import Estimator

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, gnss=dataclasses.replace(cfg.gnss, enabled=True, track_num_thresh=1)
    )
    est = Estimator(cfg, dtype=jnp.float64)
    f = cfg.num_frames
    est.ts = [0.1 * k for k in range(f)]

    anc = geo2ecef(np.array([np.deg2rad(31.0), np.deg2rad(121.4), 10.0]))
    # slot writes require the reduction anchor (pre-alignment epochs stay
    # host-side); emulate the post-alignment state
    est.gnss.set_anchor(anc)
    est.gnss_aligned = True
    sat = anc + ecef2rotation(anc) @ np.array([0.4e7, 0.5e7, 2.0e7])
    obs = dict(sat=3, sys=0, sat_pos=sat, sat_vel=np.zeros(3),
               psr=1.0e7, dopp_wl=0.0, psr_std=0.1, dopp_std=0.1,
               svdt=0.0, svddt=0.0, tgd=0.0, ura=2.0)

    # epoch 60% of the way from frame 8 (t=0.8) to frame 9 (t=0.9)
    est.input_gnss(0.86, [obs])
    est._attach_gnss_epoch()
    g = est.core.gnss_obs
    assert bool(g.valid[8, 0]), "epoch not attached at its lower bracketing slot"
    assert not bool(g.valid[f - 2, 0]) or (f - 2) == 8
    np.testing.assert_allclose(float(g.ratio[8, 0]), 0.4, atol=1e-9)

    # unbiasedness: generate a pseudorange at the interpolated position and
    # check the residual vanishes at ratio 0.4 but not at ratio 0
    Pi = np.array([0.0, 0.0, 0.0])
    Pj = np.array([5.0, 0.0, 0.0])
    P_interp = 0.4 * Pi + 0.6 * Pj
    R_el = ecef2rotation(anc)
    P_ecef = anc + R_el @ P_interp
    rng = np.linalg.norm(sat - P_ecef)
    sagnac = EARTH_OMG * (sat[0] * P_ecef[1] - sat[1] * P_ecef[0]) / LIGHT_SPEED
    from ground_fusion_tpu.gnss.ingest import reduce_obs

    red = reduce_obs(anc, R_el, dict(sat_pos=sat, sat_vel=np.zeros(3),
                                     psr=rng + sagnac, dopp_wl=0.0),
                     atm=0.0)
    o = {k: jnp.asarray(v) for k, v in red.items()}
    o.update(pr_weight=jnp.asarray(1.0), dp_weight=jnp.asarray(1.0),
             ratio=jnp.asarray(0.4))
    args = (jnp.asarray(Pi), jnp.zeros(3), jnp.asarray(Pj), jnp.zeros(3),
            jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0),
            jnp.zeros(3))
    r_good = np.asarray(psr_dopp_residual_raw(*args, o))
    o_bad = dict(o, ratio=jnp.asarray(0.0))
    r_bad = np.asarray(psr_dopp_residual_raw(*args, o_bad))
    assert abs(r_good[0]) < 1e-6, f"interpolated residual biased: {r_good[0]}"
    assert abs(r_bad[0]) > 0.1, "ratio-0 attachment should be biased here"


def test_psr_dopp_f32_precision():
    """The reduced-observable form must be f32-viable (the production TPU
    dtype): at ground truth, float32 psr/dopp residuals stay at the
    millimeter level, where the absolute-ECEF form loses ~2 m to float32
    quantization of the ranges (the round-5 rationale in
    gnss/factors.GnssObsWindow)."""
    cfg = Config()
    f = cfg.num_frames
    layout = StateLayout(f, cfg.solver.max_landmarks)
    anc = geo2ecef(np.array([np.deg2rad(31.0), np.deg2rad(121.4), 15.0]))
    yaw = 0.3
    rng = np.random.default_rng(5)
    poses_p = rng.normal(0, 2.0, (f, 3))
    vels = rng.normal(0, 0.5, (f, 3))
    dt_vals = np.tile(np.array([20.0, 0.0, 0.0, 35.0]), (f, 1)) \
        + np.arange(f)[:, None] * 0.5
    ddt_vals = np.full(f, 5.0)

    st = empty_state(f, jnp.float32)
    st = st._replace(
        poses=st.poses.at[:, 0:3].set(jnp.asarray(poses_p, jnp.float32)),
        sbs=st.sbs.at[:, 0:3].set(jnp.asarray(vels, jnp.float32)),
        rcv_dt=jnp.asarray(dt_vals, jnp.float32),
        rcv_ddt=jnp.asarray(ddt_vals, jnp.float32),
        yaw_enu=jnp.asarray(yaw, jnp.float32),
        anc_ecef=jnp.zeros(3, jnp.float32),
    )
    obs = _window_gnss_obs(cfg, anc, yaw, poses_p, vels, dt_vals, ddt_vals)
    obs32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, obs)
    J, r = linearize_gnss_psr_dopp(st, obs32, jnp.asarray(True), layout)
    # < 5 mm weighted residual at GT in pure f32 (weights are 1 here)
    assert float(jnp.max(jnp.abs(r))) < 5e-3, float(jnp.max(jnp.abs(r)))
