"""Host-side GNSS ingest: quality gates, track-count filter, window table
construction, alignment bookkeeping.

The counterpart of ``Estimator::processGNSS`` (``estimator.cpp:1455-1535``:
psr/dopp std gates, per-satellite track-epoch counter, elevation mask once
aligned) and of the per-solve factor preparation (``estimator.cpp:3178-3207``)
that here fills the padded :class:`~..gnss.factors.GnssObsWindow` device
table. Observations arrive as plain dicts (the gnss_comm ObsPtr surface):

    {sat: int, sys: 0..3, sat_pos: [3], sat_vel: [3], psr: float,
     dopp_wl: float, psr_std: float, dopp_std: float, svdt: float,
     svddt: float, tgd: float, ura: float, tow: float}
"""

from __future__ import annotations

import numpy as np

from .coords import ecef2geo, sat_azel
from .ephemeris import klobuchar_iono, saastamoinen_tropo
from .factors import PSR_TO_DOPP_RATIO, RELATIVE_SQRT_INFO


class GnssIngest:
    def __init__(self, cfg, iono_paras=None):
        self.cfg = cfg.gnss
        self.iono_paras = iono_paras
        self.track_count: dict[int, int] = {}
        self.epochs: list[list[dict]] = []        # per-frame filtered epochs

    def process_epoch(self, obs_list, aligned: bool, anc_ecef=None) -> list[dict]:
        """Apply the reference's gates; returns the accepted observations and
        appends them as this frame's epoch."""
        valid = []
        for o in obs_list:
            if o.get("psr_std", 0.0) > self.cfg.psr_std_thresh or \
               o.get("dopp_std", 0.0) > self.cfg.dopp_std_thresh:
                self.track_count[o["sat"]] = 0
                continue
            self.track_count[o["sat"]] = self.track_count.get(o["sat"], 0) + 1
            if self.track_count[o["sat"]] < self.cfg.track_num_thresh:
                continue
            if aligned and anc_ecef is not None:
                _, el = sat_azel(anc_ecef, np.asarray(o["sat_pos"]))
                if el < np.deg2rad(self.cfg.elevation_mask_deg):
                    continue
            valid.append(o)
        self.epochs.append(valid)
        return valid

    def pop_frame_epochs(self, n_keep: int):
        if len(self.epochs) > n_keep:
            self.epochs = self.epochs[-n_keep:]

    def build_slot(self, obs_list, anc_ecef, p_local_ecef=None):
        """One window-table slot from an epoch: weights from elevation + URA
        (gnss_psr_dopp_factor.cpp:22-48, 86-89), atmosphere precomputed at the
        current position estimate (:80-85)."""
        s_max = self.cfg.max_sats
        out = {k: np.zeros(s_max) for k in
               ("psr", "dopp_wl", "svdt", "svddt", "atm_delay", "tgd",
                "pr_weight", "dp_weight", "ratio")}
        sat_pos = np.zeros((s_max, 3))
        sat_vel = np.zeros((s_max, 3))
        sysm = np.zeros(s_max, np.int32)
        valid = np.zeros(s_max, bool)
        pos = np.asarray(p_local_ecef if p_local_ecef is not None else anc_ecef)
        # pre-alignment there is no valid ECEF position: skip atmosphere +
        # elevation weighting (the reference's `if (P_ecef.norm() > 0)` guard,
        # gnss_psr_dopp_factor.cpp:78)
        has_pos = np.linalg.norm(pos) > 1e6
        lla = ecef2geo(pos) if has_pos else np.zeros(3)
        for i, o in enumerate(obs_list[:s_max]):
            sp = np.asarray(o["sat_pos"])
            az, el = sat_azel(pos, sp) if has_pos else (0.0, np.pi / 2.0)
            ura = max(o.get("ura", 2.0), 1.1)
            pr_uura = (ura - 1.0) * (o.get("psr_std", 0.16) / 0.16)
            dp_uura = (ura - 1.0) * (o.get("dopp_std", 0.256) / 0.256)
            sin_el2 = np.sin(el) ** 2
            out["pr_weight"][i] = sin_el2 / max(pr_uura, 1e-3) * RELATIVE_SQRT_INFO
            out["dp_weight"][i] = (sin_el2 / max(dp_uura, 1e-3)
                                   * RELATIVE_SQRT_INFO * PSR_TO_DOPP_RATIO)
            atm = saastamoinen_tropo(lla, el) if has_pos else 0.0
            if has_pos and self.iono_paras is not None:
                atm += klobuchar_iono(o.get("tow", 0.0), self.iono_paras, lla, az, el)
            out["atm_delay"][i] = atm
            out["psr"][i] = o["psr"]
            out["dopp_wl"][i] = o["dopp_wl"]
            out["svdt"][i] = o.get("svdt", 0.0)
            out["svddt"][i] = o.get("svddt", 0.0)
            out["tgd"][i] = o.get("tgd", 0.0)
            out["ratio"][i] = o.get("ratio", 1.0)
            sat_pos[i] = sp
            sat_vel[i] = np.asarray(o.get("sat_vel", np.zeros(3)))
            sysm[i] = o["sys"]
            valid[i] = True
        return dict(sat_pos=sat_pos, sat_vel=sat_vel, sys=sysm, valid=valid, **out)
