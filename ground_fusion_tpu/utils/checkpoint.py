"""Checkpoint / resume for the estimator core and the pose graph.

The reference checkpoints only the pose graph (keyframes + BRIEF descriptors +
loop edges, ``pose_graph.cpp:1062-1267`` save/load on keypress, config
``load_previous_pose_graph``); the VIO window state dies with the process.
Here BOTH are serializable npz archives: the window `EstimatorCore` (so a
reboot = resume-from-checkpoint rather than cold re-init — SURVEY §5
"checkpointed window state") and the keyframe graph."""

from __future__ import annotations

import numpy as np


def _flatten(tree, prefix, out):
    if hasattr(tree, "_fields"):                     # NamedTuple
        for name in tree._fields:
            _flatten(getattr(tree, name), f"{prefix}{name}.", out)
    elif tree is None:
        out[prefix + "__none__"] = np.zeros(0)
    else:
        out[prefix[:-1]] = np.asarray(tree)


def save_core(path: str, core) -> None:
    out = {}
    _flatten(core, "", out)
    np.savez_compressed(path, **out)


def load_core(path: str, template):
    """Rebuild a core pytree with the template's structure + dtypes."""
    import jax.numpy as jnp

    data = np.load(path)

    def rebuild(tmpl, prefix):
        if hasattr(tmpl, "_fields"):
            return type(tmpl)(*[
                rebuild(getattr(tmpl, n), f"{prefix}{n}.") for n in tmpl._fields
            ])
        if tmpl is None:
            return None
        arr = data[prefix[:-1]]
        return jnp.asarray(arr, jnp.asarray(tmpl).dtype)

    return rebuild(template, "")


def save_pose_graph(path: str, pg) -> None:
    """Keyframe DB + loop edges + drift (pose_graph.cpp:1062-1126 analog)."""
    out = {
        "n_kf": np.int64(len(pg.kfs)),
        "r_drift": pg.r_drift,
        "t_drift": pg.t_drift,
        "earliest_loop": np.int64(pg.earliest_loop if pg.earliest_loop is not None else -1),
        "loop_edges_i": np.asarray([e[0] for e in pg.loop_edges], np.int64),
        "loop_edges_j": np.asarray([e[1] for e in pg.loop_edges], np.int64),
        "loop_edges_t": (np.stack([e[2] for e in pg.loop_edges])
                         if pg.loop_edges else np.zeros((0, 3))),
        "loop_edges_yaw": np.asarray([e[3] for e in pg.loop_edges]),
        "loop_edges_q": (np.stack([
            np.asarray(e[4]) if len(e) > 4 else np.array([1.0, 0, 0, 0])
            for e in pg.loop_edges]) if pg.loop_edges else np.zeros((0, 4))),
    }
    for k, kf in enumerate(pg.kfs):
        for field in kf._fields:
            v = getattr(kf, field)
            if v is None:           # vio_pose unset → fall back to pose
                v = kf.pose
            if isinstance(v, (int, float)):
                v = np.asarray(v)
            out[f"kf{k}.{field}"] = v
    np.savez_compressed(path, **out)


def load_pose_graph(path: str, pg) -> None:
    """Restore into an existing PoseGraph (re-registers BoW entries under the
    original keyframe indices so loop detection continues across sessions,
    pose_graph.cpp:1127-1267 ``load_previous_pose_graph``)."""
    import jax.numpy as jnp

    from ..global_layers.bow import bow_histogram, words_of
    from ..global_layers.pose_graph import Keyframe

    data = np.load(path, allow_pickle=False)
    n = int(data["n_kf"])
    pg.kfs = []
    for k in range(n):
        fields = {}
        for field in Keyframe._fields:
            key = f"kf{k}.{field}"
            if key not in data:
                continue            # fields added after the save: use default
            v = data[key]
            if field in ("index",):
                v = int(v)
            elif field in ("t",):
                v = float(v)
            fields[field] = v
        kf = Keyframe(**fields)
        pg.kfs.append(kf)
        if getattr(pg, "vocab", None) is not None:
            hist = pg.db.bow_vector(kf.desc, kf.kp_ok)
        else:
            hist = bow_histogram(words_of(jnp.asarray(kf.desc),
                                          jnp.asarray(kf.kp_ok), pg.sel))
        pg.db.add(hist, kf_index=kf.index)
    pg.r_drift = data["r_drift"]
    pg.t_drift = data["t_drift"]
    el = int(data["earliest_loop"])
    pg.earliest_loop = el if el >= 0 else None
    q = data["loop_edges_q"] if "loop_edges_q" in data else \
        np.tile(np.array([1.0, 0, 0, 0]), (len(data["loop_edges_i"]), 1))
    pg.loop_edges = [
        (int(i), int(j), t, float(y), qq)
        for i, j, t, y, qq in zip(data["loop_edges_i"], data["loop_edges_j"],
                                  data["loop_edges_t"], data["loop_edges_yaw"],
                                  q)
    ]
