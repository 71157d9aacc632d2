"""Detector tests: forward shapes, NMS invariants, npz round-trip, feature
culling (darknet_ros replacement, SURVEY §2 #16)."""

import jax
import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.detector.model import (
    DetectorParams,
    cull_features_in_boxes,
    detect,
    init_params,
    load_npz,
    save_npz,
)


def test_detect_shapes_and_nms():
    params = init_params(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (224, 320, 3)),
                      jnp.float32)
    boxes, scores, classes, valid = detect(params, img, max_det=16)
    assert boxes.shape == (16, 4) and scores.shape == (16,)
    b, v = np.asarray(boxes), np.asarray(valid)
    # surviving boxes must be pairwise below the IoU threshold
    def iou(a, c):
        x1, y1 = max(a[0], c[0]), max(a[1], c[1])
        x2, y2 = min(a[2], c[2]), min(a[3], c[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ua = (a[2]-a[0])*(a[3]-a[1]) + (c[2]-c[0])*(c[3]-c[1]) - inter
        return inter / max(ua, 1e-6)
    kept = b[v]
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            assert iou(kept[i], kept[j]) <= 0.45 + 1e-3


def test_params_npz_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(1))
    path = str(tmp_path / "det.npz")
    save_npz(path, params)
    p2 = load_npz(path)
    assert np.allclose(np.asarray(params.head_w), np.asarray(p2.head_w))
    assert len(p2.convs) == len(params.convs)


def test_cull_features_in_boxes():
    pts = jnp.asarray([[50.0, 50.0], [200.0, 120.0], [10.0, 10.0]])
    boxes = jnp.asarray([[40.0, 40.0, 80.0, 80.0], [0.0, 0.0, 5.0, 5.0]])
    classes = jnp.asarray([0, 4])          # class 0 dynamic, 4 not
    valid = jnp.asarray([True, True])
    keep = np.asarray(cull_features_in_boxes(pts, boxes, classes, valid))
    assert not keep[0]       # inside dynamic box -> culled
    assert keep[1] and keep[2]


def test_trained_weights_detect_and_cull():
    """The shipped weights artifact (scripts/train_detector.py — the
    counterpart of the reference's pretrained darknet weights) must localize
    rendered dynamic objects and drive the feature-culling path: a feature on
    the object is culled, a static-background feature survives
    (trackImagebox, feature_tracker.cpp:564-606)."""
    import os

    import numpy as np

    from ground_fusion_tpu.detector.model import (
        cull_features_in_boxes, detect, load_npz,
    )
    from ground_fusion_tpu.detector.train import render_scene

    wpath = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "ground_fusion_tpu", "detector", "weights.npz")
    assert os.path.exists(wpath), "shipped detector weights missing"
    params = load_npz(wpath)

    rng = np.random.default_rng(99)
    hits = total = 0
    for _ in range(10):
        img, boxes, n = render_scene(rng)
        b, s, c, valid = detect(params, jnp.asarray(img), conf_thresh=0.3)
        b, valid = np.asarray(b), np.asarray(valid)
        for k in range(n):
            total += 1
            gt = boxes[k]
            for d in np.nonzero(valid)[0]:
                bb = b[d]
                x1, y1 = max(gt[0], bb[0]), max(gt[1], bb[1])
                x2, y2 = min(gt[2], bb[2]), min(gt[3], bb[3])
                inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                u = ((gt[2] - gt[0]) * (gt[3] - gt[1])
                     + max((bb[2] - bb[0]) * (bb[3] - bb[1]), 0) - inter)
                if inter / max(u, 1e-6) > 0.3:
                    hits += 1
                    break
    assert hits >= 0.7 * total, f"detector recall {hits}/{total}"

    img, boxes, n = render_scene(np.random.default_rng(7))
    b, s, c, valid = detect(params, jnp.asarray(img), conf_thresh=0.3)
    gt = boxes[0]
    pts = jnp.asarray([[(gt[0] + gt[2]) / 2, (gt[1] + gt[3]) / 2],   # on object
                       [2.0, 2.0]])                                  # background
    keep = np.asarray(cull_features_in_boxes(pts, b, c, valid))
    assert not keep[0], "feature on the dynamic object must be culled"
    assert keep[1], "static feature must survive"
