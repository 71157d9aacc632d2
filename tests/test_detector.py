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
