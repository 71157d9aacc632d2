"""Dynamic-object detector: a compact YOLO-style single-shot network in JAX.

Replaces the darknet_ros fork (``src/YoloObjectDetector.cpp`` + ``darknet/``
C/CUDA — the reference's only GPU component, SURVEY §2 #16) with a
TPU-idiomatic convnet: conv/BN/leaky blocks on the MXU in bfloat16, an
anchor-grid head, and a fixed-shape batched NMS (data-dependent suppression
loops become a top-k + IoU mask). The architecture mirrors tiny-YOLOv3's
single-scale layout; weights load from an ``.npz`` (the reference ships
pretrained darknet weights the same way — as an external artifact).

Output boxes feed :func:`cull_features_in_boxes` — the dynamic-feature
rejection of ``trackImagebox`` (``feature_tracker.cpp:564-606``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# person, car-ish classes are "dynamic" in the ground-robot setting
DEFAULT_DYNAMIC_CLASSES = (0, 1, 2, 3, 5, 7)   # COCO-ish ids
ANCHORS = np.array([[10, 14], [23, 27], [37, 58]], np.float32)


def _conv(x, w, b, stride=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b[None, None, None, :]


def _leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _maxpool(x, k=2, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "SAME"
    )


class DetectorParams(NamedTuple):
    convs: tuple            # ((w, b, gamma, beta, mean, var) per conv block)
    head_w: jax.Array
    head_b: jax.Array


def init_params(key, channels=(16, 32, 64, 128, 256), n_classes: int = 8,
                dtype=jnp.float32) -> DetectorParams:
    """Random init (for tests / finetuning from scratch); production weights
    arrive via :func:`load_npz`."""
    keys = jax.random.split(key, len(channels) + 1)
    convs = []
    cin = 3
    for i, cout in enumerate(channels):
        w = jax.random.normal(keys[i], (3, 3, cin, cout), dtype) * np.sqrt(2.0 / (9 * cin))
        convs.append((w, jnp.zeros(cout, dtype), jnp.ones(cout, dtype),
                      jnp.zeros(cout, dtype), jnp.zeros(cout, dtype),
                      jnp.ones(cout, dtype)))
        cin = cout
    a = ANCHORS.shape[0]
    head_w = jax.random.normal(keys[-1], (1, 1, cin, a * (5 + n_classes)), dtype) * 0.01
    head_b = jnp.zeros(a * (5 + n_classes), dtype)
    return DetectorParams(tuple(convs), head_w, head_b)


def load_npz(path: str) -> DetectorParams:
    data = np.load(path)
    n = int(data["n_convs"])
    convs = tuple(
        tuple(jnp.asarray(data[f"c{i}_{k}"]) for k in ("w", "b", "g", "be", "m", "v"))
        for i in range(n)
    )
    return DetectorParams(convs, jnp.asarray(data["head_w"]), jnp.asarray(data["head_b"]))


def save_npz(path: str, params: DetectorParams):
    out = {"n_convs": np.int32(len(params.convs))}
    for i, blk in enumerate(params.convs):
        for k, v in zip(("w", "b", "g", "be", "m", "v"), blk):
            out[f"c{i}_{k}"] = np.asarray(v)
    out["head_w"] = np.asarray(params.head_w)
    out["head_b"] = np.asarray(params.head_b)
    np.savez(path, **out)


def backbone(params: DetectorParams, img: jax.Array) -> jax.Array:
    """[N,H,W,3] in [0,1] → feature grid [N,H/32,W/32,C]; convs run in
    bfloat16 (MXU), statistics in f32."""
    x = img.astype(jnp.bfloat16)
    for (w, b, gamma, beta, mean, var) in params.convs:
        x = _conv(x, w.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
        x = x.astype(jnp.float32)
        x = gamma * (x - mean) / jnp.sqrt(var + 1e-5) + beta
        x = _leaky(x).astype(jnp.bfloat16)
        x = _maxpool(x)
    return x.astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_classes", "max_det"))
def detect(params: DetectorParams, img: jax.Array, n_classes: int = 8,
           conf_thresh: float = 0.5, iou_thresh: float = 0.45,
           max_det: int = 16):
    """Full forward + decode + fixed-shape NMS.

    img [H,W,3] in [0,255]. Returns (boxes [max_det,4] xyxy px, scores
    [max_det], classes [max_det], valid [max_det])."""
    h, w = img.shape[0:2]
    feat = backbone(params, img[None] / 255.0)
    gy, gx = feat.shape[1], feat.shape[2]
    a = ANCHORS.shape[0]
    raw = _conv(feat, params.head_w, params.head_b)[0]
    raw = raw.reshape(gy, gx, a, 5 + n_classes)

    xs = (jax.nn.sigmoid(raw[..., 0]) + jnp.arange(gx)[None, :, None]) * (w / gx)
    ys = (jax.nn.sigmoid(raw[..., 1]) + jnp.arange(gy)[:, None, None]) * (h / gy)
    ws = jnp.exp(jnp.clip(raw[..., 2], -6, 6)) * ANCHORS[None, None, :, 0]
    hs = jnp.exp(jnp.clip(raw[..., 3], -6, 6)) * ANCHORS[None, None, :, 1]
    obj = jax.nn.sigmoid(raw[..., 4])
    cls_p = jax.nn.softmax(raw[..., 5:], axis=-1)
    score = obj[..., None] * cls_p
    best_cls = jnp.argmax(score, axis=-1)
    best_score = jnp.max(score, axis=-1)

    boxes = jnp.stack([xs - ws / 2, ys - hs / 2, xs + ws / 2, ys + hs / 2], -1)
    boxes = boxes.reshape(-1, 4)
    scores = best_score.reshape(-1)
    classes = best_cls.reshape(-1)

    top = jax.lax.top_k(scores, max_det)
    idx = top[1]
    b = boxes[idx]
    s = top[0]
    c = classes[idx]

    # fixed-shape greedy NMS over the top-k
    def iou(b1, b2):
        x1 = jnp.maximum(b1[0], b2[0])
        y1 = jnp.maximum(b1[1], b2[1])
        x2 = jnp.minimum(b1[2], b2[2])
        y2 = jnp.minimum(b1[3], b2[3])
        inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
        a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
        a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
        return inter / jnp.maximum(a1 + a2 - inter, 1e-6)

    ious = jax.vmap(lambda bi: jax.vmap(lambda bj: iou(bi, bj))(b))(b)
    keep = jnp.ones(max_det, bool)

    def body(i, keep):
        suppress = (ious[i] > iou_thresh) & (jnp.arange(max_det) > i) & keep[i]
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, max_det, body, keep)
    valid = keep & (s > conf_thresh)
    return b, s, c, valid


def cull_features_in_boxes(pts_px: jax.Array, boxes: jax.Array,
                           classes: jax.Array, box_valid: jax.Array,
                           dynamic_classes=DEFAULT_DYNAMIC_CLASSES) -> jax.Array:
    """Feature mask: False for features inside any dynamic-class box
    (trackImagebox culling, feature_tracker.cpp:564-606)."""
    dyn = jnp.zeros_like(box_valid)
    for c in dynamic_classes:
        dyn = dyn | (classes == c)
    dyn = dyn & box_valid
    inside = (
        (pts_px[:, None, 0] >= boxes[None, :, 0])
        & (pts_px[:, None, 0] <= boxes[None, :, 2])
        & (pts_px[:, None, 1] >= boxes[None, :, 1])
        & (pts_px[:, None, 1] <= boxes[None, :, 3])
    )
    return ~jnp.any(inside & dyn[None, :], axis=1)
