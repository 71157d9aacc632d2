"""Detector training: synthetic rendered scenes → YOLO-style loss → weights.

The reference ships pretrained darknet weights as an external artifact
(``vins_estimator/yolo_network_config/``, loaded by
``YoloObjectDetector.cpp``); the equivalent here is a training loop that
produces a loadable ``.npz`` (``model.save_npz``) so ``use_yolo`` performs a
real function. The training domain is synthetic: low-frequency textured
backgrounds with high-contrast "dynamic objects" (the rendered stand-in for
people/vehicles), which is exactly the signal the culling path needs — boxes
over image regions that look like compact foreground objects.

Run ``python scripts/train_detector.py`` to (re)produce
``ground_fusion_tpu/detector/weights.npz``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .model import ANCHORS, DetectorParams, backbone, _conv, init_params

MAX_OBJ = 3


def render_scene(rng: np.random.Generator, h: int = 96, w: int = 96):
    """One synthetic frame: smooth background + up to MAX_OBJ textured
    rectangles. Returns (img [H,W,3] float 0..255, boxes [MAX_OBJ,4] xyxy px,
    n_obj)."""
    base = rng.normal(0, 1, (h // 8, w // 8, 3))
    img = np.kron(base, np.ones((8, 8, 1)))
    img = 128.0 + 40.0 * img / np.abs(img).max()
    n = rng.integers(1, MAX_OBJ + 1)
    boxes = np.zeros((MAX_OBJ, 4), np.float32)
    for k in range(n):
        bw = rng.integers(12, 36)
        bh = rng.integers(12, 36)
        x0 = rng.integers(0, w - bw)
        y0 = rng.integers(0, h - bh)
        # high-contrast checker texture — a compact foreground object
        yy, xx = np.mgrid[0:bh, 0:bw]
        checker = (((yy // 4) + (xx // 4)) % 2).astype(np.float32)
        tone = rng.uniform(0.0, 1.0)
        patch = 255.0 * (tone * checker + (1 - tone) * (1 - checker))
        img[y0 : y0 + bh, x0 : x0 + bw] = patch[..., None] * rng.uniform(0.6, 1.0, 3)
        boxes[k] = (x0, y0, x0 + bw, y0 + bh)
    return np.clip(img, 0, 255).astype(np.float32), boxes, n


def make_batch(rng, batch: int, h: int = 96, w: int = 96):
    imgs = np.zeros((batch, h, w, 3), np.float32)
    boxes = np.zeros((batch, MAX_OBJ, 4), np.float32)
    ns = np.zeros(batch, np.int32)
    for i in range(batch):
        imgs[i], boxes[i], ns[i] = render_scene(rng, h, w)
    return jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(ns)


def _targets(boxes, n_obj, gy, gx, stride, n_classes):
    """Anchor-grid assignment for one image: every GT box trains the best
    wh-IoU anchor at its center cell."""
    anch = jnp.asarray(ANCHORS)
    a = ANCHORS.shape[0]
    t_obj = jnp.zeros((gy, gx, a))
    t_box = jnp.zeros((gy, gx, a, 4))
    t_cls = jnp.zeros((gy, gx, a), jnp.int32)

    def add(carry, k):
        t_obj, t_box, t_cls = carry
        b = boxes[k]
        ok = k < n_obj
        cxp = (b[0] + b[2]) / 2.0
        cyp = (b[1] + b[3]) / 2.0
        bw = jnp.maximum(b[2] - b[0], 1.0)
        bh = jnp.maximum(b[3] - b[1], 1.0)
        ci = jnp.clip((cxp / stride).astype(jnp.int32), 0, gx - 1)
        cj = jnp.clip((cyp / stride).astype(jnp.int32), 0, gy - 1)
        inter = jnp.minimum(bw, anch[:, 0]) * jnp.minimum(bh, anch[:, 1])
        union = bw * bh + anch[:, 0] * anch[:, 1] - inter
        ai = jnp.argmax(inter / union)
        tx = cxp / stride - ci
        ty = cyp / stride - cj
        tw = jnp.log(bw / anch[ai, 0])
        th = jnp.log(bh / anch[ai, 1])
        w = jnp.where(ok, 1.0, 0.0)
        t_obj = t_obj.at[cj, ci, ai].max(w)
        t_box = t_box.at[cj, ci, ai].set(
            jnp.where(ok, jnp.stack([tx, ty, tw, th]), t_box[cj, ci, ai]))
        return (t_obj, t_box, t_cls), None

    (t_obj, t_box, t_cls), _ = jax.lax.scan(
        add, (t_obj, t_box, t_cls), jnp.arange(MAX_OBJ))
    return t_obj, t_box, t_cls


def loss_fn(params: DetectorParams, imgs, boxes, ns, n_classes: int = 8):
    """YOLO-style single-scale loss: obj BCE (no-obj weight 0.5), box
    regression and class CE at assigned anchors."""
    feat = backbone(params, imgs / 255.0)
    gy, gx = feat.shape[1], feat.shape[2]
    a = ANCHORS.shape[0]
    stride = imgs.shape[2] / gx
    raw = _conv(feat, params.head_w, params.head_b)
    raw = raw.reshape(imgs.shape[0], gy, gx, a, 5 + n_classes)

    t_obj, t_box, t_cls = jax.vmap(
        lambda b, n: _targets(b, n, gy, gx, stride, n_classes))(boxes, ns)

    obj_logit = raw[..., 4]
    bce = jnp.maximum(obj_logit, 0) - obj_logit * t_obj + jnp.log1p(
        jnp.exp(-jnp.abs(obj_logit)))
    w_obj = jnp.where(t_obj > 0, 5.0, 0.5)
    l_obj = jnp.mean(w_obj * bce)

    pred_xy = jax.nn.sigmoid(raw[..., 0:2])
    pred_wh = raw[..., 2:4]
    l_box = jnp.sum(
        t_obj[..., None]
        * ((pred_xy - t_box[..., 0:2]) ** 2 + (pred_wh - t_box[..., 2:4]) ** 2)
    ) / jnp.maximum(jnp.sum(t_obj), 1.0)

    logp = jax.nn.log_softmax(raw[..., 5:], axis=-1)
    l_cls = -jnp.sum(
        t_obj * jnp.take_along_axis(logp, t_cls[..., None], axis=-1)[..., 0]
    ) / jnp.maximum(jnp.sum(t_obj), 1.0)
    return l_obj + l_box + 0.2 * l_cls


def train(steps: int = 400, batch: int = 16, lr: float = 1e-3, seed: int = 0,
          log_every: int = 50, params: DetectorParams | None = None):
    """Adam training on the synthetic renderer; returns trained params."""
    import optax

    rng = np.random.default_rng(seed)
    params = params if params is not None else init_params(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs, boxes, ns):
        loss, grads = jax.value_and_grad(loss_fn)(params, imgs, boxes, ns)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(steps):
        imgs, boxes, ns = make_batch(rng, batch)
        params, opt_state, loss = step(params, opt_state, imgs, boxes, ns)
        if log_every and it % log_every == 0:
            print(f"step {it:4d}  loss {float(loss):.4f}", flush=True)
    return params
