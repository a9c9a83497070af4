"""Device-side pixel augmentation (jitted color jitter + noise).

BASELINE.json's north-star asks for training-time image transforms as
device-side jitted ops. Geometry (expand/crop/flip/mosaic) stays on host —
it changes shapes and label sets — but the *pixelwise* ops (photometric
distortion, reference utils/image_augmentation.py:169-198, and additive
gaussian noise, folder2lmdb.py:38) are shape-preserving and run here as one
fused XLA pass over the uint8 batch, keyed per image.

Cost model: on the 1-core host these ops are ~7 ms/image of the ~16 ms
budget (PERF.md); on device they fuse into the normalize pass for free.

Distribution notes vs the host path:
* each op still applies with p=0.5 and the same factor ranges
  (brightness/contrast/saturation/gamma U(0.5,1.5), hue U(-18,18)/255);
* op ORDER is fixed (brightness, contrast, saturation, hue, gamma) rather
  than shuffled per image — a jit-friendly simplification, documented here
  deliberately; per-op application is still independent per image.
* gaussian noise matches imgaug AdditiveGaussianNoise(scale U(0, 0.03*255),
  per_channel p=0.3); blur/median/sharpen stay host-side (rarely the
  bottleneck once cv2-backed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _luma(x):
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])


def _rgb_to_hsv(x):
    """x in [0,1] -> (h in [0,1), s, v); vectorized, same math as the host
    numpy path (data/augment.py)."""
    mx = x.max(-1)
    mn = x.min(-1)
    diff = mx - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    h = jnp.where(mx == r, ((g - b) / safe) % 6.0,
                  jnp.where(mx == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0))
    h = jnp.where(diff == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, diff / jnp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    # branchless closed form (identical to the 6-sector formula): channel
    # n in {5,3,1} is v - v*s*clip(min(k, 4-k), 0, 1), k = (n+6h) mod 6.
    # The 6-way stack+gather alternative materializes a 6x-batch tensor
    # and is ~100x slower on TPU (memory-bound gather over HBM).
    def chan(n):
        k = (n + h * 6.0) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)
    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], -1)


def color_jitter(images: jax.Array, key: jax.Array) -> jax.Array:
    """Per-image photometric distortion on a raw [0, 255] batch.

    images: (B, H, W, 3) uint8 or float in [0, 255]. Returns float32 in
    [0, 255]. Each sub-op applies with p=0.5 per image.
    """
    x = images.astype(jnp.float32)
    b = x.shape[0]
    keys = jax.random.split(key, 6)

    def gate_and_factor(k, lo=0.5, hi=1.5):
        ka, kb = jax.random.split(k)
        apply = jax.random.uniform(ka, (b, 1, 1, 1)) < 0.5
        f = jax.random.uniform(kb, (b, 1, 1, 1), minval=lo, maxval=hi)
        return jnp.where(apply, f, 1.0)

    # brightness: blend toward 0
    fb = gate_and_factor(keys[0])
    x = x * fb
    # contrast: blend toward the grayscale mean
    fc = gate_and_factor(keys[1])
    mean = _luma(x).mean(axis=(1, 2))[:, None, None, None]
    x = mean + fc * (x - mean)
    # saturation: blend toward the grayscale image
    fs = gate_and_factor(keys[2])
    gray = _luma(x)[..., None]
    x = gray + fs * (x - gray)
    x = jnp.clip(x, 0.0, 255.0)
    # hue: rotate in HSV
    ka, kb = jax.random.split(keys[3])
    apply_h = jax.random.uniform(ka, (b, 1, 1)) < 0.5
    delta = jax.random.uniform(kb, (b, 1, 1), minval=-18 / 255.0,
                               maxval=18 / 255.0)
    h, s, v = _rgb_to_hsv(x / 255.0)
    h = jnp.where(apply_h, (h + delta) % 1.0, h)
    x = jnp.clip(_hsv_to_rgb(h, s, v) * 255.0, 0.0, 255.0)
    # gamma
    fg = gate_and_factor(keys[4])
    x = jnp.clip((x / 255.0) ** fg * 255.0, 0.0, 255.0)
    return x


def additive_noise(images: jax.Array, key: jax.Array) -> jax.Array:
    """imgaug AdditiveGaussianNoise: scale U(0, 0.03*255) per image,
    per-channel draws with p=0.3, applied with p=0.5 (the Sometimes gate
    of the reference pipeline, folder2lmdb.py:29-42 — noise is one of the
    SomeOf ops; blur/sharpen remain host-side)."""
    x = images.astype(jnp.float32)
    b = x.shape[0]
    k_gate, k_scale, k_pc, k_n3, k_n1 = jax.random.split(key, 5)
    apply = jax.random.uniform(k_gate, (b, 1, 1, 1)) < 0.5
    scale = jax.random.uniform(k_scale, (b, 1, 1, 1),
                               maxval=0.03 * 255.0)
    per_channel = jax.random.uniform(k_pc, (b, 1, 1, 1)) < 0.3
    n3 = jax.random.normal(k_n3, x.shape)
    n1 = jax.random.normal(k_n1, x.shape[:3])[..., None]
    noise = jnp.where(per_channel, n3, n1) * scale
    return jnp.clip(jnp.where(apply, x + noise, x), 0.0, 255.0)


def device_pixel_aug(images: jax.Array, key: jax.Array) -> jax.Array:
    """Color jitter + independently-gated additive noise in one pass.

    NOTE: not used by the trainer — the train paths keep the noise trio
    host-side (or host-sampled + device-drawn, slot_noise) to preserve
    the reference's op set/probabilities/order, and apply ``color_jitter``
    alone on device. This combo remains for standalone use where an
    independent p=0.5 noise gate after jitter is acceptable."""
    k1, k2 = jax.random.split(key)
    return additive_noise(color_jitter(images, k1), k2)


# ------------------------------------------------- geometric composition --
#
# Device half of the geometry-on-device augmentation path (host half:
# data/geometry.py). Each output image is built from <=4 tiles, each an
# affine resample of a staged source: this covers expand (dst smaller than
# the canvas, mean fill around it), random crop (src window), horizontal
# flip (pixel reverse; rects arrive pre-mirrored) and mosaic composition
# (4 tiles + per-tile mean fill) — the whole geometric pipeline of
# reference utils/image_augmentation.py:14-166,199-278 as ONE jitted pass.
#
# Resampling is bilinear with edge clamp via per-dimension weight matrices
# (two matmuls per tile — MXU work, exactly cv2.INTER_LINEAR semantics;
# jax.image.scale_and_translate is NOT used because it zero-fills samples
# that straddle the source border, leaving dark fringes at tile edges).


def _axis_weights(out_size: int, in_size: int, src0, src1, dst0, dst1):
    """(out_size, in_size) bilinear weight matrix mapping the source span
    [src0, src1) (continuous pixels) onto the output span [dst0, dst1).

    Output pixels outside the destination span get garbage rows (they are
    masked away by the caller); inside, sample positions are edge-clamped
    like cv2. All span endpoints may be traced scalars."""
    denom = jnp.maximum(dst1 - dst0, 1e-6)
    o = jnp.arange(out_size, dtype=jnp.float32)
    u = src0 + (o + 0.5 - dst0) * (src1 - src0) / denom  # continuous coord
    u = jnp.clip(u - 0.5, 0.0, in_size - 1.0)            # index coord
    i0 = jnp.floor(u)
    frac = u - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    idx = jnp.arange(in_size, dtype=jnp.int32)
    w = ((idx[None, :] == i0[:, None]) * (1.0 - frac)[:, None]
         + (idx[None, :] == i1[:, None]) * frac[:, None])
    return w


def _rect_mask(rect, out_h: int, out_w: int):
    """Boolean (out_h, out_w) mask of a normalized [x1,y1,x2,y2] rect,
    pixel centers against edges — matches the host path's integer slices
    for integer-aligned rects."""
    yy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    xx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    return ((yy[:, None] >= rect[1]) & (yy[:, None] < rect[3])
            & (xx[None, :] >= rect[0]) & (xx[None, :] < rect[2]))


def _compose_one(slots, src_rect, dst_rect, fill_rect, fill_color,
                 fill_from_mean, flip, active, out_h: int, out_w: int):
    """Compose one output image (out_h, out_w, 3) f32 from its tiles."""
    s_h, s_w = slots.shape[1], slots.shape[2]
    out = jnp.zeros((out_h, out_w, 3), jnp.float32)
    for k in range(slots.shape[0]):
        img = slots[k].astype(jnp.float32)
        img = jnp.where(flip[k], img[:, ::-1], img)
        sr, dr = src_rect[k], dst_rect[k]
        # per-tile mean fill (mosaic): mean of the source window of the
        # (jittered, flipped) slot — reference :268 uses the resized
        # source's mean, which bilinear resampling preserves
        smask = _rect_mask(sr, s_h, s_w)[..., None]
        cnt = jnp.maximum(smask.sum(), 1.0)
        src_mean = (img * smask).sum(axis=(0, 1)) / cnt
        fcol = jnp.where(fill_from_mean[k], src_mean, fill_color[k])
        fmask = _rect_mask(fill_rect[k], out_h, out_w) & active[k]
        out = jnp.where(fmask[..., None], fcol, out)
        # paste: bilinear resample of the source window into the dst rect
        wy = _axis_weights(out_h, s_h, sr[1] * s_h, sr[3] * s_h,
                           dr[1] * out_h, dr[3] * out_h)
        wx = _axis_weights(out_w, s_w, sr[0] * s_w, sr[2] * s_w,
                           dr[0] * out_w, dr[2] * out_w)
        res = jnp.einsum("oi,ijc->ojc", wy, img)
        res = jnp.einsum("pj,ojc->opc", wx, res)
        pmask = _rect_mask(dr, out_h, out_w) & active[k]
        out = jnp.where(pmask[..., None], res, out)
    return out


def slot_noise(slots, key, gate, scale, per_channel) -> jax.Array:
    """Additive gaussian noise per staged source slot — the device half of
    the host's deferred imgaug AdditiveGaussianNoise op
    (data/augment.py:pixel_noise(defer_noise=True)): the host samples
    whether/with which parameters per source; the device draws the ~600k
    gaussians.

    slots (B, T, S, S, 3) uint8/f32; gate/per_channel (B, T) bool;
    scale (B, T) f32 in [0, 255] units. Returns f32 [0, 255].
    """
    x = slots.astype(jnp.float32)
    k3, k1 = jax.random.split(key)
    n3 = jax.random.normal(k3, x.shape)
    n1 = jax.random.normal(k1, x.shape[:-1])[..., None]
    pc = per_channel[:, :, None, None, None]
    g = gate[:, :, None, None, None]
    noise = jnp.where(pc, n3, n1) * scale[:, :, None, None, None]
    return jnp.clip(jnp.where(g, x + noise, x), 0.0, 255.0)


def _axis_weights_area(out_size: int, in_size: int, src0, src1, dst0, dst1):
    """(out_size, in_size) AREA-average weight matrix: output cell o's
    source span is box-filtered over the input pixels it covers (exact
    cv2.INTER_AREA for separable scaling — the right filter for heavy
    downscale of {0,1} masks, where bilinear point-sampling aliases).
    Rows outside the destination span are garbage (masked by caller)."""
    denom = jnp.maximum(dst1 - dst0, 1e-6)
    o = jnp.arange(out_size, dtype=jnp.float32)
    step = (src1 - src0) / denom
    u0 = src0 + (o - dst0) * step          # output cell's source span
    u1 = u0 + step
    u0 = jnp.clip(u0, 0.0, float(in_size))
    u1 = jnp.clip(u1, 0.0, float(in_size))
    i = jnp.arange(in_size, dtype=jnp.float32)
    overlap = (jnp.minimum(u1[:, None], i[None, :] + 1.0)
               - jnp.maximum(u0[:, None], i[None, :]))
    w = jnp.clip(overlap, 0.0, None)
    return w / jnp.maximum((u1 - u0)[:, None], 1e-6)


def seg_compose(seg_slots, src_rect, dst_rect, flip, seg_active,
                out_hw16, num_classes: int) -> jax.Array:
    """Compose segmentation training targets on device.

    seg_slots (B, T, S, S) uint8 class-id maps staged with NEAREST;
    src/dst rects and flip are the SAME tile parameters as the image
    compose; seg_active (B, T) bool (False outside singles — the host
    path carries no seg through mosaics, folder2lmdb.py:155-177).
    Returns (B, H16, W16, num_classes) float32 in [0, 1] — the
    fraction-of-coverage targets the host path produces by AREA-resizing
    per-class masks (pipeline._collate, reference folder2lmdb.py:243-250).
    Regions outside every tile (expand filler) are 0 = background.
    """
    out_h, out_w = int(out_hw16[0]), int(out_hw16[1])
    s_h, s_w = seg_slots.shape[2], seg_slots.shape[3]

    def one(slots, srcs, dsts, flips, acts):
        out = jnp.zeros((out_h, out_w, num_classes), jnp.float32)
        for k in range(slots.shape[0]):
            ids = slots[k]
            ids = jnp.where(flips[k], ids[:, ::-1], ids)
            sr, dr = srcs[k], dsts[k]
            wy = _axis_weights_area(out_h, s_h, sr[1] * s_h, sr[3] * s_h,
                                    dr[1] * out_h, dr[3] * out_h)
            wx = _axis_weights_area(out_w, s_w, sr[0] * s_w, sr[2] * s_w,
                                    dr[0] * out_w, dr[2] * out_w)
            masks = jnp.stack(
                [(ids == c).astype(jnp.float32)
                 for c in range(1, num_classes + 1)], -1)
            res = jnp.einsum("oi,ijc->ojc", wy, masks)
            res = jnp.einsum("pj,ojc->opc", wx, res)
            pmask = _rect_mask(dr, out_h, out_w) & acts[k]
            out = jnp.where(pmask[..., None], res, out)
        return jnp.clip(out, 0.0, 1.0)

    return jax.vmap(one)(seg_slots, src_rect, dst_rect, flip, seg_active)


def geometric_compose(slots, src_rect, dst_rect, fill_rect, fill_color,
                      fill_from_mean, flip, active, out_hw,
                      jitter_key=None) -> jax.Array:
    """Batched device-side geometric augmentation.

    slots (B, 4, S, S, 3) uint8 staged sources; rects (B, 4, 4) f32
    normalized; fill_color (B, 4, 3) raw [0,255]; fill_from_mean / flip /
    active (B, 4) bool; out_hw static (H, W).

    With ``jitter_key``, photometric color jitter runs per SOURCE before
    composition (the reference jitters each mosaic source independently,
    transform_od :279-334 applied per image in folder2lmdb.py:131-135).
    Returns (B, H, W, 3) float32 in [0, 255].
    """
    b, t = slots.shape[0], slots.shape[1]
    if jitter_key is not None:
        s = slots.shape[2:]
        flat = slots.reshape((b * t,) + s)
        flat = color_jitter(flat, jitter_key)
        slots = flat.reshape((b, t) + s)
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    return jax.vmap(
        lambda *a: _compose_one(*a, out_h, out_w)
    )(slots, src_rect, dst_rect, fill_rect, fill_color, fill_from_mean,
      flip, active)

