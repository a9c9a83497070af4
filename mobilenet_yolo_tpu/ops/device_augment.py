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
* each op applies with p=0.5 and the same factor ranges
  (brightness/contrast/saturation/gamma U(0.5,1.5), hue U(-18,18)/255);
* BOTH device train paths use :func:`planned_color_jitter`, whose op
  ORDER (and every factor) is host-sampled per image via the host path's
  own sampler (data/augment.py:sample_photometric) — the exact reference
  distribution including the per-image shuffle. The geometry planner
  emits the programs per tile; in --device-pixel-aug mode the Loader's
  _collate emits them per image. Only the standalone :func:`color_jitter`
  (key-driven, serving/demo use) keeps a fixed order.
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


def planned_color_jitter(images: jax.Array, op_ids: jax.Array,
                         factors: jax.Array,
                         dtype=jnp.float32) -> jax.Array:
    """Host-PLANNED photometric distortion: exact reference semantics
    including the per-image random op ORDER (image_augmentation.py:169-198
    shuffles the five ops per image; the standalone :func:`color_jitter`
    fixes the order as a documented serving-path simplification).

    images (N, H, W, 3) uint8/f32 in [0, 255]; op_ids (N, 5) int32 — the
    op index applied at each of the 5 program steps (-1 = identity);
    factors (N, 5) f32 (hue: the delta in revolutions). Both come from
    ``data/augment.py:sample_photometric`` (the SAME sampler the host
    pixel path uses, so the distributions agree draw-for-draw). Returns
    ``dtype`` in [0, 255], clipped after every op like the host's
    ``_blend``. ``dtype=bfloat16`` (the --bf16 train path) halves the
    bandwidth of the select passes; at [0, 255] range bf16's 8-bit
    mantissa quantizes at ~1 intensity level — uint8-like, invisible to
    augmentation. Reductions (the contrast mean) accumulate in f32, and
    the single hue step keeps its HSV round-trip in f32.

    Cost: every candidate op is elementwise, so XLA fuses each program
    step into ~one memory pass — but the hue candidate's HSV round-trip
    dominated a naive 5-step select chain (~12.5 of 17 ms at 128x352² on
    v5e). Since each op appears at most ONCE per program, the program is
    split at the hue position — (non-hue ops before hue), hue, (non-hue
    ops after) — so hue's round-trip runs exactly once: two fori_loop
    phases of 4 cheap (brightness/contrast/saturation/gamma) select steps
    around one masked hue step (~9 ms net). The loop (not an unrolled
    chain) is deliberate: unrolling the fanout-4 select steps triggers
    XLA's exponential fusion duplication and measured 13x SLOWER. The
    split is derived here from the same (N, 5) program arrays; callers
    and the planner are unaffected.
    """
    x = images.astype(dtype)
    n, steps = op_ids.shape

    is_hue = op_ids == 3
    hue_gate = is_hue.any(axis=1)
    hue_step = jnp.argmax(is_hue, axis=1)          # first (only) hue slot
    hue_delta = jnp.take_along_axis(factors, hue_step[:, None], axis=1)[:, 0]
    pos = jnp.arange(steps)[None, :]
    # phase membership of each non-hue op: before or after the hue slot
    # (no hue -> everything is "before"); compact each phase's ops to the
    # front, preserving order, via a stable argsort on selection keys
    live = (op_ids >= 0) & ~is_hue

    def compact(selected):
        key = jnp.where(selected, pos, steps + pos)  # selected first, in order
        order = jnp.argsort(key, axis=1)
        ops = jnp.take_along_axis(
            jnp.where(selected, op_ids, -1), order, axis=1)
        fac = jnp.take_along_axis(
            jnp.where(selected, factors, 1.0), order, axis=1)
        return ops[:, :steps - 1], fac[:, :steps - 1]

    pre_ops, pre_f = compact(live & (~hue_gate[:, None]
                                     | (pos < hue_step[:, None])))
    post_ops, post_f = compact(live & hue_gate[:, None]
                               & (pos > hue_step[:, None]))

    def cheap_phase(x, ops, facs):
        def body(t, x):
            op = jax.lax.dynamic_index_in_dim(
                ops, t, axis=1, keepdims=False)[:, None, None, None]
            f = jax.lax.dynamic_index_in_dim(
                facs, t, axis=1, keepdims=False)[:, None, None, None]
            f = f.astype(dtype)
            xb = jnp.clip(x * f, 0.0, 255.0)
            mean = jnp.mean(_luma(x), axis=(1, 2),
                            dtype=jnp.float32).astype(
                                dtype)[:, None, None, None]
            xc = jnp.clip(mean + f * (x - mean), 0.0, 255.0)
            gray = _luma(x)[..., None]
            xs = jnp.clip(gray + f * (x - gray), 0.0, 255.0)
            xg = jnp.clip((x / 255.0) ** f * 255.0, 0.0, 255.0)
            return jnp.where(op == 0, xb,
                   jnp.where(op == 1, xc,
                   jnp.where(op == 2, xs,
                   jnp.where(op == 4, xg, x))))
        return jax.lax.fori_loop(0, ops.shape[1], body, x)

    x = cheap_phase(x, pre_ops, pre_f)
    # hue's HSV round-trip stays f32 (small channel differences divide)
    xf = x.astype(jnp.float32)
    h, s, v = _rgb_to_hsv(xf / 255.0)
    xh = jnp.clip(_hsv_to_rgb(
        (h + hue_delta[:, None, None]) % 1.0, s, v) * 255.0, 0.0, 255.0)
    x = jnp.where(hue_gate[:, None, None, None], xh, xf).astype(dtype)
    return cheap_phase(x, post_ops, post_f)


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
# Resampling is bilinear with edge clamp, exactly cv2.INTER_LINEAR
# semantics, via a separable TWO-TAP gather+lerp per axis (each output
# pixel reads its two straddling source rows/columns). A dense (out, in)
# weight-matrix einsum computes the identical map but at ~2 GFLOP/image —
# the cost of the whole model forward — because the matrix has only two
# non-zero entries per row; the gather form is pure bandwidth (~100x fewer
# FLOPs) and cut the geometry train step's compose overhead from ~54 ms to
# single-digit ms at batch 32/352 (PERF.md). jax.image.scale_and_translate
# is NOT used because it zero-fills samples that straddle the source
# border, leaving dark fringes at tile edges.


def _axis_taps(out_size: int, in_size: int, src0, src1, dst0, dst1):
    """Two-tap bilinear sampling along one axis: per output pixel the two
    straddling source indices (i0, i1) and the lerp fraction, mapping the
    source span [src0, src1) (continuous pixels) onto the output span
    [dst0, dst1). Output pixels outside the destination span get clamped
    (masked away by the caller); inside, sample positions are edge-clamped
    like cv2. All span endpoints may be traced scalars."""
    denom = jnp.maximum(dst1 - dst0, 1e-6)
    o = jnp.arange(out_size, dtype=jnp.float32)
    u = src0 + (o + 0.5 - dst0) * (src1 - src0) / denom  # continuous coord
    u = jnp.clip(u - 0.5, 0.0, in_size - 1.0)            # index coord
    i0f = jnp.floor(u)
    frac = u - i0f
    i0 = i0f.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    return i0, i1, frac


def _resample_bilinear(img, sr, dr, out_h: int, out_w: int, flip=None,
                       dtype=jnp.float32, planar: bool = False):
    """(out_h, out_w, 3) bilinear resample of img's src window ``sr`` onto
    the dst rect ``dr`` (both normalized [x1,y1,x2,y2]); rows/cols outside
    the dst rect hold edge-clamped garbage the caller masks away.

    ``flip`` (traced bool): sample the horizontally-mirrored image — folded
    into the x gather indices (img_flipped[i] == img[W-1-i]) instead of
    materializing a flipped copy per tile.

    ``planar``: img is (3, S, S) channel-planar (the fused Pallas aug
    kernel's output layout, kernels/pallas_aug.py); output stays HWC."""
    s_h, s_w = (img.shape[1], img.shape[2]) if planar else \
        (img.shape[0], img.shape[1])
    iy0, iy1, fy = _axis_taps(out_h, s_h, sr[1] * s_h, sr[3] * s_h,
                              dr[1] * out_h, dr[3] * out_h)
    ix0, ix1, fx = _axis_taps(out_w, s_w, sr[0] * s_w, sr[2] * s_w,
                              dr[0] * out_w, dr[2] * out_w)
    if flip is not None:
        ix0 = jnp.where(flip, s_w - 1 - ix0, ix0)
        ix1 = jnp.where(flip, s_w - 1 - ix1, ix1)
    fy = fy.astype(dtype)
    fx = fx.astype(dtype)
    if planar:
        rows = (img[:, iy0] * (1.0 - fy)[None, :, None]
                + img[:, iy1] * fy[None, :, None])       # (3, out_h, s_w)
        res = (rows[:, :, ix0] * (1.0 - fx)[None, None, :]
               + rows[:, :, ix1] * fx[None, None, :])    # (3, out_h, out_w)
        return jnp.moveaxis(res, 0, -1)                  # HWC
    rows = (img[iy0] * (1.0 - fy)[:, None, None]
            + img[iy1] * fy[:, None, None])              # (out_h, s_w, 3)
    return (rows[:, ix0] * (1.0 - fx)[None, :, None]
            + rows[:, ix1] * fx[None, :, None])          # (out_h, out_w, 3)


def _rect_mask(rect, out_h: int, out_w: int):
    """Boolean (out_h, out_w) mask of a normalized [x1,y1,x2,y2] rect,
    pixel centers against edges — matches the host path's integer slices
    for integer-aligned rects."""
    yy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    xx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    return ((yy[:, None] >= rect[1]) & (yy[:, None] < rect[3])
            & (xx[None, :] >= rect[0]) & (xx[None, :] < rect[2]))


def _compose_one(slots, src_rect, dst_rect, fill_rect, fill_color,
                 fill_from_mean, flip, active, out_h: int, out_w: int,
                 dtype=jnp.float32, planar: bool = False):
    """Compose one output image (out_h, out_w, 3) ``dtype`` from tiles.

    ``planar``: slots are (T, 3, S, S) (fused-kernel layout)."""
    s_h, s_w = (slots.shape[2], slots.shape[3]) if planar else \
        (slots.shape[1], slots.shape[2])
    out = jnp.zeros((out_h, out_w, 3), dtype)
    for k in range(slots.shape[0]):
        img = slots[k].astype(dtype)
        sr, dr = src_rect[k], dst_rect[k]
        # per-tile mean fill (mosaic): mean of the source window of the
        # (jittered, flipped) slot — reference :268 uses the resized
        # source's mean, which bilinear resampling preserves. The rects
        # arrive pre-mirrored for flipped tiles, so the window mean over
        # the UNFLIPPED slot uses the mirrored rect.
        sr_mask = jnp.where(flip[k],
                            jnp.stack([1.0 - sr[2], sr[1],
                                       1.0 - sr[0], sr[3]]), sr)
        smask = _rect_mask(sr_mask, s_h, s_w)
        cnt = jnp.maximum(smask.sum(), 1.0)
        # window mean accumulates in f32 even under a bf16 compose
        if planar:
            src_mean = jnp.sum(img * smask[None], axis=(1, 2),
                               dtype=jnp.float32) / cnt
        else:
            src_mean = jnp.sum(img * smask[..., None], axis=(0, 1),
                               dtype=jnp.float32) / cnt
        fcol = jnp.where(fill_from_mean[k], src_mean,
                         fill_color[k]).astype(dtype)
        fmask = _rect_mask(fill_rect[k], out_h, out_w) & active[k]
        out = jnp.where(fmask[..., None], fcol, out)
        # paste: bilinear resample of the source window into the dst rect
        # (flip folded into the gather indices)
        res = _resample_bilinear(img, sr, dr, out_h, out_w, flip=flip[k],
                                 dtype=dtype, planar=planar)
        pmask = _rect_mask(dr, out_h, out_w) & active[k]
        out = jnp.where(pmask[..., None], res, out)
    return out


def slot_noise(slots, key, gate, scale, per_channel,
               dtype=jnp.float32) -> jax.Array:
    """Additive gaussian noise per staged source slot — the device half of
    the host's deferred imgaug AdditiveGaussianNoise op
    (data/augment.py:pixel_noise(defer_noise=True)): the host samples
    whether/with which parameters per source; the device draws the ~600k
    gaussians.

    slots (B, T, S, S, 3) uint8/f32; gate/per_channel (B, T) bool;
    scale (B, T) f32 in [0, 255] units. Returns ``dtype`` [0, 255]
    (bf16 under --bf16 halves the noise field's bandwidth).
    """
    x = slots.astype(dtype)
    # draw the ~600k gaussians/image with the fast rbg bit generator
    # instead of threefry (1.5x cheaper here; augmentation noise needs
    # bulk statistical quality, not counter-stable streams — the key
    # still derives deterministically from the trainer's fold_in chain)
    kd = jax.random.key_data(key)
    if kd.shape[-1] == 2:   # threefry key from the caller -> rbg key
        key = jax.random.wrap_key_data(
            jnp.concatenate([kd, kd], axis=-1).astype(jnp.uint32),
            impl="unsafe_rbg")
    n3 = jax.random.normal(key, x.shape, dtype=dtype)
    # shared-plane draw: channel 0 of the per-channel field doubles as the
    # per-pixel plane (each slot takes exactly one branch, so the reuse
    # never correlates values within an output; halves the RNG bill, the
    # biggest remaining compute in the pre-compose stage)
    n1 = n3[..., :1]
    pc = per_channel[:, :, None, None, None]
    g = gate[:, :, None, None, None]
    noise = jnp.where(pc, n3, n1) * scale[:, :, None, None, None].astype(dtype)
    return jnp.clip(jnp.where(g, x + noise, x), 0.0, 255.0)


def fused_aug_compose(slots, src_rect, dst_rect, fill_rect, fill_color,
                      fill_from_mean, flip, active, out_hw,
                      noise_gate, noise_scale, noise_per_channel,
                      jitter_op, jitter_factor, aug_key,
                      dtype=jnp.float32, mesh=None,
                      interpret: bool = False,
                      full: bool = True) -> jax.Array:
    """slot_noise + planned_color_jitter + geometric_compose fused into
    Pallas (kernels/pallas_aug.py) instead of ~10 XLA memory passes over
    the (B, 4, S, S, 3) slots.

    ``full=True`` (default): noise + jitter + the WHOLE geometric compose
    in one kernel — one program per output image, two-tap resample as MXU
    two-hot matmuls, inactive tiles skipped by real branches.
    ``full=False``: per-slot noise+jitter kernel, compose as XLA gathers.

    Same arguments as the separate stages; ``aug_key`` seeds the kernel's
    on-core PRNG (a different — still deterministic — gaussian stream than
    the XLA path's, see the kernel docstring). Under a ``mesh`` the kernel
    is shard_mapped over the ``data`` axis (GSPMD cannot partition an
    opaque pallas_call), with the seed decorrelated per shard; everything
    around it stays GSPMD. ``interpret=True`` runs the kernel in
    interpreter mode (CPU tests)."""
    from mobilenet_yolo_tpu.kernels.pallas_aug import (
        fused_aug_compose_kernel, fused_slot_aug)

    b, t, s_h, s_w = slots.shape[:4]
    seed = jax.random.key_data(aug_key).ravel()[-1].astype(jnp.int32)
    planar = jnp.transpose(slots, (0, 1, 4, 2, 3))   # (B, T, 3, S, S)

    # the kernels emit bf16 regardless of the compose dtype: it halves
    # the downstream read traffic, and bf16 quantizes [0, 255] at
    # ~0.25-0.5 intensity — FINER than the uint8 staging the slots
    # just came from
    if full:
        def body(planar, seed, gate, scale, pc, ops, facs, *geo):
            out = fused_aug_compose_kernel(
                planar, seed, gate, scale, pc, ops, facs, *geo,
                out_hw=out_hw, dtype=jnp.bfloat16, interpret=interpret)
            return jnp.transpose(out, (0, 2, 3, 1))   # NHWC
        # the per-image geometry plans ride through shard_map as explicit
        # batch-sharded args (a closure capture would read shard 0's rows
        # on every device)
        geo = (src_rect, dst_rect, fill_rect, fill_color, fill_from_mean,
               flip, active)
    else:
        def body(planar, seed, gate, scale, pc, ops, facs):
            n = planar.shape[0] * t
            out = fused_slot_aug(
                planar.reshape(n, 3, s_h, s_w), seed, gate.reshape(n),
                scale.reshape(n), pc.reshape(n), ops.reshape(n, -1),
                facs.reshape(n, -1), dtype=jnp.bfloat16,
                interpret=interpret)
            return out.reshape(planar.shape[0], t, 3, s_h, s_w)
        geo = ()

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        def sharded_body(planar, seed, gate, scale, pc, ops, facs, *geo):
            # decorrelate the per-slot noise streams across shards (the
            # kernel hashes the shard-LOCAL slot index)
            seed = seed + jax.lax.axis_index("data").astype(
                jnp.int32) * jnp.int32(101159)
            return body(planar, seed, gate, scale, pc, ops, facs, *geo)

        d = P("data")
        aug = jax.shard_map(sharded_body, mesh=mesh,
                            in_specs=(d, P()) + (d,) * (5 + len(geo)),
                            out_specs=d,
                            check_vma=False)  # pallas outputs carry no vma
    else:
        aug = body
    out = aug(planar, seed, noise_gate, noise_scale, noise_per_channel,
              jitter_op, jitter_factor, *geo)
    if full:
        return out.astype(dtype)
    return geometric_compose(out, src_rect, dst_rect, fill_rect,
                             fill_color, fill_from_mean, flip, active,
                             out_hw, dtype=dtype, planar=True)


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
                      jitter_op=None, jitter_factor=None,
                      dtype=jnp.float32, planar: bool = False) -> jax.Array:
    """Batched device-side geometric augmentation.

    slots (B, 4, S, S, 3) uint8 staged sources; rects (B, 4, 4) f32
    normalized; fill_color (B, 4, 3) raw [0,255]; fill_from_mean / flip /
    active (B, 4) bool; out_hw static (H, W).

    With ``jitter_op``/``jitter_factor`` ((B, 4, 5) host-planned
    photometric programs, data/geometry.py), the color jitter runs per
    SOURCE before composition in the host-shuffled per-image op order (the
    reference jitters each mosaic source independently, transform_od
    :279-334 applied per image in folder2lmdb.py:131-135, with the op
    order shuffled per image, image_augmentation.py:169-198).
    Returns (B, H, W, 3) ``dtype`` in [0, 255] — bf16 under --bf16 halves
    the aug stages' bandwidth (they feed a bf16 forward anyway; bf16
    quantizes [0,255] at ~1 intensity level, i.e. uint8-like).

    ``planar=True``: slots arrive as (B, 4, 3, S, S) float, already
    noise+jittered by the fused Pallas kernel (kernels/pallas_aug.py);
    ``jitter_op`` must be None (the kernel applied the programs).
    """
    b, t = slots.shape[0], slots.shape[1]
    if jitter_op is not None:
        assert not planar, "planar slots are pre-jittered by the kernel"
        s = slots.shape[2:]
        flat = slots.reshape((b * t,) + s)
        flat = planned_color_jitter(flat, jitter_op.reshape(b * t, -1),
                                    jitter_factor.reshape(b * t, -1),
                                    dtype=dtype)
        slots = flat.reshape((b, t) + s)
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    return jax.vmap(
        lambda *a: _compose_one(*a, out_h, out_w, dtype=dtype,
                                planar=planar)
    )(slots, src_rect, dst_rect, fill_rect, fill_color, fill_from_mean,
      flip, active)

