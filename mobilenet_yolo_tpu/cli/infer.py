"""Single-image inference CLI (reference inference.py:13-106 semantics):

    python -m mobilenet_yolo_tpu.cli.infer -c <ckptdir> -y <data.yaml> -i <img>

Resizes to 416x416 with (0.5,0.5,0.5)/(1,1,1) normalization like the
reference demo (inference.py:111-115 — note it deliberately ignores the
config img size / train-time stats), runs the jitted detect pipeline with
val_conf=0.3 (inference.py:46-47), draws boxes above conf*cls_conf > 0.15
(inference.py:83) and alpha-blends segmentation maps on the G/R channels
(inference.py:100-103). Writes ``save/<name>_result.jpg``.
"""

from __future__ import annotations

import argparse

from mobilenet_yolo_tpu.config import default_data_yaml

import os

import numpy as np

def get_args(argv=None):
    parser = argparse.ArgumentParser(description="YOLO Inference")
    parser.add_argument("-c", "--checkpoint", default="checkpoint", type=str,
                        help="checkpoint dir (orbax) or .npz params file")
    parser.add_argument("-y", "--data_yaml", dest="data_yaml",
                        default=default_data_yaml())
    parser.add_argument("-i", "--input", default="images/000166.jpg",
                        help="an image file, or a DIRECTORY of images "
                             "(batched inference over every jpg/png)")
    parser.add_argument("--batch-size", default=16, type=int,
                        help="batch size for directory input (one "
                             "compiled program; the tail batch is padded)")
    parser.add_argument("--backbone", default="mbv2",
                        choices=["mbv2", "mbv3", "mbv3_macc"])
    parser.add_argument("--img-size", default=416, type=int)
    parser.add_argument("--val-conf", default=0.3, type=float)
    parser.add_argument("--out-dir", default="save")
    parser.add_argument("--random-weights", action="store_true",
                        help="skip checkpoint loading (pipeline demo)")
    return parser.parse_args(argv)


def load_variables(model, checkpoint: str, example, random_ok=False):
    import jax
    import jax.numpy as jnp
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), example, train=False))()
    if random_ok:
        return variables
    if checkpoint.endswith(".npz") and os.path.isfile(checkpoint):
        from mobilenet_yolo_tpu.tools_io import load_params_npz
        params, batch_stats = load_params_npz(checkpoint)
        return {"params": jax.tree.map(jnp.asarray, params),
                "batch_stats": jax.tree.map(jnp.asarray, batch_stats)}
    if os.path.isdir(checkpoint):
        from mobilenet_yolo_tpu.train.checkpoints import CheckpointManager
        raw = CheckpointManager(checkpoint).restore_latest_raw()
        if raw is not None:
            # serve the EMA weights when the run maintained them — the
            # same weights the trainer evaluated and selected best by
            params = raw.get("ema_params") or raw["params"]
            return {"params": jax.tree.map(jnp.asarray, params),
                    "batch_stats": jax.tree.map(jnp.asarray,
                                                raw["batch_stats"])}
    raise FileNotFoundError(f"no loadable checkpoint at {checkpoint}")


def main(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from mobilenet_yolo_tpu.models import build_model

    cfg = load_config(args.data_yaml)
    classes = cfg.data["classes"]["map"]
    model = build_model(cfg.model, args.backbone)

    s = args.img_size

    def prep(path):
        """Reference preprocessing (inference.py:111-115): resize to the
        inference size, normalize (0.5,)/(1,)."""
        original = Image.open(path).convert("RGB")
        resized = original.resize((s, s), Image.BILINEAR)
        x = (np.asarray(resized, np.float32) / 255.0 - 0.5) / 1.0
        return original, x

    if os.path.isdir(args.input):
        return _run_directory(args, cfg, classes, model, prep)

    original, x0 = prep(args.input)
    x = jnp.asarray(x0[None])

    variables = load_variables(model, args.checkpoint, x,
                               random_ok=args.random_weights)
    predict = make_predict_fn(model, cfg.model)
    out = predict(variables, x, jnp.float32(args.val_conf))  # compile
    jax.block_until_ready(out[0])
    # block_until_ready is untrustworthy under this remote-execution relay
    # (PERF.md: ~40x undercount); chained_timer serializes iterations via a
    # data dependency and bounds the chain with one scalar fetch.
    from mobilenet_yolo_tpu.utils.profiling import chained_timer
    per_call = chained_timer(
        lambda img: predict(variables, img, jnp.float32(args.val_conf))[0],
        x, iters=16, warmup=2)
    print(f"model inference time : {per_call * 1000:.2f} ms "
          f"(chained mean of 16)")

    dets = np.asarray(out[0][0])
    keep = np.asarray(out[1][0])
    seg_maps = np.asarray(out[2][0]) if len(out) > 2 else None
    out_path = _draw_and_save(args, classes, original, args.input,
                              dets, keep, seg_maps, verbose=True)
    print(out_path)
    return out_path


def _draw_and_save(args, classes, original, src_path, dets, keep,
                   seg_maps, verbose=False, used: set | None = None):
    from mobilenet_yolo_tpu.utils.visualize import (
        draw_detections, overlay_seg_maps, save_image)

    # draw gate: conf * cls_conf > 0.15 (reference inference.py:83)
    shown = dets[keep & (dets[:, 4] * dets[:, 5] > 0.15)]
    if verbose:
        print(f"{len(shown)} detections drawn")
    annotated = draw_detections(
        np.asarray(original), shown[:, :4],
        labels=shown[:, 6].astype(int), scores=shown[:, 4] * shown[:, 5],
        class_names=classes, normalized=True)
    if seg_maps is not None:
        # G/R channels of RGB (the reference blends BGR channels [1,2])
        annotated = overlay_seg_maps(annotated, seg_maps, channels=(1, 0))

    os.makedirs(args.out_dir, exist_ok=True)
    # splitext keeps dotted stems (img.v2.jpg -> img.v2); a counter
    # suffix disambiguates same-stem inputs (im0.jpg + im0.png) within
    # one directory run instead of silently overwriting
    name = os.path.splitext(os.path.basename(src_path))[0]
    out_path = os.path.join(args.out_dir, f"{name}_result.jpg")
    n = 1
    while used is not None and out_path in used:
        out_path = os.path.join(args.out_dir, f"{name}_result.{n}.jpg")
        n += 1
    if used is not None:
        used.add(out_path)
    save_image(out_path, annotated)
    return out_path


def _run_directory(args, cfg, classes, model, prep):
    """Batched inference over a directory: ONE compiled program at
    --batch-size (the tail batch is zero-padded), annotated results
    written per image with the reference's <name>_result.jpg naming."""
    import time

    import jax
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.eval import make_predict_fn

    exts = (".jpg", ".jpeg", ".png", ".bmp")
    paths = sorted(
        os.path.join(args.input, f) for f in os.listdir(args.input)
        if f.lower().endswith(exts))
    if not paths:
        raise FileNotFoundError(f"no images under {args.input}")
    bs = max(1, args.batch_size)
    s = args.img_size

    x0 = jnp.zeros((bs, s, s, 3), jnp.float32)
    variables = load_variables(model, args.checkpoint, x0,
                               random_ok=args.random_weights)
    predict = make_predict_fn(model, cfg.model)
    jax.block_until_ready(predict(variables, x0,
                                  jnp.float32(args.val_conf))[0])

    written = []
    used: set = set()
    t_warm = n_warm = 0.0
    t0 = time.perf_counter()
    for start in range(0, len(paths), bs):
        chunk = paths[start:start + bs]
        originals, arrays = zip(*(prep(p) for p in chunk))
        batch = np.zeros((bs, s, s, 3), np.float32)
        batch[:len(chunk)] = np.stack(arrays)
        out = predict(variables, jnp.asarray(batch),
                      jnp.float32(args.val_conf))
        dets = np.asarray(out[0])      # materialize = sync this batch
        keep = np.asarray(out[1])
        segs = np.asarray(out[2]) if len(out) > 2 else None
        for i, (orig, path) in enumerate(zip(originals, chunk)):
            written.append(_draw_and_save(
                args, classes, orig, path, dets[i], keep[i],
                segs[i] if segs is not None else None, used=used))
        if start == 0:
            # the first batch can absorb one-time compile/transfer work
            # (block_until_ready is untrustworthy under remote relays,
            # PERF.md) — report the warm rate from the second batch on
            t_warm = time.perf_counter()
            n_warm = len(written)
    dt = time.perf_counter() - t0
    rate = ""
    if len(written) > n_warm:
        warm = (len(written) - n_warm) / (time.perf_counter() - t_warm)
        rate = (f" ({warm:.1f} img/s warm, end-to-end incl. decode, "
                f"drawing and JPEG writes; {dt:.1f}s total)")
    print(f"{len(written)} images -> {args.out_dir}{rate}")
    return written


if __name__ == "__main__":
    main(get_args())
