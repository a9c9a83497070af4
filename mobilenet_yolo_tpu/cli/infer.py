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
import time

import numpy as np

DISTINCT_COLORS = ["#e6194b", "#3cb44b", "#ffe119", "#0082c8", "#f58231",
                   "#911eb4", "#46f0f0", "#f032e6", "#d2f53c", "#fabebe",
                   "#008080"]


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="YOLO Inference")
    parser.add_argument("-c", "--checkpoint", default="checkpoint", type=str,
                        help="checkpoint dir (orbax) or .npz params file")
    parser.add_argument("-y", "--data_yaml", dest="data_yaml",
                        default=default_data_yaml())
    parser.add_argument("-i", "--input", default="images/000166.jpg")
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
        import orbax.checkpoint as ocp
        from mobilenet_yolo_tpu.train.state import create_train_state
        state, _ = create_train_state(model, jax.random.PRNGKey(0),
                                      (example.shape[2], example.shape[1]))
        mgr = ocp.CheckpointManager(os.path.abspath(checkpoint))
        step = mgr.latest_step()
        if step is not None:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(state))
            return {"params": restored.params,
                    "batch_stats": restored.batch_stats}
    raise FileNotFoundError(f"no loadable checkpoint at {checkpoint}")


def main(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image, ImageDraw
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from mobilenet_yolo_tpu.models import build_model

    cfg = load_config(args.data_yaml)
    classes = cfg.data["classes"]["map"]
    model = build_model(cfg.model, args.backbone)

    original = Image.open(args.input).convert("RGB")
    width, height = original.size
    s = args.img_size
    resized = original.resize((s, s), Image.BILINEAR)
    x = np.asarray(resized, np.float32) / 255.0
    x = (x - 0.5) / 1.0
    x = jnp.asarray(x[None])

    variables = load_variables(model, args.checkpoint, x,
                               random_ok=args.random_weights)
    predict = make_predict_fn(model, cfg.model)
    out = predict(variables, x, jnp.float32(args.val_conf))  # compile
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = predict(variables, x, jnp.float32(args.val_conf))
    jax.block_until_ready(out[0])
    print("model inference time : ", (time.perf_counter() - t0) * 1000, "ms")

    dets = np.asarray(out[0][0])
    keep = np.asarray(out[1][0])
    seg_maps = np.asarray(out[2][0]) if len(out) > 2 else None

    draw = ImageDraw.Draw(original)
    n_drawn = 0
    for det, k in zip(dets, keep):
        if not k:
            continue
        conf, cls_conf, cls_idx = det[4], det[5], int(det[6])
        if conf * cls_conf <= 0.15:
            continue
        box = [det[0] * width, det[1] * height, det[2] * width, det[3] * height]
        draw.rectangle(box, outline=DISTINCT_COLORS[0])
        draw.text((box[0] + 3, max(0.0, box[1] - 10)),
                  classes[cls_idx].lower(), fill="white")
        n_drawn += 1
    print(f"{n_drawn} detections drawn")

    annotated = np.asarray(original).astype(np.float32)
    if seg_maps is not None:
        color_channel = [1, 0]  # G, R channels of RGB (ref uses BGR [1,2])
        for idx in range(min(seg_maps.shape[-1], 2)):
            m = np.asarray(Image.fromarray(
                (seg_maps[..., idx] * 255).astype(np.uint8)).resize(
                    (width, height), Image.BILINEAR), np.float32) / 255.0
            mask = m > 0.5
            ch = color_channel[idx]
            annotated[..., ch][mask] = annotated[..., ch][mask] * (1.0 - m[mask])

    os.makedirs(args.out_dir, exist_ok=True)
    name = os.path.basename(args.input).split(".")[0]
    out_path = os.path.join(args.out_dir, f"{name}_result.jpg")
    Image.fromarray(annotated.astype(np.uint8)).save(out_path)
    print(out_path)
    return out_path


if __name__ == "__main__":
    main(get_args())
