"""Standalone mAP evaluation CLI (reference ``train.py --evaluate``):

    python -m mobilenet_yolo_tpu.cli.eval -y <data.yaml> -c <ckptdir>

Runs the SAME evaluation driver as ``Trainer.evaluate``
(eval/evaluator.py:evaluate_detection), so the VOC protocol — difficult-GT
handling (reference eval_mAP.py:8-67), the model yaml's ``nms_top_k``
horizon, segmentation mIoU for multi-task checkpoints — cannot drift
between the training-loop eval and this CLI. Orbax checkpoints also
restore the training run's adapted ``val_conf`` (the reference's feedback
controller state, train.py:434-440) unless ``--val-conf`` overrides it.
"""

from __future__ import annotations

import argparse

from mobilenet_yolo_tpu.config import default_data_yaml

import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="YOLO mAP evaluation")
    parser.add_argument("-y", "--data_yaml", dest="data_yaml",
                        default=default_data_yaml())
    parser.add_argument("-c", "--checkpoint", default="checkpoint")
    parser.add_argument("--backbone", default="mbv2",
                        choices=["mbv2", "mbv3", "mbv3_macc"])
    parser.add_argument("--val-conf", default=None, type=float,
                        help="confidence gate; default: the checkpoint's "
                             "adapted val_conf (0.1 when unavailable)")
    parser.add_argument("--batch-size", default=32, type=int)
    parser.add_argument("--mesh", default="auto", type=str,
                        help="device mesh spec (see cli/train.py --mesh); "
                             "'auto' shards the eval batch over all "
                             "visible chips")
    parser.add_argument("--random-weights", action="store_true")
    parser.add_argument("--coco-ap", action="store_true",
                        help="also report COCO-protocol AP@[.5:.95]/AP50/"
                             "AP75 (beyond-reference; ops/coco_ap.py)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    import yaml

    from mobilenet_yolo_tpu.cli.infer import load_variables
    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from mobilenet_yolo_tpu.eval.evaluator import evaluate_detection
    from mobilenet_yolo_tpu.parallel import mesh_from_spec

    from mobilenet_yolo_tpu.models import build_model

    cfg = load_config(args.data_yaml)
    mc = cfg.model
    model = build_model(mc, args.backbone)
    x = jnp.zeros((args.batch_size, mc["img_h"], mc["img_w"], 3), jnp.float32)

    val_conf = args.val_conf
    if os.path.isdir(args.checkpoint) and not args.random_weights:
        # restore the full TrainState: weights AND the adapted val_conf
        # (template-free: EMA and non-EMA runs both load; EMA runs
        # evaluate with the averaged weights, like the trainer did)
        from mobilenet_yolo_tpu.train.checkpoints import CheckpointManager
        raw = CheckpointManager(args.checkpoint).restore_latest_raw()
        if raw is None:
            raise FileNotFoundError(
                f"no checkpoint found at {args.checkpoint}")
        params = raw.get("ema_params") or raw["params"]
        variables = {"params": jax.tree.map(jnp.asarray, params),
                     "batch_stats": jax.tree.map(jnp.asarray,
                                                 raw["batch_stats"])}
        if val_conf is None:
            val_conf = float(raw["val_conf"])
    else:
        variables = load_variables(model, args.checkpoint, x,
                                   random_ok=args.random_weights)
    if val_conf is None:
        val_conf = 0.1

    mesh = mesh_from_spec(args.mesh)
    # same NMS horizon as the Trainer (TrainerConfig.nms_top_k semantics:
    # the reference's ragged pipeline has no cap, utils/box.py:11-31)
    predict = make_predict_fn(model, mc,
                              top_k=int(mc.get("nms_top_k", 512)),
                              mesh=mesh)

    with open(args.data_yaml) as f:
        data_cfg = yaml.safe_load(f)
    seg_nc = int(data_cfg.get("segmentation_num_classes", 0))
    ds = DetectionDataset(
        RecordReader(data_cfg["test_dataset_path"]["lmdb"]), phase="test",
        has_seg=cfg.segmentation_enabled, seg_num_classes=seg_nc)
    norm = mc["normalize"]
    loader = Loader(ds, args.batch_size, [[mc["img_w"], mc["img_h"]]],
                    norm["mean"], norm["std"], shuffle=False,
                    pad_final=False)

    res = evaluate_detection(
        predict, variables, loader, cfg.classes, val_conf,
        pad_multiple=(mesh.shape.get("data", 1) if mesh is not None else 1),
        batch_size=args.batch_size, coco_ap=args.coco_ap)
    out = {"mAP": res["mAP"], "APs": res["aps"],
           "val_conf": val_conf}
    if res["seg_miou"] is not None:
        out["seg_mIoU"] = float(res["seg_miou"])
    if args.coco_ap:
        out["coco"] = res["coco"]
    print(json.dumps(out, indent=2))
    return res["mAP"]


if __name__ == "__main__":
    main()
