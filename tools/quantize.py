"""Post-training int8 quantization CLI (the KL720-port analog).

The reference deploys to the Kneron KL720 NPU (reference README.md:54),
whose offline toolchain quantizes the net to int8 against calibration
images. This tool is the same workflow for this stack
(mobilenet_yolo_tpu/quant.py): fold BN, quantize every ConvBNAct kernel
per-output-channel, calibrate activation ranges on the test record store
(or random data), write the int8 artifact, and optionally A/B float vs
simulated-int8 mAP through the shared evaluation driver.

Usage:
    python tools/quantize.py --checkpoint checkpoint \
        --data-yaml mobilenet_yolo_tpu/configs/voc_data.yaml \
        --out model_int8.npz [--calib-batches 4] [--eval]
"""

from __future__ import annotations

import argparse
import json
import os

from mobilenet_yolo_tpu.config import default_data_yaml


def main(argv=None):
    parser = argparse.ArgumentParser(description="int8 PTQ")
    parser.add_argument("--checkpoint", default="checkpoint")
    parser.add_argument("--data-yaml", dest="data_yaml",
                        default=default_data_yaml())
    parser.add_argument("--backbone", default="mbv2",
                        choices=["mbv2", "mbv3", "mbv3_macc"])
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch-size", default=8, type=int)
    parser.add_argument("--calib-batches", default=4, type=int,
                        help="calibration batches from the test record "
                             "store (random images if it is unavailable)")
    parser.add_argument("--random-weights", action="store_true")
    parser.add_argument("--eval", action="store_true",
                        help="A/B float vs simulated-int8 mAP on the test "
                             "set (same driver as cli/eval.py)")
    parser.add_argument("--val-conf", default=0.3, type=float)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    import numpy as np

    from mobilenet_yolo_tpu import quant
    from mobilenet_yolo_tpu.cli.infer import load_variables
    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.models.bn_fold import fold_batchnorm

    cfg = load_config(args.data_yaml)
    mc = cfg.model
    model = build_model(mc, args.backbone)
    h, w = mc["img_h"], mc["img_w"]
    x = jnp.zeros((args.batch_size, h, w, 3), jnp.float32)
    variables = load_variables(model, args.checkpoint, x,
                               random_ok=args.random_weights)
    variables = fold_batchnorm(variables)

    qkernels, wscales = quant.quantize_weights(variables["params"])

    # calibration batches: test record store when present, else random
    loader = _test_loader(args, cfg)
    batches = []
    if loader is not None:
        for batch in loader:
            batches.append(batch["images"])
            if len(batches) >= args.calib_batches:
                break
    if not batches:
        rng = np.random.default_rng(0)
        batches = [rng.normal(0, 0.25, size=(args.batch_size, h, w, 3))
                   .astype(np.float32) for _ in range(args.calib_batches)]
        print("calibration: test record store unavailable, using "
              f"{args.calib_batches} random batches")

    fq_variables = quant.fake_quant_variables(variables, qkernels, wscales)
    act_scales = quant.calibrate_activations(model, fq_variables, batches)
    quant.save_int8(args.out, variables, qkernels, wscales, act_scales)
    n_int8 = sum(int(q.size) for q in qkernels.values())
    n_total = sum(int(np.asarray(p).size) for p in
                  jax.tree_util.tree_leaves(variables["params"]))
    report = {"sites": len(qkernels), "int8_weights": n_int8,
              "total_params": n_total,
              "int8_fraction": round(n_int8 / n_total, 4),
              "out": args.out}

    if args.eval:
        report.update(_eval_ab(args, cfg, model, variables, fq_variables,
                               act_scales))
    print(json.dumps(report, indent=2))
    return report


def _test_loader(args, cfg):
    import yaml
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader

    with open(args.data_yaml) as f:
        data_cfg = yaml.safe_load(f)
    path = (data_cfg.get("test_dataset_path") or {}).get("lmdb")
    if not path or not os.path.exists(path):
        return None
    mc = cfg.model
    seg_nc = int(data_cfg.get("segmentation_num_classes", 0))
    ds = DetectionDataset(RecordReader(path), phase="test",
                          has_seg=cfg.segmentation_enabled,
                          seg_num_classes=seg_nc)
    norm = mc.get("normalize", {"mean": [0.5] * 3, "std": [1.0] * 3})
    return Loader(ds, args.batch_size, [[mc["img_w"], mc["img_h"]]],
                  norm["mean"], norm["std"], shuffle=False,
                  pad_final=False)


def _eval_ab(args, cfg, model, variables, fq_variables, act_scales):
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from mobilenet_yolo_tpu.eval.evaluator import evaluate_detection
    from mobilenet_yolo_tpu.quant import QuantSim

    mc = cfg.model
    top_k = int(mc.get("nms_top_k", 512))
    results = {}
    for tag, mdl, vs in (
            ("float", model, variables),
            ("int8", QuantSim(model, act_scales), fq_variables)):
        loader = _test_loader(args, cfg)
        if loader is None:
            return {"eval": "skipped (no test record store)"}
        predict = make_predict_fn(mdl, mc, top_k=top_k)
        res = evaluate_detection(predict, vs, loader, cfg.classes,
                                 args.val_conf,
                                 batch_size=args.batch_size)
        results[f"mAP_{tag}"] = res["mAP"]
    results["mAP_drop"] = results["mAP_float"] - results["mAP_int8"]
    return results


if __name__ == "__main__":
    main()
