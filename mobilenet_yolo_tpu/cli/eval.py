"""Standalone mAP evaluation CLI (reference ``train.py --evaluate``):

    python -m mobilenet_yolo_tpu.cli.eval -y <data.yaml> -c <ckptdir>
"""

from __future__ import annotations

import argparse

from mobilenet_yolo_tpu.config import default_data_yaml

import json


def main(argv=None):
    parser = argparse.ArgumentParser(description="YOLO mAP evaluation")
    parser.add_argument("-y", "--data_yaml", dest="data_yaml",
                        default=default_data_yaml())
    parser.add_argument("-c", "--checkpoint", default="checkpoint")
    parser.add_argument("--backbone", default="mbv2",
                        choices=["mbv2", "mbv3", "mbv3_macc"])
    parser.add_argument("--val-conf", default=0.1, type=float)
    parser.add_argument("--batch-size", default=32, type=int)
    parser.add_argument("--random-weights", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import yaml

    from mobilenet_yolo_tpu.cli.infer import load_variables
    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader
    from mobilenet_yolo_tpu.eval import Evaluator, make_predict_fn
    from mobilenet_yolo_tpu.models import build_model

    cfg = load_config(args.data_yaml)
    model = build_model(cfg.model, args.backbone)
    mc = cfg.model
    x = jnp.zeros((args.batch_size, mc["img_h"], mc["img_w"], 3), jnp.float32)
    variables = load_variables(model, args.checkpoint, x,
                               random_ok=args.random_weights)
    predict = make_predict_fn(model, mc)

    with open(args.data_yaml) as f:
        data_cfg = yaml.safe_load(f)
    ds = DetectionDataset(
        RecordReader(data_cfg["test_dataset_path"]["lmdb"]), phase="test")
    norm = mc["normalize"]
    loader = Loader(ds, args.batch_size, [[mc["img_w"], mc["img_h"]]],
                    norm["mean"], norm["std"], shuffle=False)

    ev = Evaluator(cfg.classes)
    val_conf = jnp.float32(args.val_conf)
    for batch in loader:
        # pad the tail batch to the compiled shape
        images = batch["images"]
        n = images.shape[0]
        if n < args.batch_size:
            pad = args.batch_size - n
            images = jnp.concatenate(
                [jnp.asarray(images),
                 jnp.zeros((pad,) + images.shape[1:], jnp.float32)])
        out = predict(variables, jnp.asarray(images), val_conf)
        ev.add_batch(out[0][:n], out[1][:n], batch["gt"], batch["n_gt"])

    aps, mAP, tp, fp = ev.compute()
    print(json.dumps({"mAP": mAP, "APs": aps}, indent=2))
    return mAP


if __name__ == "__main__":
    main()
