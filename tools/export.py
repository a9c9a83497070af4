"""Model export for serving.

The reference's deployment path is the (commented-out) ONNX export
(train.py:429-433). TPU-native equivalents:

* ``--what npz``    — flat .npz of params + batch stats (tools_io format;
  loadable by cli/infer.py and --init-from)
* ``--what aot``    — ahead-of-time-compiled serialized executable for the
  current device via jax.export: deserializable and callable without
  retracing Python (the serving artifact)
* ``--what stablehlo`` — StableHLO text of the full detect pipeline
  (portable IR; the ONNX analog in the XLA ecosystem)

Usage:
    python tools/export.py --checkpoint <ckptdir|params.npz> \
        --data-yaml mobilenet_yolo_tpu/configs/voc_data.yaml \
        --what stablehlo --out model.stablehlo
"""

from __future__ import annotations

import argparse

from mobilenet_yolo_tpu.config import default_data_yaml



def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", default="checkpoint")
    parser.add_argument("--data-yaml", dest="data_yaml",
                        default=default_data_yaml())
    parser.add_argument("--backbone", default="mbv2",
                        choices=["mbv2", "mbv3", "mbv3_macc"])
    parser.add_argument("--what", default="stablehlo",
                        choices=["npz", "aot", "stablehlo"])
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch-size", default=1, type=int)
    parser.add_argument("--img-size", default=None, type=int)
    parser.add_argument("--val-conf", default=0.3, type=float)
    parser.add_argument("--random-weights", action="store_true")
    parser.add_argument("--fold-bn", action="store_true",
                        help="fold BatchNorms into conv weights first")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from mobilenet_yolo_tpu.cli.infer import load_variables
    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from mobilenet_yolo_tpu.models import build_model

    cfg = load_config(args.data_yaml)
    model = build_model(cfg.model, args.backbone)
    size = args.img_size or int(cfg.model["img_w"])
    x = jnp.zeros((args.batch_size, size, size, 3), jnp.float32)
    variables = load_variables(model, args.checkpoint, x,
                               random_ok=args.random_weights)
    if args.fold_bn:
        from mobilenet_yolo_tpu.models.bn_fold import fold_batchnorm
        variables = fold_batchnorm(variables)

    if args.what == "npz":
        from mobilenet_yolo_tpu.tools_io import save_params_npz
        save_params_npz(args.out, variables["params"],
                        variables.get("batch_stats", {}))
        print(f"wrote {args.out}")
        return

    predict = make_predict_fn(model, cfg.model)

    def serve(images, val_conf):
        return predict(variables, images, val_conf)

    exported = jax.export.export(jax.jit(serve))(
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((), jnp.float32))

    if args.what == "stablehlo":
        with open(args.out, "w") as f:
            f.write(exported.mlir_module())
    else:  # aot
        with open(args.out, "wb") as f:
            f.write(exported.serialize())
    print(f"wrote {args.out} "
          f"(call via jax.export.deserialize(...).call(images, val_conf))")


if __name__ == "__main__":
    main()
