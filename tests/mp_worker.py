"""Worker process for tests/test_multiprocess.py.

Runs ONE epoch (2 train steps) + one evaluation of the real Trainer over a
4-device global mesh, either as a single process (the reference run) or as
one rank of a 2-process ``jax.distributed`` job on localhost CPUs — the
executed-multi-host proof the pod runbook (docs/TRAINING.md §5) points at.
Every rank writes its scalar results as one JSON line so the parent test
can assert (a) both ranks agree bit-for-bit and (b) the multi-process run
matches the single-process run on the same global data.

Not a test module itself (no ``test_`` prefix); launched via subprocess
with JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count
set so each process contributes 2 virtual devices (4 with --num-processes 1).
"""

import argparse
import json


def tiny_model_cfg(img: int = 96) -> dict:
    return {
        "img_w": img, "img_h": img, "batch_size": 8,
        "train_img_size": [[img, img]],
        "expand_scale": 1.5, "mosaic_num": [1], "iou_weighting": 0.02,
        "normalize": {"mean": [0.5] * 3, "std": [1.0] * 3},
        "yolo": {
            "num_classes": 4, "num_anchors": 3,
            "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
            "anchors": [[34, 47], [48, 40], [70, 70],
                        [10, 12], [15, 25], [24, 18]],
            "classes": 4,
            "mask": [[0, 1, 2], [3, 4, 5]],
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--mode", choices=["dp", "tp"], default="dp")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tests")
    from mobilenet_yolo_tpu.parallel.mesh import (create_mesh,
                                                  initialize_distributed,
                                                  warmup_collectives)
    if args.num_processes > 1:
        assert initialize_distributed(args.coordinator, args.num_processes,
                                      args.process_id)
    import numpy as np

    assert jax.device_count() == 4, jax.device_count()
    if args.mode == "tp":
        mesh = create_mesh(n_data=2, n_model=2)
    else:
        mesh = create_mesh(n_data=4, n_model=1)
    # establish the gloo communicator before the big per-process compiles
    # (their skew on a 1-core host can exceed the 30s context deadline)
    warmup_collectives(mesh)
    # phase marker for failure diagnosis: tells the harness whether a
    # rank died before or after its warmup collectives completed (the
    # retry itself keys on the clique-creation error signature, not this
    # marker — new cliques can legitimately form after warmup, see
    # test_multiprocess.py)
    print("WARMUP_OK", flush=True)

    from mobilenet_yolo_tpu.data.synthetic import pad_labels, synthetic_dataset
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.train.loop import Trainer, TrainerConfig

    cfg = tiny_model_cfg()
    model = build_model(cfg)
    tcfg = TrainerConfig(epochs=1, learning_rate=1e-3,
                         checkpoint_dir=args.ckpt, eval_every=1,
                         nms_top_k=32)
    trainer = Trainer(model, cfg, ["bg", "a", "b", "c", "d"], tcfg,
                      mesh=mesh, verbose=False)

    # fixed GLOBAL dataset, identical in every process and process count
    bs, n_batches = 8, 2
    images, labels = synthetic_dataset(bs * n_batches, cfg["img_w"],
                                       cfg["yolo"]["num_classes"], seed=3)
    gt, n_gt = pad_labels(labels, 10)

    def train_batches():
        # each rank feeds its contiguous slice of every global batch
        # (shard_batch assembles the global array from per-process slices)
        local = bs // args.num_processes
        lo = args.process_id * local
        for b in range(n_batches):
            rows = slice(b * bs + lo, b * bs + lo + local)
            yield {"images": images[rows], "gt": gt[rows],
                   "n_gt": n_gt[rows], "count": local}

    def eval_batches():
        # evaluation feeds HOST-COMPLETE batches on every rank
        # (evaluate_detection -> global_batch pulls each host's rows)
        yield {"images": images[:bs], "gt": gt[:bs], "n_gt": n_gt[:bs],
               "count": bs}

    stats = trainer.train_epoch(train_batches(), epoch=0)
    mAP, _ = trainer.evaluate(eval_batches())

    result = {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "mode": args.mode,
        "loss": stats["loss"],
        "avg_iou": (stats.get("avg_iou0", 0.0) + stats.get("avg_iou1", 0.0)),
        "mAP": float(mAP),
        "val_conf": float(trainer.state.val_conf),
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
