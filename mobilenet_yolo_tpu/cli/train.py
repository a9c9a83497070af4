"""Training CLI — same flag surface as the reference train.py:452-485.

    python -m mobilenet_yolo_tpu.cli.train -y <data.yaml> -c <ckptdir>

Extras over the reference: ``--synthetic`` trains on generated data (smoke
runs without a dataset), ``--backbone {mbv2,mbv3,mbv3_macc}`` selects the
detector family, and NNI tuner params merge automatically when running
inside an NNI trial (train.py:487-499 semantics via train/hpo.py).
"""

from __future__ import annotations

import argparse

from mobilenet_yolo_tpu.config import default_data_yaml

import os


def get_params(argv=None):
    parser = argparse.ArgumentParser(description="TPU YOLO Training")
    parser.add_argument("-y", "--data_yaml", dest="data_yaml",
                        default=default_data_yaml(),
                        type=str, metavar="PATH")
    parser.add_argument("--momentum", default=0.9, type=float)
    parser.add_argument("--weight-decay", "--wd", dest="weight_decay",
                        default=0.0004, type=float)
    parser.add_argument("--learning_rate", default=0.0007, type=float)
    parser.add_argument("--warm-up", "--warmup", dest="warm_up", default=[],
                        type=float, nargs="*")
    parser.add_argument("--epochs", default=300, type=int)
    parser.add_argument("--schedule", type=int, nargs="+",
                        default=[100, 170, 240])
    parser.add_argument("--resume", default="", type=str, metavar="PATH")
    parser.add_argument("-c", "--checkpoint", default="checkpoint", type=str)
    parser.add_argument("-o", "--export", default="checkpoint", type=str)
    parser.add_argument("-e", "--evaluate", action="store_true")
    parser.add_argument("--mosaic_num", default=None, type=int, nargs="*")
    parser.add_argument("--ignore_thresh_1", default=None, type=float)
    parser.add_argument("--ignore_thresh_2", default=None, type=float)
    parser.add_argument("--iou_thresh", default=None, type=float)
    parser.add_argument("--expand_scale", default=None, type=float)
    parser.add_argument("--iou_weighting", default=None, type=float)
    parser.add_argument("--backbone", default="mbv2",
                        choices=["mbv2", "mbv3", "mbv3_macc"])
    parser.add_argument("--batch-size", default=None, type=int)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 compute (f32 params + f32 loss numerics);"
                             " ~1.9x faster training on TPU")
    parser.add_argument("--host-normalize", action="store_true",
                        help="normalize images on host (default: ship uint8"
                             " and normalize on device, which is faster)")
    parser.add_argument("--device-pixel-aug", action="store_true",
                        help="run the photometric color jitter on device"
                             " (ops/device_augment.py) instead of the host"
                             " (~6 ms/img of host time on slow hosts); the"
                             " imgaug noise trio stays host-side with"
                             " reference probabilities. Jitter op order +"
                             " factors are host-planned per image (the"
                             " reference's per-image shuffle) and applied"
                             " on device in planned order")
    parser.add_argument("--device-geometry", action="store_true",
                        help="run the WHOLE augmentation pipeline on device:"
                             " expand/crop/flip/mosaic composition + color"
                             " jitter + normalization inside the jitted step"
                             " (data/geometry.py, ops/device_augment.py)."
                             " The host only decodes + stages each source"
                             " (~5x host pipeline speedup on slow hosts)."
                             " Seg datasets: /16 targets rasterize on"
                             " device too")
    parser.add_argument("--mesh", default="auto", type=str,
                        help="device mesh spec: 'auto' (default — data-"
                             "parallel over all visible chips when there"
                             " is more than one), 'none' (single device),"
                             " 'N' (N-way DP) or 'NxM' (N-way DP x M-way"
                             " tensor parallel). Training, eval and"
                             " checkpoints all ride the same mesh; on a"
                             " multi-host pod jax.distributed initializes"
                             " automatically and each host feeds its slice"
                             " of the global batch")
    parser.add_argument("--coordinator", default=None, type=str,
                        help="multi-process coordinator address host:port"
                             " (jax.distributed). TPU pods auto-detect and"
                             " don't need it; set all three --coordinator/"
                             "--num-processes/--process-id for explicit"
                             " launches (e.g. multi-process CPU testing,"
                             " tests/test_multiprocess.py)")
    parser.add_argument("--num-processes", default=None, type=int,
                        help="total process count for jax.distributed")
    parser.add_argument("--process-id", default=None, type=int,
                        help="this process's rank for jax.distributed")
    parser.add_argument("-j", "--num-workers", default=0, type=int,
                        help="input-pipeline worker processes (the"
                             " reference's DataLoader num_workers=4,"
                             " train.py:115-121). 0 = in-process loader"
                             " with a prefetch thread; >0 uses the"
                             " grain-backed loader with N workers")
    parser.add_argument("--stage-size", default=0, type=int,
                        help="staging square for --device-geometry sources;"
                             " 0 (default) = adaptive: stage at each"
                             " batch's output resolution")
    # smoke-mode extras
    parser.add_argument("--synthetic", action="store_true",
                        help="train on synthetic data (no dataset needed)")
    parser.add_argument("--steps-per-epoch", default=8, type=int)
    parser.add_argument("--img-size", default=96, type=int)
    parser.add_argument("--init-from", default="", type=str,
                        help="npz params file (e.g. converted torch weights)")
    parser.add_argument("--profile-steps", default=0, type=int,
                        help="capture a jax.profiler device trace of N "
                             "warm train steps into "
                             "<tensorboard>/profile (0 = off)")
    parser.add_argument("--ema-decay", default=0.0, type=float,
                        help="EMA decay for eval weights (0 = off, "
                             "0.999-0.9999 typical); evaluation and "
                             "best-model selection use the averaged "
                             "params (beyond-reference stabilizer)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize backbone blocks in the "
                             "backward (jax.checkpoint): recompute the "
                             "6x-expanded hidden activations instead of "
                             "storing them — trades step time for "
                             "activation HBM, enabling larger batches "
                             "(PERF.md 'Training throughput')")
    parser.add_argument("--slim-l1", default=0.0, type=float,
                        help="Network Slimming L1 strength on the prunable "
                             "BatchNorm gammas (prune.py; 1e-4..1e-5 "
                             "typical) — train with this, then channel-"
                             "prune with tools/prune.py and fine-tune")
    parser.add_argument("--slim-mode", default="prox",
                        choices=["prox", "loss"],
                        help="how --slim-l1 is applied: 'prox' (default) "
                             "= preconditioned proximal soft-threshold "
                             "outside AdamW (prune.py:slim_prox_update); "
                             "'loss' = plain L1 loss term — measured to "
                             "shrink ALL gammas uniformly under AdamW "
                             "with zero concentration (TRAINING.md §7)")
    return parser.parse_args(argv)


def main(args, report=None):
    # ``report``: optional ReportHook override (train/hpo.py) — local HPO
    # drivers (hpo/random_search.py) record trial reports through it; the
    # default resolves NNI when present, else a no-op
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.parallel import (initialize_distributed,
                                             mesh_from_spec,
                                             warmup_collectives)
    from mobilenet_yolo_tpu.train.hpo import make_report_hook
    from mobilenet_yolo_tpu.train.loop import Trainer, TrainerConfig

    # multi-host pods: wire DCN before the first jax.devices() call (a
    # no-op on a single host without explicit coordinates;
    # docs/TRAINING.md §5 has the pod runbook)
    if initialize_distributed(coordinator=args.coordinator,
                              num_processes=args.num_processes,
                              process_id=args.process_id):
        print(f"jax.distributed: process {jax.process_index()} of "
              f"{jax.process_count()}", flush=True)

    overrides = {k: getattr(args, k) for k in (
        "ignore_thresh_1", "ignore_thresh_2", "iou_thresh", "expand_scale",
        "mosaic_num", "iou_weighting")}

    if args.synthetic:
        model_cfg = {
            "img_w": args.img_size, "img_h": args.img_size,
            "batch_size": args.batch_size or 8,
            "train_img_size": [[args.img_size, args.img_size]],
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
        classes_name = ["background", "c1", "c2", "c3", "c4"]
        segmentation = False
    else:
        cfg = load_config(args.data_yaml, overrides)
        model_cfg = cfg.model
        classes_name = cfg.classes
        segmentation = cfg.segmentation_enabled
        if args.batch_size:
            model_cfg["batch_size"] = args.batch_size
    if args.slim_l1:
        model_cfg["slim_l1"] = args.slim_l1
        model_cfg["slim_mode"] = args.slim_mode
    if args.remat:
        model_cfg["remat"] = True

    import jax.numpy as jnp
    mesh = mesh_from_spec(args.mesh, batch_size=model_cfg["batch_size"]
                          if "batch_size" in model_cfg else None)
    if mesh is not None:
        print(f"device mesh: {dict(mesh.shape)}")
        # multi-host: create the cross-process communicator while all
        # processes are still in lockstep (parallel/mesh.py explains the
        # CPU-backend context deadline); no-op single-process
        warmup_collectives(mesh)
    model = build_model(model_cfg, args.backbone,
                        dtype=jnp.bfloat16 if args.bf16 else None)
    tcfg = TrainerConfig(
        epochs=args.epochs, learning_rate=args.learning_rate,
        weight_decay=args.weight_decay, schedule=tuple(args.schedule),
        warm_up=tuple(int(w) for w in args.warm_up),
        checkpoint_dir=args.checkpoint,
        tensorboard_dir=(os.environ["NNI_OUTPUT_DIR"] + "/tensorboard"
                         if "NNI_OUTPUT_DIR" in os.environ else "tensorboard"),
        nms_top_k=int(model_cfg.get("nms_top_k", 512)),
        ema_decay=args.ema_decay,
        profile_steps=args.profile_steps,
    )
    device_normalize = not args.synthetic and not args.host_normalize
    device_pixel_aug = args.device_pixel_aug and device_normalize
    device_geometry = args.device_geometry and not args.synthetic
    trainer = Trainer(model, model_cfg, classes_name, tcfg,
                      segmentation=segmentation, mesh=mesh,
                      report=report or make_report_hook(),
                      device_normalize=device_normalize,
                      device_pixel_aug=device_pixel_aug,
                      device_geometry=device_geometry)

    if args.init_from:
        from mobilenet_yolo_tpu.tools_io import load_params_npz
        params, batch_stats = load_params_npz(args.init_from)
        trainer.state = trainer.state.replace(params=params,
                                              batch_stats=batch_stats)
    if args.resume:
        # explicit resume source (reference train.py:138-153 takes a file;
        # here a checkpoint directory — its latest step is restored)
        from mobilenet_yolo_tpu.train.checkpoints import CheckpointManager
        src = args.resume if os.path.isdir(args.resume) \
            else os.path.dirname(args.resume)
        # flexible: tolerates TrainState schema drift (e.g. --ema-decay
        # toggled between the saving and resuming runs), like auto-resume
        restored = CheckpointManager(src).restore_latest_flexible(
            trainer.state)
        assert restored is not None, f"no checkpoint found at {args.resume}"
        trainer.state = restored
        trainer.best_acc = float(restored.best_acc)
        print(f"resumed from {src} at epoch {int(restored.epoch)}")
    elif trainer.ckpt.latest_step() is not None:
        trainer.maybe_resume()

    if args.synthetic:
        if args.num_workers > 0:
            print("note: --num-workers is ignored with --synthetic "
                  "(generated batches need no loader workers)")
        from mobilenet_yolo_tpu.data.synthetic import synthetic_batches
        bs = model_cfg["batch_size"]
        epoch_counter = {"n": 0}
        # synthetic batches are deterministic in the seed, so every process
        # of a multi-host run generates the identical GLOBAL batch; the
        # TRAIN loader slices this host's rows (shard_batch assembles the
        # global array from per-process slices) while the EVAL loader keeps
        # the host-complete batch (evaluate_detection feeds it through
        # global_batch — each host's devices pull just their rows)
        p_idx, n_proc = jax.process_index(), jax.process_count()
        if n_proc > 1 and bs % n_proc:
            raise ValueError(f"--batch-size {bs} not divisible by "
                             f"{n_proc} processes")

        def _synthetic_epoch(seed):
            return synthetic_batches(args.steps_per_epoch, bs,
                                     args.img_size,
                                     model_cfg["yolo"]["num_classes"],
                                     seed=seed)

        def train_loader():
            epoch_counter["n"] += 1  # fresh draws every epoch
            local = bs // n_proc
            rows = slice(p_idx * local, (p_idx + 1) * local)
            for images, gt, n_gt in _synthetic_epoch(epoch_counter["n"] % 4):
                yield {"images": images[rows], "gt": gt[rows],
                       "n_gt": n_gt[rows], "count": local}

        def eval_loader():
            for images, gt, n_gt in _synthetic_epoch(epoch_counter["n"] % 4):
                yield {"images": images, "gt": gt, "n_gt": n_gt,
                       "count": bs}
    else:
        import yaml
        with open(args.data_yaml) as f:
            data_cfg = yaml.safe_load(f)
        from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
        from mobilenet_yolo_tpu.data.records import RecordReader
        seg_nc = int(data_cfg.get("segmentation_num_classes", 0))
        train_ds = DetectionDataset(
            RecordReader(data_cfg["trainval_dataset_path"]["lmdb"]),
            phase="train", expand_scale=model_cfg["expand_scale"],
            has_seg=segmentation, seg_num_classes=seg_nc,
            # the host always applies the imgaug noise trio (pixel_noise;
            # geometry mode defers only the additive-noise op's gaussians
            # to the device with host-sampled params) — only the
            # photometric jitter moves wholesale to the device
            apply_noise=True,
            apply_photometric=not (device_pixel_aug or device_geometry))
        # eval records carry seg maps too when segmentation is on, so the
        # evaluator can report seg mIoU alongside detection mAP
        test_ds = DetectionDataset(
            RecordReader(data_cfg["test_dataset_path"]["lmdb"]),
            phase="test", has_seg=segmentation, seg_num_classes=seg_nc)
        norm = model_cfg["normalize"]
        bs = model_cfg["batch_size"]

        # construct ONCE: Loader.__iter__ advances its epoch counter, which
        # reseeds the shuffle/augmentation plan every epoch
        loader_cls = Loader
        loader_kw = {}
        if args.num_workers > 0:
            from mobilenet_yolo_tpu.data.grain_pipeline import GrainLoader
            loader_cls = GrainLoader
            loader_kw = {"num_workers": args.num_workers}
        train_loader_obj = loader_cls(
            train_ds, bs, model_cfg["train_img_size"],
            norm["mean"], norm["std"],
            mosaic_num=model_cfg["mosaic_num"],
            output_uint8=device_normalize,
            device_geometry=device_geometry,
            stage_size=args.stage_size, **loader_kw)
        # shard_by_process=False: the eval loader yields IDENTICAL
        # host-complete batches on every host (shuffle=False) — required
        # by the multi-host eval contract (evaluate_detection feeds them
        # through global_batch so each host's devices pull just their
        # rows): device work is 1x pod-wide and metrics — and the
        # val_conf controller fed by them — stay identical on every host
        eval_loader_obj = Loader(test_ds, bs,
                                 [[model_cfg["img_w"], model_cfg["img_h"]]],
                                 norm["mean"], norm["std"], shuffle=False,
                                 pad_final=False,
                                 output_uint8=device_normalize,
                                 shard_by_process=False)

        def train_loader():
            return train_loader_obj

        def eval_loader():
            return eval_loader_obj

    if args.evaluate:
        mAP, aps = trainer.evaluate(eval_loader())
        print({"mAP": mAP, **aps})
        return mAP

    best = trainer.fit(train_loader, eval_loader)
    print(f"best mAP: {best:.4f}")
    return best


if __name__ == "__main__":
    from mobilenet_yolo_tpu.train.hpo import get_tuner_overrides
    args = get_params()
    for k, v in get_tuner_overrides().items():
        if hasattr(args, k):
            setattr(args, k, v)
    main(args)
