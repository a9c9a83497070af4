"""Channel-pruning CLI (Network Slimming; prune.py has the algorithm).

Implements the reference's unchecked roadmap item (reference
README.md:56 "Under construction: Pruning"): rank the prunable channels
by BatchNorm |gamma| (ideally after training with ``--slim-l1``), cut the
global bottom ``--ratio`` fraction, and emit everything a fine-tune run
needs:

    <out>/params.npz   — the sliced weights (cli/train.py --init-from)
    <out>/model.yaml   — the model config + a ``prune:`` block carrying
                         the slimmed widths (models.build_model)
    <out>/data.yaml    — copy of the data yaml re-pointed at model.yaml
                         (only when -y was given)
    <out>/summary.json — per-site kept/total and parameter counts

Usage:
    python tools/prune.py -y <data.yaml> -c <ckptdir|params.npz> \
        --ratio 0.3 --out pruned/
    python -m mobilenet_yolo_tpu.cli.train -y pruned/data.yaml \
        --init-from pruned/params.npz -c pruned_ck   # fine-tune
"""

from __future__ import annotations

import argparse
import copy
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="YOLO channel pruning (Network Slimming)")
    parser.add_argument("-y", "--data_yaml", dest="data_yaml", default=None)
    parser.add_argument("--model-yaml", default=None,
                        help="model config path (alternative to -y when "
                             "there is no data yaml, e.g. synthetic runs)")
    parser.add_argument("-c", "--checkpoint", required=True,
                        help="orbax checkpoint dir or params .npz")
    parser.add_argument("--backbone", default="mbv2",
                        choices=["mbv2", "mbv3", "mbv3_macc"])
    parser.add_argument("--ratio", default=0.3, type=float,
                        help="global fraction of prunable channels to cut")
    parser.add_argument("--min-keep", default=8, type=int)
    parser.add_argument("--round-to", default=8, type=int,
                        help="round kept counts up to this multiple "
                             "(TPU lane alignment; 8 default, 128 strict)")
    parser.add_argument("--no-head", action="store_true",
                        help="leave the 1280-ch head conv unpruned")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--dry-run", action="store_true",
                        help="print the plan, write nothing")
    args = parser.parse_args(argv)
    if bool(args.data_yaml) == bool(args.model_yaml):
        parser.error("give exactly one of -y/--data_yaml or --model-yaml")

    import jax
    import jax.numpy as jnp
    import yaml
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))

    from mobilenet_yolo_tpu.cli.infer import load_variables
    from mobilenet_yolo_tpu.config import load_config, load_yaml
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.prune import (apply_prune, param_count,
                                          plan_prune, prunable_gammas)
    from mobilenet_yolo_tpu.tools_io import save_params_npz

    if args.data_yaml:
        cfg = load_config(args.data_yaml)
        model_cfg = cfg.model
    else:
        model_cfg = load_yaml(args.model_yaml)
    if model_cfg.get("prune"):
        raise SystemExit("the model config already carries a 'prune:' "
                         "block — iterative pruning of an already-pruned "
                         "model is not supported (re-prune the original)")

    model = build_model(model_cfg, args.backbone)
    size = int(model_cfg["img_w"])
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = load_variables(model, args.checkpoint, x)
    params, batch_stats = variables["params"], variables["batch_stats"]

    keep = plan_prune(params, args.ratio, min_keep=args.min_keep,
                      round_to=args.round_to,
                      include_head=not args.no_head)
    gammas = prunable_gammas(params, include_head=not args.no_head)

    rows = []
    for site in keep:
        rows.append({"site": site, "kept": int(keep[site].size),
                     "total": int(gammas[site].size)})
        print(f"{site:>12}: keep {rows[-1]['kept']:4d} / "
              f"{rows[-1]['total']:4d}")

    # concentration diagnostic: how much of the total |gamma| mass sits in
    # the channels being cut. Slimming-trained models (--slim-l1) should
    # show a near-zero bottom mass — the L1 term's whole job — while a
    # plain model's gammas are spread (and the cut loses real capacity,
    # the measured 0.619 -> 0.022 pre-fine-tune collapse in TRAINING.md §7)
    import numpy as np
    allg = np.sort(np.concatenate(
        [np.abs(np.asarray(g)).ravel() for g in gammas.values()]))
    cut = int(allg.size * args.ratio)
    bottom_mass = float(allg[:cut].sum() / max(allg.sum(), 1e-12))
    gamma_stats = {
        "channels": int(allg.size),
        "cut_fraction": args.ratio,
        "bottom_mass_fraction": bottom_mass,
        "p10": float(np.percentile(allg, 10)),
        "median": float(np.median(allg)),
        "p90": float(np.percentile(allg, 90)),
    }
    print(f"gamma concentration: bottom {args.ratio:.0%} of {allg.size} "
          f"channels hold {100 * bottom_mass:.2f}% of total |gamma| mass "
          f"(p10 {gamma_stats['p10']:.4f}, median "
          f"{gamma_stats['median']:.4f}, p90 {gamma_stats['p90']:.4f})")

    new_params, new_stats, prune_cfg = apply_prune(params, batch_stats, keep)
    before, after = param_count(params), param_count(new_params)
    print(f"params: {before:,} -> {after:,} "
          f"({100.0 * (1 - after / before):.1f}% cut)")

    # sanity: the slim graph must init to exactly the sliced shapes
    pruned_cfg = copy.deepcopy(model_cfg)
    pruned_cfg["prune"] = prune_cfg
    pruned_model = build_model(pruned_cfg, args.backbone)
    shapes = jax.eval_shape(
        lambda: pruned_model.init(jax.random.PRNGKey(0), x, train=False))
    expect, treedef_e = jax.tree_util.tree_flatten_with_path(shapes["params"])
    got, treedef_g = jax.tree.flatten(new_params)
    assert treedef_e == treedef_g, \
        f"param tree mismatch after pruning:\n{treedef_e}\nvs\n{treedef_g}"
    mismatches = [
        "/".join(str(getattr(p, "key", p)) for p in path)
        for (path, a), b in zip(expect, got) if a.shape != b.shape]
    assert not mismatches, f"shape mismatch after pruning: {mismatches}"

    if args.dry_run:
        print("dry run: nothing written")
        return

    os.makedirs(args.out, exist_ok=True)
    save_params_npz(os.path.join(args.out, "params.npz"),
                    new_params, new_stats)
    model_yaml_out = os.path.join(args.out, "model.yaml")
    with open(model_yaml_out, "w") as f:
        yaml.safe_dump(pruned_cfg, f, sort_keys=False)
    if args.data_yaml:
        data_cfg = load_yaml(args.data_yaml)
        data_cfg["model_config_path"] = os.path.abspath(model_yaml_out)
        with open(os.path.join(args.out, "data.yaml"), "w") as f:
            yaml.safe_dump(data_cfg, f, sort_keys=False)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({"sites": rows, "params_before": before,
                   "params_after": after, "ratio": args.ratio,
                   "gamma_stats": gamma_stats}, f, indent=2)
    print(f"wrote {args.out}/{{params.npz, model.yaml"
          + (", data.yaml" if args.data_yaml else "") + ", summary.json}")


if __name__ == "__main__":
    main()
