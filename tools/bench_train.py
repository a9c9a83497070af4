"""Training-step benchmark + backward-attack experiments (PERF.md).

The serving side got round after round of optimization attention; this
tool gives the TRAINING side the same treatment. It measures, on the real
chip with the chained timer (utils/profiling.py — measure twice, trust
the second, PERF.md methodology):

  * the component chain  fwd(train BN) -> +loss -> +backward -> full step
    (each stage's delta is attributable; overhead cancels in deltas)
  * training MFU from XLA's own cost analysis (compiled.cost_analysis()
    flops, not a hand-count)
  * the experiments VERDICT-round-3 asked for, each a measured win or a
    recorded negative:
      --remat      rematerialize the inverted-residual blocks
                   (flax nn.remat; trades recompute FLOPs for activation
                   HBM traffic — the backward re-reads every 6x-expanded
                   hidden activation otherwise)
      --dtype bf16 mixed precision (bf16 compute, f32 params/loss)
      --no-donate  keep the input state buffers (donation is the default;
                   quantifies what donating the ~5M-param state saves)

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_train.py \
        [--batch-size 128] [--img-size 352] [--dtype f32|bf16] [--remat]
        [--no-donate] [--iters 24] [--json]
"""

from __future__ import annotations

import argparse
import json
import time


def build_component_programs(model, loss_fn, gt, n_gt):
    """The jitted component-chain stages (fwd / fwd+loss / fwd+loss+bwd).

    Factored out of main() so tests/test_bench_tools.py can assert —
    via XLA's own cost analysis — that the backward stage really
    contains a backward: every stage must RETURN what it claims to
    compute or XLA dead-code-eliminates it (returning only the loss
    from the value_and_grad program deleted the whole backward and
    silently mis-attributed its ~40-110 ms to the update stage).
    """
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(lambda p, bs, im: model.apply(
        {"params": p, "batch_stats": bs}, im, train=True,
        mutable=["batch_stats"])[0])
    fwd_loss = jax.jit(lambda p, bs, im: loss_fn(p, bs, im, gt, n_gt)[0])

    def _loss_and_grad_checksum(p, bs, im):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, bs, im, gt, n_gt)
        gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return loss, gsum

    return fwd, fwd_loss, jax.jit(_loss_and_grad_checksum)


def compiled_flops(jitted, *args) -> float:
    """XLA cost-analysis flop count of a jitted program (0 if absent)."""
    compiled = jitted.lower(*args).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    return float(cost.get("flops", 0.0)) if cost else 0.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--img-size", type=int, default=352)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--no-donate", action="store_true")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--step-only", action="store_true",
                    help="time only the full train step (for large-batch "
                         "memory-limit probes; skips the component chain "
                         "and MFU)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.train.state import create_train_state
    from mobilenet_yolo_tpu.train.step import make_loss_fn, make_train_step

    cfg = load_config("mobilenet_yolo_tpu/configs/voc_data.yaml")
    model_cfg = dict(cfg.model)
    if args.remat:
        model_cfg["remat"] = True
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    model = build_model(model_cfg, dtype=dtype)

    b, s = args.batch_size, args.img_size
    rng = np.random.default_rng(0)
    # ONE random image tiled across the batch, not b fresh ones: the step
    # timing is content-independent, but the one-off H2D upload is not —
    # the dev-relay compresses the stream (PERF.md "dev-environment
    # caveat"), so fresh incompressible normals move at 25-60 MB/s and a
    # batch-512 f32 staging upload alone would blow a 25-minute timeout,
    # while the tiled (compressible) batch uploads in seconds.
    images = jnp.asarray(
        np.broadcast_to(rng.normal(0, 1, (1, s, s, 3)), (b, s, s, 3)),
        jnp.float32)
    gt = np.zeros((b, 30, 5), np.float32)
    gt[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    gt = jnp.asarray(gt)
    n_gt = jnp.ones((b,), jnp.int32)

    state, tx = create_train_state(model, jax.random.PRNGKey(0), (s, s))

    loss_fn = make_loss_fn(model, model_cfg)

    # ---- component chain (each jitted separately; deltas attribute cost;
    # see build_component_programs for the DCE trap the construction avoids)
    fwd, fwd_loss, fwd_bwd = build_component_programs(model, loss_fn,
                                                      gt, n_gt)
    step = make_train_step(model, model_cfg, tx, donate=not args.no_donate)

    def chain_time(fn, *fargs, iters=args.iters, warmup=3):
        """Chained timer: the image input carries a dependency on the
        previous output scalar; one fetch bounds the chain. Run twice,
        report the second (PERF.md warm-up addendum)."""
        @jax.jit
        def add_dep(im, out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            return im + (0.0 * jnp.ravel(leaf)[0]).astype(im.dtype)

        def run(n):
            y = images
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*fargs, y)
                y = add_dep(images, out)
            _ = float(jnp.ravel(y)[0])
            return (time.perf_counter() - t0) / n

        run(warmup)
        run(max(iters // 2, 2))       # first timed run absorbs one-time work
        return run(iters)

    results = {}
    if not args.step_only:
        t_fwd = chain_time(fwd, state.params, state.batch_stats)
        results["fwd_ms"] = t_fwd * 1e3
        t_fl = chain_time(fwd_loss, state.params, state.batch_stats)
        results["fwd_loss_ms"] = t_fl * 1e3
        t_fb = chain_time(fwd_bwd, state.params, state.batch_stats)
        results["fwd_loss_bwd_ms"] = t_fb * 1e3
        results["bwd_delta_ms"] = (t_fb - t_fl) * 1e3

    # full step: the chained timer must NOT reuse a donated state, so
    # thread the state through the chain (its own output feeds the next
    # call) and chain the image dependency off the metrics
    @jax.jit
    def add_dep_m(im, metrics):
        return im + (0.0 * metrics["loss"]).astype(im.dtype)

    def run_steps(n, st):
        y = images
        t0 = time.perf_counter()
        for _ in range(n):
            st, metrics = step(st, y, gt, n_gt)
            y = add_dep_m(images, metrics)
        _ = float(jnp.ravel(y)[0])
        return (time.perf_counter() - t0) / n, st

    _, st = run_steps(3, state)
    _, st = run_steps(max(args.iters // 2, 2), st)
    t_step, st = run_steps(args.iters, st)
    results["step_ms"] = t_step * 1e3
    if not args.step_only:
        results["update_delta_ms"] = (t_step - t_fb) * 1e3
    results["img_per_s"] = b / t_step

    # ---- MFU from XLA's own flop count of the fwd+loss+bwd program
    if not args.step_only:
        flops = compiled_flops(fwd_bwd, state.params, state.batch_stats,
                               images)
        # v5e peak: 197 TFLOP/s bf16, 98.5 TFLOP/s fp32 (public spec)
        peak = 197e12 if args.dtype == "bf16" else 98.5e12
        if flops:
            results["bwd_chain_gflops"] = flops / 1e9
            results["training_mfu_pct"] = 100.0 * (flops / t_fb) / peak

    label = (f"batch {b} {s}x{s} {args.dtype}"
             + (" remat" if args.remat else "")
             + (" no-donate" if args.no_donate else ""))
    if args.json:
        print(json.dumps({"label": label, **{k: round(v, 3)
                                             for k, v in results.items()}}))
    else:
        print(f"== {label} ==")
        for k, v in results.items():
            print(f"  {k:>20}: {v:9.3f}")


if __name__ == "__main__":
    main()
