"""Guards for the measurement tools themselves (tools/bench_train.py).

The round-4 tree shipped a benchmark whose "backward" stage XLA had
dead-code-eliminated (it returned only the loss scalar, so the whole
value_and_grad program collapsed to a forward — measured bwd delta:
-0.1 ms), silently mis-attributing ~40-110 ms of backward to the update
stage and computing MFU over a forward-only flop count. These tests pin
the fix STRUCTURALLY, via XLA's own cost analysis rather than timing
(timing on the 1-core CI box is noise): the compiled fwd+loss+bwd
program must carry at least 2x the flops of the compiled fwd+loss
program. A re-introduced DCE bug makes the ratio ~1.0.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from mobilenet_yolo_tpu.models import MBv2YOLO
from mobilenet_yolo_tpu.train.step import make_loss_fn

from tools.bench_train import build_component_programs, compiled_flops

CFG = {
    "img_w": 96, "img_h": 96, "iou_weighting": 0.02,
    "yolo": {
        "num_classes": 4, "num_anchors": 3,
        "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
        "anchors": [[34, 47], [48, 40], [70, 70],
                    [10, 12], [15, 25], [24, 18]],
        "mask": [[0, 1, 2], [3, 4, 5]],
    },
}


def test_backward_stage_not_dead_code_eliminated():
    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (2, 96, 96, 3)), jnp.float32)
    gt = np.zeros((2, 4, 5), np.float32)
    gt[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    gt, n_gt = jnp.asarray(gt), jnp.ones((2,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    p, bs = variables["params"], variables["batch_stats"]

    loss_fn = make_loss_fn(model, CFG)
    fwd, fwd_loss, fwd_bwd = build_component_programs(model, loss_fn,
                                                      gt, n_gt)

    f_fwd = compiled_flops(fwd, p, bs, images)
    f_loss = compiled_flops(fwd_loss, p, bs, images)
    f_bwd = compiled_flops(fwd_bwd, p, bs, images)
    assert f_loss > 0, "cost_analysis returned no flops on this backend"
    # forward stage must include the loss-relevant heads (not DCE'd away)
    assert f_fwd > 0.5 * f_loss
    # the backward roughly doubles-to-triples the chain; DCE gives ~1.0x
    assert f_bwd >= 2.0 * f_loss, (
        f"fwd+loss+bwd flops {f_bwd:.3e} < 2x fwd+loss {f_loss:.3e} — "
        "the backward has been dead-code-eliminated again")


def test_step_only_smoke_emits_sane_json(capsys):
    from tools import bench_train

    bench_train.main(["--batch-size", "1", "--img-size", "96",
                      "--iters", "2", "--step-only", "--json"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["step_ms"] > 0 and rec["img_per_s"] > 0
    assert "fwd_ms" not in rec  # step-only skips the component chain
