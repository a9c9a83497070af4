"""Golden-parity tests against the actual reference implementation.

These import the reference's torch modules from /root/reference (read-only)
and compare numerics directly — the strongest available evidence that the
TPU rebuild reproduces the reference's behavior. Skipped when the reference
tree isn't mounted. Missing third-party deps of the reference (progress,
torchvision — imported but unused on the tested paths) are stubbed.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    # stub deps the reference imports but doesn't use on these paths
    if "progress" not in sys.modules:
        progress = types.ModuleType("progress")
        bar = types.ModuleType("progress.bar")
        bar.Bar = object
        bar.IncrementalBar = object
        progress.bar = bar
        sys.modules["progress"] = progress
        sys.modules["progress.bar"] = bar
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(nms=None)
        sys.modules["torchvision"] = tv
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.yolo_loss as ref_yolo_loss
    import models.mobilenetv2 as ref_mobilenetv2
    import utils.eval_mAP as ref_eval_map
    return types.SimpleNamespace(
        torch=torch, yolo_loss=ref_yolo_loss, mobilenetv2=ref_mobilenetv2,
        eval_map=ref_eval_map)


ANCHORS_PX = [[143, 265], [153, 121], [280, 279],
              [20, 37], [49, 94], [73, 201]]


def _rand_head(rng, B, H, W, A, C):
    return rng.normal(0, 1.0, (B, H, W, A * (5 + C))).astype(np.float32)


def _rand_targets(rng, B, C, max_n=5):
    out = []
    for _ in range(B):
        n = int(rng.integers(0, max_n))
        rows = np.zeros((n, 5), np.float32)
        for t in range(n):
            w = rng.uniform(0.08, 0.5)
            h = rng.uniform(0.08, 0.5)
            rows[t] = [rng.integers(1, C + 1), rng.uniform(w / 2, 1 - w / 2),
                       rng.uniform(h / 2, 1 - h / 2), w, h]
        out.append(rows)
    return out


def test_yolo_loss_matches_reference(ref_modules, rng):
    """Training loss + running metrics vs the reference YOLOLoss."""
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.data.synthetic import pad_labels
    from mobilenet_yolo_tpu.ops.losses import yolo_head_loss

    torch = ref_modules.torch
    B, H, W, A, C = 3, 6, 6, 3, 20
    img = 192  # stride 32 head on a 192px image
    for head_idx, mask in ((0, [0, 1, 2]), (1, [3, 4, 5])):
        ignore_thresh = [0.6076333316652263, 0.5623606200028424][head_idx]
        iou_thresh = 0.5497280113447018
        iou_weighting = 0.021830872589525777

        head = _rand_head(rng, B, H, W, A, C)
        targets = _rand_targets(rng, B, C)

        # --- reference ---
        ref_loss_mod = ref_modules.yolo_loss.YOLOLoss(
            ANCHORS_PX, mask, C, [img, img], ignore_thresh, iou_thresh,
            iou_weighting=iou_weighting)
        # reference layout: (B, A*(5+C), H, W) with (A, 5+C) channel order
        t_in = torch.from_numpy(
            head.reshape(B, H, W, A, 5 + C).transpose(0, 3, 4, 1, 2)
            .reshape(B, A * (5 + C), H, W).copy())
        t_tgts = [torch.from_numpy(t) for t in targets]
        with torch.no_grad():
            ref_out = ref_loss_mod(t_in, t_tgts)
        ref_loss, ref_recall, ref_iou, ref_obj, ref_noobj, ref_cls, ref_cnt = \
            [float(v) for v in ref_out]

        # --- ours ---
        anchors_norm = jnp.asarray(np.asarray(ANCHORS_PX, np.float32) / img)
        gt, n_gt = pad_labels(targets, 8)
        got = yolo_head_loss(
            jnp.asarray(head), jnp.asarray(gt), jnp.asarray(n_gt),
            anchors_norm, mask, C, ignore_thresh, iou_thresh, iou_weighting)

        np.testing.assert_allclose(float(got.loss), ref_loss, rtol=2e-4,
                                   err_msg=f"head {head_idx} loss")
        m = got.metrics
        np.testing.assert_allclose(float(m["recall"]), ref_recall, atol=1e-5)
        np.testing.assert_allclose(float(m["avg_iou"]), ref_iou, atol=1e-4)
        np.testing.assert_allclose(float(m["obj"]), ref_obj, atol=1e-4)
        np.testing.assert_allclose(float(m["no_obj"]), ref_noobj, atol=1e-4)
        np.testing.assert_allclose(float(m["cls_score"]), ref_cls, atol=1e-4)
        np.testing.assert_allclose(float(m["count"]), ref_cnt, atol=1e-6)


def test_yolo_loss_gradients_match_reference(ref_modules, rng):
    """d(loss)/d(head logits) vs torch autograd through the reference loss
    — validates the straight-through sigmoid and every gradient path."""
    import jax
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.data.synthetic import pad_labels
    from mobilenet_yolo_tpu.ops.losses import yolo_head_loss

    torch = ref_modules.torch
    B, H, W, A, C = 2, 5, 5, 3, 20
    img = 160
    mask = [3, 4, 5]
    ignore_thresh, iou_thresh, iou_w = 0.5624, 0.5497, 0.0218

    head = _rand_head(rng, B, H, W, A, C)
    targets = _rand_targets(rng, B, C, max_n=4)

    ref_loss_mod = ref_modules.yolo_loss.YOLOLoss(
        ANCHORS_PX, mask, C, [img, img], ignore_thresh, iou_thresh,
        iou_weighting=iou_w)
    t_in = torch.from_numpy(
        head.reshape(B, H, W, A, 5 + C).transpose(0, 3, 4, 1, 2)
        .reshape(B, A * (5 + C), H, W).copy())
    t_in.requires_grad_(True)
    ref_out = ref_loss_mod(t_in, [torch.from_numpy(t) for t in targets])
    ref_out[0].backward()
    ref_grad = (t_in.grad.numpy()
                .reshape(B, A, 5 + C, H, W).transpose(0, 3, 4, 1, 2)
                .reshape(B, H, W, A * (5 + C)))

    anchors_norm = jnp.asarray(np.asarray(ANCHORS_PX, np.float32) / img)
    gt, n_gt = pad_labels(targets, 8)

    def loss_fn(h):
        return yolo_head_loss(h, jnp.asarray(gt), jnp.asarray(n_gt),
                              anchors_norm, mask, C, ignore_thresh,
                              iou_thresh, iou_w).loss

    my_grad = np.asarray(jax.grad(loss_fn)(jnp.asarray(head)))
    np.testing.assert_allclose(my_grad, ref_grad, rtol=5e-3, atol=1e-6)


def test_seg_loss_matches_reference(ref_modules, rng):
    import models.seg_loss as ref_seg_loss
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.ops.losses import seg_loss

    torch = ref_modules.torch
    logits = rng.normal(0, 1, (2, 6, 6, 3)).astype(np.float32)
    truth = (rng.random((2, 6, 6, 3)) < 0.3).astype(np.float32)

    ref_mod = ref_seg_loss.SegLoss(3)
    # reference: logits NCHW, truth NHWC
    t_logits = torch.from_numpy(logits.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        ref_loss, ref_obj, ref_noobj = ref_mod(t_logits,
                                               torch.from_numpy(truth))

    loss, obj, noobj = seg_loss(jnp.asarray(logits), jnp.asarray(truth))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(obj), float(ref_obj), rtol=1e-4)
    np.testing.assert_allclose(float(noobj), float(ref_noobj), rtol=1e-4)


def test_eval_decode_matches_reference(ref_modules, rng):
    """get_pred_boxes decode + val_conf filter vs our decode_predictions."""
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.ops.decode import decode_predictions, reshape_head

    torch = ref_modules.torch
    B, H, W, A, C = 2, 5, 5, 3, 20
    img = 160
    mask = [0, 1, 2]
    val_conf = 0.25
    head = _rand_head(rng, B, H, W, A, C)

    ref_loss_mod = ref_modules.yolo_loss.YOLOLoss(
        ANCHORS_PX, mask, C, [img, img], 0.6, 0.55, val_conf=val_conf)
    t_in = torch.from_numpy(
        head.reshape(B, H, W, A, 5 + C).transpose(0, 3, 4, 1, 2)
        .reshape(B, A * (5 + C), H, W).copy())
    with torch.no_grad():
        ref_boxes = ref_loss_mod(t_in, None)  # list of (n, 7) per image

    anchors_norm = jnp.asarray(
        np.asarray(ANCHORS_PX, np.float32)[np.asarray(mask)] / img)
    flat = np.asarray(decode_predictions(
        reshape_head(jnp.asarray(head), A), anchors_norm))
    for b in range(B):
        mine = flat[b][flat[b][:, 4] > val_conf]
        ref = ref_boxes[b].numpy()
        assert mine.shape == ref.shape
        # reference flattens (A, H, W); ours (H, W, A) — compare as sets
        order_m = np.lexsort(mine[:, :5].T)
        order_r = np.lexsort(ref[:, :5].T)
        np.testing.assert_allclose(mine[order_m], ref[order_r],
                                   rtol=1e-4, atol=1e-5)


def test_mobilenetv2_conversion_matches_reference(ref_modules, rng):
    """Random-init torch MobileNetV2 -> converted flax model -> identical
    eval outputs. Validates graph parity AND the weight converter."""
    import jax
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.models import MobileNetV2
    from tools.convert_torch import convert, mbv2_backbone_mapping

    torch = ref_modules.torch
    torch.manual_seed(0)  # test-order-independent weights
    net = ref_modules.mobilenetv2.MobileNetV2()
    net.eval()
    # randomize BN stats so folding/naming errors can't hide
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    mapping = {(k[0], "backbone", *k[1:]): v
               for k, v in mbv2_backbone_mapping("").items()}
    params, stats = convert(sd, mapping)

    x = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref1, ref2 = net(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))

    model = MobileNetV2()
    variables = {
        "params": jax.tree.map(jnp.asarray, params["backbone"]),
        "batch_stats": jax.tree.map(jnp.asarray, stats["backbone"]),
    }
    c4, c5 = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(c4), ref1.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c5), ref2.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def _oracle_torch_nms(boxes, scores, iou_threshold):
    """Greedy hard NMS, torchvision-compatible (indices by desc score)."""
    import torch
    b = boxes.numpy()
    s = scores.numpy()
    order = np.argsort(-s, kind="stable")
    keep = []
    suppressed = np.zeros(len(b), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        for j in order:
            if suppressed[j] or j == i:
                continue
            lower = np.maximum(b[i, :2], b[j, :2])
            upper = np.minimum(b[i, 2:], b[j, 2:])
            wh = np.clip(upper - lower, 0, None)
            inter = wh[0] * wh[1]
            area_i = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
            area_j = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            if inter / (area_i + area_j - inter) > iou_threshold:
                suppressed[j] = True
    return torch.as_tensor(keep, dtype=torch.long)


def test_full_detector_matches_reference(ref_modules, rng, monkeypatch):
    """End-to-end detector parity: reference yolo graph (random weights) vs
    our MBv2YOLO with converted weights — identical post-NMS detections.

    Covers backbone+neck+heads graph parity, the full-model weight
    converter, decode, the val_conf gate and class-aware NMS."""
    import jax
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from mobilenet_yolo_tpu.models import MBv2YOLO
    from tools.convert_torch import convert, mbv2_yolo_mapping

    torch = ref_modules.torch
    torch.manual_seed(0)  # test-order-independent weights
    sys.modules["torchvision"].ops.nms = _oracle_torch_nms
    # the reference downloads ImageNet weights at construction; zero-egress
    # here, so feed it an empty checkpoint (keeps its random init)
    import models.mobilenetv2 as ref_mnv2
    monkeypatch.setattr(ref_mnv2, "load_state_dict_from_url",
                        lambda *a, **k: {})
    import importlib
    import models.mbv2_yolo as ref_mbv2_yolo
    importlib.reload(ref_mbv2_yolo)

    config = {
        "img_w": 160, "img_h": 160, "iou_weighting": 0.0218,
        "yolo": {"num_classes": 20, "num_anchors": 3,
                 "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
                 "anchors": ANCHORS_PX, "mask": [[0, 1, 2], [3, 4, 5]]},
    }
    net = ref_mbv2_yolo.yolo(config=config)
    net.eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    val_conf = 0.05
    for hl in net.yolo_losses:
        hl.val_conf = val_conf

    x = rng.normal(0, 0.8, (2, 160, 160, 3)).astype(np.float32)
    with torch.no_grad():
        ref_dets = net(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = convert(sd, mbv2_yolo_mapping())
    model = MBv2YOLO(num_classes=20, num_anchors=3)
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, stats)}
    # random weights pass ~all 375 candidates/image through the val_conf
    # gate; top_k must cover them for exact set-parity with the ragged
    # reference (trained models sit far below the 256 default)
    predict = make_predict_fn(model, config, top_k=384)
    dets, keep = predict(variables, jnp.asarray(x), jnp.float32(val_conf))
    dets = np.asarray(dets)
    keep = np.asarray(keep)

    for b in range(2):
        mine = dets[b][keep[b]]
        ref = ref_dets[b].numpy()
        # hard NMS makes boundary IoU ties (==0.45 within float eps) flip
        # whole detections; with random weights a handful of ties are
        # expected, so require a >=99% set match rather than exact equality
        assert abs(mine.shape[0] - ref.shape[0]) <= 2, (mine.shape, ref.shape)
        unmatched = 0
        for row in mine:
            diffs = np.abs(ref - row).max(axis=1) if len(ref) else [1]
            if np.min(diffs) > 1e-3:
                unmatched += 1
        assert unmatched <= max(2, int(0.01 * len(mine))), (
            f"{unmatched}/{len(mine)} detections have no reference match")


def test_mbv3_backbone_conversion_matches_reference(ref_modules, rng):
    import jax
    import jax.numpy as jnp
    import models.mobilenetv3 as ref_mnv3
    from mobilenet_yolo_tpu.models import MobileNetV3Large
    from tools.convert_torch import convert, mbv3_backbone_mapping

    torch = ref_modules.torch
    torch.manual_seed(0)  # test-order-independent weights
    net = ref_mnv3.MobileNetV3_Large()
    net.eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    mapping = {(k[0], "backbone", *k[1:]): v
               for k, v in mbv3_backbone_mapping("").items()}
    params, stats = convert(sd, mapping)

    x = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref1, ref2 = net(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    model = MobileNetV3Large()
    variables = {"params": jax.tree.map(jnp.asarray, params["backbone"]),
                 "batch_stats": jax.tree.map(jnp.asarray, stats["backbone"])}
    c4, c5 = model.apply(variables, jnp.asarray(x), train=False)
    # SE gating multiplications amplify XLA-vs-torch fusion-order noise
    # through 15 blocks (observed ~6e-4 on ~1% of elements); a mis-wired
    # weight would produce O(1) errors everywhere, so assert a loose
    # element tolerance plus a tight mean error
    for got, ref in ((c4, ref1), (c5, ref2)):
        ref_np = ref.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), ref_np,
                                   rtol=5e-2, atol=5e-3)
        assert float(np.abs(np.asarray(got) - ref_np).mean()) < 1e-4


def test_map_matches_reference(ref_modules, rng):
    """VOC 11-point mAP vs the reference eval_mAP on a random det set."""
    torch = ref_modules.torch
    from mobilenet_yolo_tpu.ops.ap import calculate_mAP

    classes = ["background", "a", "b", "c"]
    n_imgs = 6
    det_boxes, det_labels, det_scores = [], [], []
    true_boxes, true_labels, true_diff = [], [], []
    for _ in range(n_imgs):
        n_t = int(rng.integers(1, 4))
        tb = rng.uniform(0, 0.6, (n_t, 4)).astype(np.float32)
        tb[:, 2:] = tb[:, :2] + rng.uniform(0.1, 0.4, (n_t, 2))
        true_boxes.append(tb)
        true_labels.append(rng.integers(1, 4, n_t).astype(np.int64))
        true_diff.append((rng.random(n_t) < 0.2).astype(np.float32))
        n_d = int(rng.integers(0, 6))
        db = rng.uniform(0, 0.6, (n_d, 4)).astype(np.float32)
        db[:, 2:] = db[:, :2] + rng.uniform(0.1, 0.4, (n_d, 2))
        # half the detections mirror a GT box (near-hits)
        for d in range(n_d // 2):
            db[d] = tb[d % n_t] + rng.normal(0, 0.02, 4).astype(np.float32)
        det_boxes.append(db)
        det_labels.append(rng.integers(1, 4, n_d).astype(np.int64))
        det_scores.append(rng.random(n_d).astype(np.float32))

    ref_aps, ref_map, ref_tp, ref_fp = ref_modules.eval_map.calculate_mAP(
        [torch.from_numpy(b) for b in det_boxes],
        [torch.from_numpy(l) for l in det_labels],
        [torch.from_numpy(s) for s in det_scores],
        [torch.from_numpy(b) for b in true_boxes],
        [torch.from_numpy(l) for l in true_labels],
        [torch.from_numpy(d) for d in true_diff],
        list(classes),
    )
    aps, mAP, tp, fp = calculate_mAP(det_boxes, det_labels, det_scores,
                                     true_boxes, true_labels, true_diff,
                                     classes)
    np.testing.assert_allclose(mAP, ref_map, atol=1e-6)
    for c in ("a", "b", "c"):
        np.testing.assert_allclose(aps[c], ref_aps[c], atol=1e-6)
        assert tp[c] == float(ref_tp[c])
        assert fp[c] == float(ref_fp[c])


def test_export_deploys_into_reference(ref_modules, rng, monkeypatch,
                                       tmp_path):
    """JAX -> torch deployment parity (the reverse of the converter test
    above): a flax-initialized MBv2-YOLO exported with
    tools/convert_torch.export_state_dict loads into the EXECUTED
    reference module (strict state_dict load) and produces identical
    post-NMS detections — and the --wrap-module artifact round-trips
    through the reference's own inference loader (inference.py:127-148)."""
    import jax
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from mobilenet_yolo_tpu.models import MBv2YOLO
    from tools.convert_torch import (export_state_dict, mbv2_yolo_mapping,
                                     save_reference_module)

    torch = ref_modules.torch
    sys.modules["torchvision"].ops.nms = _oracle_torch_nms
    import models.mobilenetv2 as ref_mnv2
    monkeypatch.setattr(ref_mnv2, "load_state_dict_from_url",
                        lambda *a, **k: {})
    import importlib
    import models.mbv2_yolo as ref_mbv2_yolo
    importlib.reload(ref_mbv2_yolo)

    config = {
        "img_w": 160, "img_h": 160, "iou_weighting": 0.0218,
        "yolo": {"num_classes": 20, "num_anchors": 3,
                 "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
                 "anchors": ANCHORS_PX, "mask": [[0, 1, 2], [3, 4, 5]]},
    }
    val_conf = 0.05
    model = MBv2YOLO(num_classes=20, num_anchors=3)
    x = rng.normal(0, 0.8, (2, 160, 160, 3)).astype(np.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(3), jnp.asarray(x),
                           train=False))()
    # non-trivial BN stats so the export covers batch_stats too
    variables = jax.tree.map(np.asarray, variables)
    for blk in variables["batch_stats"]["backbone"].values():
        for bn in blk.values():
            if isinstance(bn, dict) and "mean" in bn:
                bn["mean"] = rng.normal(0, 0.05, bn["mean"].shape).astype(
                    np.float32)
                bn["var"] = rng.uniform(0.8, 1.2, bn["var"].shape).astype(
                    np.float32)

    sd = export_state_dict(variables["params"], variables["batch_stats"],
                           mbv2_yolo_mapping())
    module_path = str(tmp_path / "model_best.pth.tar")
    save_reference_module(module_path, sd, config, val_conf=val_conf)

    # load exactly like the reference's inference.py load_model
    net = torch.load(module_path, weights_only=False)
    net.eval()
    with torch.no_grad():
        ref_dets = net(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))

    predict = make_predict_fn(model, config, top_k=384)
    dets, keep = predict({"params": jax.tree.map(jnp.asarray,
                                                 variables["params"]),
                          "batch_stats": jax.tree.map(
                              jnp.asarray, variables["batch_stats"])},
                         jnp.asarray(x), jnp.float32(val_conf))
    dets, keep = np.asarray(dets), np.asarray(keep)

    for b in range(2):
        mine = dets[b][keep[b]]
        ref = ref_dets[b].numpy()
        assert abs(mine.shape[0] - ref.shape[0]) <= 2, (mine.shape,
                                                        ref.shape)
        unmatched = 0
        for row in mine:
            diffs = np.abs(ref - row).max(axis=1) if len(ref) else [1]
            if np.min(diffs) > 1e-3:
                unmatched += 1
        assert unmatched <= max(2, int(0.01 * len(mine))), (
            f"{unmatched}/{len(mine)} exported detections have no "
            "reference match")
