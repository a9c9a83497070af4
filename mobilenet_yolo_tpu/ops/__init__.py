"""Pure-function numerics: boxes, anchors, decode, target assignment, losses,
NMS and VOC mAP. Everything here is jittable (except the host-side AP
accumulator) and shape-static, designed for XLA/TPU."""

from mobilenet_yolo_tpu.ops.boxes import (  # noqa: F401
    area,
    box_ciou,
    box_giou,
    cxcywh_to_corners,
    corners_to_cxcywh,
    pairwise_iou,
    shape_iou,
)
from mobilenet_yolo_tpu.ops.sigmoid_st import sigmoid_st  # noqa: F401
from mobilenet_yolo_tpu.ops.anchors import anchor_maps, grid_xy  # noqa: F401
from mobilenet_yolo_tpu.ops.decode import (  # noqa: F401
    decode_boxes_train,
    decode_predictions,
    reshape_head,
)
from mobilenet_yolo_tpu.ops.assign import build_targets  # noqa: F401
from mobilenet_yolo_tpu.ops.losses import (  # noqa: F401
    seg_loss,
    weighted_mse_loss,
    yolo_head_loss,
)
from mobilenet_yolo_tpu.ops.nms import batched_nms  # noqa: F401
from mobilenet_yolo_tpu.ops.ap import calculate_mAP  # noqa: F401
from mobilenet_yolo_tpu.ops.coco_ap import calculate_coco_map  # noqa: F401
