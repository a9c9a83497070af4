"""Pallas TPU kernels for the hot post-processing ops."""

from mobilenet_yolo_tpu.kernels.pallas_nms import pallas_suppress  # noqa: F401
