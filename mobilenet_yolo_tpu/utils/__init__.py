from mobilenet_yolo_tpu.utils.meters import AverageMeter  # noqa: F401
from mobilenet_yolo_tpu.utils.logger import Logger  # noqa: F401
