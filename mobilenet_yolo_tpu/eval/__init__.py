from mobilenet_yolo_tpu.eval.detector import make_predict_fn  # noqa: F401
from mobilenet_yolo_tpu.eval.evaluator import Evaluator, adjust_confidence  # noqa: F401
