from mobilenet_yolo_tpu.eval.detector import make_predict_fn  # noqa: F401
from mobilenet_yolo_tpu.eval.evaluator import (  # noqa: F401
    Evaluator,
    adjust_confidence,
    evaluate_detection,
)
