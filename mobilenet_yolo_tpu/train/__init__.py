from mobilenet_yolo_tpu.train.schedule import learning_rate_for_epoch  # noqa: F401
from mobilenet_yolo_tpu.train.state import TrainState, create_train_state  # noqa: F401
from mobilenet_yolo_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
