from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter  # noqa: F401
from mobilenet_yolo_tpu.data.synthetic import synthetic_batches, synthetic_dataset  # noqa: F401
