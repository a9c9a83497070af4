"""Offline dataset build CLI — same contract as the reference
``python folder2lmdb.py -d data/voc_data.yaml`` (folder2lmdb.py:356-360):

    python -m mobilenet_yolo_tpu.cli.build_dataset -d <data.yaml>
"""

from __future__ import annotations

import argparse

from mobilenet_yolo_tpu.config import default_data_yaml


from mobilenet_yolo_tpu.data.dataset_builder import build_dataset


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--dataset",
                        default=default_data_yaml(),
                        help="path to the data yaml")
    args = parser.parse_args(argv)
    build_dataset(args.dataset)


if __name__ == "__main__":
    main()
