"""Dependency-free TensorBoard event writer: crc vectors, wire format and
file round-trip (parsed with an independent hand-rolled reader)."""

import struct

import numpy as np

from mobilenet_yolo_tpu.utils.tb_writer import (
    EventFileWriter,
    crc32c,
    masked_crc32c,
)


def test_crc32c_known_vectors():
    # standard Castagnoli check values
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def _read_records(path):
    """Independent TFRecord frame parser; verifies both crcs per record."""
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (len_crc,) = struct.unpack("<I", f.read(4))
            assert len_crc == masked_crc32c(header)
            payload = f.read(length)
            (data_crc,) = struct.unpack("<I", f.read(4))
            assert data_crc == masked_crc32c(payload)
            records.append(payload)
    return records


def _parse_fields(buf):
    """proto wire-format -> {field_num: [raw values]} (one message level)."""
    fields = {}
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        num, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:  # 64-bit
            (val,) = struct.unpack("<d", buf[i:i + 8])
            i += 8
        elif wire == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            val = buf[i:i + ln]
            i += ln
        elif wire == 5:  # 32-bit
            (val,) = struct.unpack("<f", buf[i:i + 4])
            i += 4
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        fields.setdefault(num, []).append(val)
    return fields


def test_event_file_round_trip(tmp_path):
    logdir = str(tmp_path / "tb")
    clock_val = [1000.0]
    with EventFileWriter(logdir, clock=lambda: clock_val[0]) as w:
        w.scalar("Loss/train", 0.25, 1)
        clock_val[0] = 1001.0
        w.scalar("Accuracy/test", 0.75, 2)
        path = w.path

    records = _read_records(path)
    assert len(records) == 3

    # record 0: file_version
    ev0 = _parse_fields(records[0])
    assert ev0[3][0] == b"brain.Event:2"
    assert ev0[1][0] == 1000.0

    # record 1: Loss/train scalar at step 1
    ev1 = _parse_fields(records[1])
    assert ev1[2][0] == 1
    value1 = _parse_fields(_parse_fields(ev1[5][0])[1][0])
    assert value1[1][0] == b"Loss/train"
    np.testing.assert_allclose(value1[2][0], 0.25)

    # record 2: Accuracy/test at step 2, later wall time
    ev2 = _parse_fields(records[2])
    assert ev2[2][0] == 2 and ev2[1][0] == 1001.0
    value2 = _parse_fields(_parse_fields(ev2[5][0])[1][0])
    assert value2[1][0] == b"Accuracy/test"
    np.testing.assert_allclose(value2[2][0], 0.75)


def test_trainer_tb_writer_emits_file(tmp_path):
    from mobilenet_yolo_tpu.train.loop import TensorBoardWriter

    logdir = str(tmp_path / "tb2")
    tbw = TensorBoardWriter(logdir)
    tbw.scalar("Loss/train", 1.5, 0)
    tbw.close()
    recs = _read_records(tbw._writer.path)
    assert len(recs) == 2  # version + one scalar
