import numpy as np
import pytest

from mobilenet_yolo_tpu.data.records import (
    RecordReader,
    RecordWriter,
    decode_record,
    encode_record,
    _load_native,
)


def _roundtrip(tmp_path, force_python_read):
    d = str(tmp_path / "shard")
    labels = np.asarray([[1, 0.5, 0.5, 0.2, 0.3], [4, 0.1, 0.2, 0.05, 0.08]],
                        np.float32)
    with RecordWriter(d) as w:
        w.append_record(b"jpegbytes0", labels)
        w.append_record(b"jpegbytes1", labels[:1], seg_bytes=b"pngbytes")
        w.append_record(b"", np.zeros((0, 5), np.float32))

    r = RecordReader(d, force_python=force_python_read)
    assert len(r) == 3
    rec0 = r[0]
    assert rec0.image_bytes == b"jpegbytes0"
    np.testing.assert_allclose(rec0.labels[:, :5], labels)
    np.testing.assert_allclose(rec0.labels[:, 5], 0.0)  # 5-col in -> diff=0
    assert rec0.seg_bytes is None
    rec1 = r[1]
    assert rec1.image_bytes == b"jpegbytes1"
    assert rec1.seg_bytes == b"pngbytes"
    rec2 = r[2]
    assert rec2.image_bytes == b""
    assert rec2.labels.shape == (0, 6)
    assert r.meta["num_records"] == 3
    r.close()


def test_roundtrip_python_reader(tmp_path):
    _roundtrip(tmp_path, force_python_read=True)


def test_roundtrip_native_reader(tmp_path):
    if _load_native() is None:
        pytest.skip("native recordstore unavailable (no g++)")
    _roundtrip(tmp_path, force_python_read=False)


def test_native_and_python_agree(tmp_path):
    if _load_native() is None:
        pytest.skip("native recordstore unavailable")
    d = str(tmp_path / "shard")
    rng = np.random.default_rng(0)
    blobs = [rng.bytes(int(rng.integers(0, 5000))) for _ in range(32)]
    with RecordWriter(d) as w:
        for blob in blobs:
            w.append(encode_record(blob, np.zeros((0, 5), np.float32)))
    rn = RecordReader(d, force_python=False)
    rp = RecordReader(d, force_python=True)
    for i in range(32):
        assert rn.get_bytes(i) == rp.get_bytes(i)
        assert decode_record(rn.get_bytes(i)).image_bytes == blobs[i]


def test_encode_decode_record():
    labels = np.asarray([[2, 0.3, 0.4, 0.1, 0.2]], np.float32)
    rec = decode_record(encode_record(b"abc", labels, b"seg"))
    assert rec.image_bytes == b"abc"
    assert rec.seg_bytes == b"seg"
    np.testing.assert_allclose(rec.labels[:, :5], labels)


def test_encode_decode_difficult_flag():
    labels = np.asarray([[2, 0.3, 0.4, 0.1, 0.2, 1.0],
                         [1, 0.6, 0.6, 0.2, 0.2, 0.0]], np.float32)
    rec = decode_record(encode_record(b"abc", labels))
    np.testing.assert_allclose(rec.labels, labels)


def test_v1_record_decodes_with_zero_difficulty():
    """5-col v1 shards (magic 0x59524543) still decode, difficult=0."""
    import struct
    labels = np.asarray([[2, 0.3, 0.4, 0.1, 0.2]], np.float32)
    header = struct.pack("<IIQQ", 0x59524543, 1, 3, 0)
    buf = header + labels.tobytes() + b"abc"
    rec = decode_record(buf)
    assert rec.image_bytes == b"abc"
    assert rec.labels.shape == (1, 6)
    np.testing.assert_allclose(rec.labels[:, :5], labels)
    np.testing.assert_allclose(rec.labels[:, 5], 0.0)


def test_bad_magic_raises():
    with pytest.raises(ValueError):
        decode_record(b"\x00" * 64)
