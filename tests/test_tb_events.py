"""Pure-python TensorBoard scalar writer (utils/tb_events.py).

The event files must parse with an independent TFRecord/protobuf decoder
(hand-rolled here), and the RunLogger must fall back to this writer when
torch is blocked — closing the reference's TB sink
(``utils/tensorboard.py:129``) on torch-free hosts.
"""

import struct
import sys

import pytest

from ssl4polyp_tpu.utils.tb_events import ScalarEventWriter, _masked_crc


def _read_records(path):
    data = path.read_bytes()
    pos, records = 0, []
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        (len_crc,) = struct.unpack_from("<I", data, pos + 8)
        assert len_crc == _masked_crc(data[pos : pos + 8])
        payload = data[pos + 12 : pos + 12 + length]
        (payload_crc,) = struct.unpack_from("<I", data, pos + 12 + length)
        assert payload_crc == _masked_crc(payload)
        records.append(payload)
        pos += 12 + length + 4
    return records


def _decode_fields(buf):
    """Minimal protobuf field splitter: {field_number: [raw values]}."""
    fields = {}
    pos = 0
    while pos < len(buf):
        key, pos = _decode_varint(buf, pos)
        number, wire = key >> 3, key & 7
        if wire == 0:
            value, pos = _decode_varint(buf, pos)
        elif wire == 1:
            value = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wire == 2:
            length, pos = _decode_varint(buf, pos)
            value = buf[pos : pos + length]
            pos += length
        elif wire == 5:
            value = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        else:  # pragma: no cover
            raise AssertionError(f"wire type {wire}")
        fields.setdefault(number, []).append(value)
    return fields


def _decode_varint(buf, pos):
    result = shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def test_event_file_roundtrip(tmp_path):
    writer = ScalarEventWriter(tmp_path / "tb")
    writer.add_scalar("train/loss", 0.5, 1)
    writer.add_scalar("train/loss", 0.25, 2)
    writer.add_scalar("val/auroc", 0.975, 2)
    writer.close()

    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 4  # file_version + 3 scalars

    header = _decode_fields(records[0])
    assert header[3][0] == b"brain.Event:2"

    scalars = []
    for rec in records[1:]:
        event = _decode_fields(rec)
        step = event.get(2, [0])[0]
        summary = _decode_fields(event[5][0])
        value_msg = _decode_fields(summary[1][0])
        tag = value_msg[1][0].decode("utf-8")
        scalars.append((tag, round(value_msg[2][0], 6), step))
    assert scalars == [
        ("train/loss", 0.5, 1),
        ("train/loss", 0.25, 2),
        ("val/auroc", 0.975, 2),
    ]


def test_crc32c_known_vectors():
    # CRC-32C ("Castagnoli") reference vectors (RFC 3720 / kernel tests):
    # crc32c("123456789") == 0xE3069283, before masking.
    from ssl4polyp_tpu.utils import tb_events

    assert tb_events._crc32c(b"123456789") == 0xE3069283
    assert tb_events._crc32c(b"") == 0


def test_runlogger_falls_back_without_torch(tmp_path, monkeypatch):
    saved = {
        name: sys.modules.pop(name)
        for name in list(sys.modules)
        if name == "torch" or name.startswith("torch.")
    }
    sys.modules["torch"] = None  # import torch -> ImportError
    try:
        from ssl4polyp_tpu.utils.logging import RunLogger

        logger = RunLogger(tmp_path, "run", enable_tensorboard=True,
                           echo=False, primary=True)
        assert isinstance(logger.tb, ScalarEventWriter)
        logger.scalar("loss", 1.0, 0)
        logger.close()
        files = list((tmp_path / "tb" / "run").glob("events.out.tfevents.*"))
        assert files and len(_read_records(files[0])) == 2
    finally:
        sys.modules.pop("torch", None)
        sys.modules.update(saved)
