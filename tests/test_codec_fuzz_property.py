"""Decoder-robustness fuzz (r11, the ADVICE r10 defect class): every
dependency-free codec must either decode bytes or raise ValueError —
never leak struct.error / IndexError / zlib.error / numpy exceptions,
and never crash the Arrow worker.  Random bytes and single-byte
mutations of VALID payloads both count (the mutation case is where the
JPEG marker-walk bug lived)."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_snapshotter_spark.operators.multimodal import (
    decode_avi,
    decode_bmp,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_ifv_avi,
    encode_jpeg,
    encode_mjpeg_avi,
    encode_png,
    encode_wav,
)

DECODERS = [decode_bmp, decode_png, decode_wav, decode_avi, decode_jpeg]


def _golden_payloads():
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    gray = np.full((8, 8), 130, dtype=np.uint8)
    frames = np.stack([np.full((3, 6, 3), v, dtype=np.uint8)
                       for v in (10, 200)])
    return [
        ("bmp", encode_bmp(px), decode_bmp),
        ("png", encode_png(px), decode_png),
        ("wav", encode_wav(np.arange(-50, 50, dtype=np.int16)
                   .reshape(50, 2), 8000),
         decode_wav),
        ("avi", encode_avi(frames, 40000), decode_avi),
        ("jpeg", encode_jpeg(gray), decode_jpeg),
        ("mjpeg", encode_mjpeg_avi(np.stack([gray, gray]), 40000),
         decode_avi),
        ("ifv", encode_ifv_avi(np.stack([gray, gray + 2, gray + 6]),
                               40000, gop=2),
         decode_avi),
    ]


@settings(max_examples=400, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_random_bytes_raise_valueerror_only(payload):
    for dec in DECODERS:
        try:
            dec(payload)
        except ValueError:
            pass  # the documented contract
        # any other exception type fails the test by propagating


@settings(max_examples=500, deadline=None)
@given(st.data())
def test_mutated_golden_payloads_never_leak_foreign_errors(data):
    """Flip one byte anywhere in a valid payload: the decoder either
    still decodes (the mutation hit pixel/sample data) or raises
    ValueError — zlib errors from PNG inflate are wrapped, struct
    errors from header walks are guarded."""
    goldens = _golden_payloads()
    name, payload, dec = goldens[data.draw(
        st.integers(0, len(goldens) - 1), label="codec")]
    pos = data.draw(st.integers(0, len(payload) - 1), label="pos")
    val = data.draw(st.integers(0, 255), label="byte")
    mutated = payload[:pos] + bytes([val]) + payload[pos + 1:]
    try:
        dec(mutated)
    except ValueError:
        pass
    except zlib.error:
        pytest.fail(f"{name}: unwrapped zlib.error at byte {pos}")


def test_golden_payloads_decode_clean():
    for name, payload, dec in _golden_payloads():
        assert dec(payload) is not None, name


def test_allocation_bomb_headers_raise_valueerror():
    """r12 fuzz regression, pinned deterministically: a corrupted
    header requesting absurd output geometry (avih dims, JPEG SOF
    dims) must raise ValueError BEFORE any allocation — never leak
    MemoryError through the parse contract."""
    import struct

    from hbase_snapshotter_spark.operators.multimodal import encode_jpeg

    gray = np.full((8, 8), 130, dtype=np.uint8)
    frames = np.stack([np.full((3, 6, 3), v, dtype=np.uint8)
                       for v in (10, 200)])
    avi = encode_avi(frames, 40000)
    # blow up the avih width field (offset of 8th uint32 in avih body)
    at = avi.find(b"avih") + 8 + 8 * 4
    bombed = avi[:at] + struct.pack("<I", 0x70000000) + avi[at + 4:]
    with pytest.raises(ValueError, match="implausible AVI geometry"):
        decode_avi(bombed)

    jp = encode_jpeg(gray)
    sof = jp.find(b"\xFF\xC0")
    assert sof > 0  # dims live at SOF body offset 1 (h) and 3 (w)
    bombed_j = jp[:sof + 5] + struct.pack(">HH", 0xFFF0, 0xFFF0) \
        + jp[sof + 9:]
    with pytest.raises(ValueError, match="implausible JPEG geometry"):
        decode_jpeg(bombed_j)
