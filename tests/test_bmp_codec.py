"""Stdlib BMP (BI_RGB DIB) codec: exact round trips for the 8-bit
gray-palette and 24-bit BGR encoder paths, wild-variant reads the
encoder never emits (32-bit BGRX, top-down rows, partial palettes),
honest unsupported-feature errors, and image_decoder dispatch parity
with the other lossless containers."""

import struct

import numpy as np
import pytest

from postgresml_spark.operators.multimodal import (
    ahash_reference,
    bmp_decode,
    bmp_decoder,
    bmp_encode,
    gif_encode,
    image_decoder,
    png_encode,
)


def _img(h=16, w=16, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)


@pytest.mark.parametrize("shape", [(8, 8), (17, 31), (1, 1), (33, 3)])
def test_gray_round_trip_exact(shape):
    g = _img(*shape)
    out = bmp_decoder(bmp_encode(g), {})
    assert out.dtype == np.uint8 and np.array_equal(out, g)


def test_rgb_round_trip_exact_with_row_padding():
    rgb = np.random.default_rng(1).integers(0, 256, (13, 7, 3)).astype(np.uint8)
    assert np.array_equal(bmp_decode(bmp_encode(rgb)), rgb)  # stride 21 -> 24


def test_top_down_and_32bit_reads():
    # hand-build variants our encoder never writes
    rgb = np.random.default_rng(2).integers(0, 256, (5, 6, 3)).astype(np.uint8)
    h, w = rgb.shape[:2]
    # 32-bit BGRX top-down
    rows = np.zeros((h, w, 4), dtype=np.uint8)
    rows[:, :, :3] = rgb[:, :, ::-1]
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, rows.nbytes, 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 54 + rows.nbytes, 0, 0, 54)
    assert np.array_equal(bmp_decode(head + info + rows.tobytes()), rgb)


def test_partial_palette_maps_to_rgb():
    # 4-entry palette: indices decode through the table, not as gray
    pal = np.array([[0, 0, 255, 0], [0, 255, 0, 0], [255, 0, 0, 0], [9, 8, 7, 0]],
                   dtype=np.uint8)  # BGRA rows
    idx = np.array([[0, 1, 2, 3]], dtype=np.uint8)
    stride = 4  # w=4 already aligned
    info = struct.pack("<IiiHHIIiiII", 40, 4, 1, 1, 8, 0, stride, 0, 0, 4, 0)
    head = struct.pack("<2sIHHI", b"BM", 54 + 16 + stride, 0, 0, 54 + 16)
    data = head + info + pal.tobytes() + idx.tobytes()
    out = bmp_decode(data)
    assert out.shape == (1, 4, 3)
    assert out[0, 0].tolist() == [255, 0, 0]  # BGR -> RGB flip
    assert out[0, 3].tolist() == [7, 8, 9]


def test_unsupported_features_error_clearly():
    g = _img(4, 4)
    data = bytearray(bmp_encode(g))
    data[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        bmp_decode(bytes(data))
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"XX" + bytes(60))


def test_image_decoder_dispatch_and_lossless_hash_parity():
    img = _img(16, 16, seed=3)
    via_bmp = image_decoder(bmp_encode(img), {})
    assert np.array_equal(via_bmp, img)
    # all three lossless containers agree hash-exactly
    h_bmp = ahash_reference(via_bmp)
    assert h_bmp == ahash_reference(image_decoder(png_encode(img), {}))
    assert h_bmp == ahash_reference(image_decoder(gif_encode(img), {}))


def test_8bit_header_sizes_are_spec_exact():
    """ADVICE r6 (low): bfSize must equal the real file length (the
    1024-byte palette counted once, via bfOffBits) and biSizeImage must
    be the pixel rows only — strict external parsers check both."""
    import struct

    from postgresml_spark.operators.multimodal import bmp_encode

    a = np.arange(35, dtype=np.uint8).reshape(5, 7)
    data = bmp_encode(a)
    bf_size = struct.unpack("<I", data[2:6])[0]
    off = struct.unpack("<I", data[10:14])[0]
    bi_size_image = struct.unpack("<I", data[34:38])[0]
    stride = (7 + 3) & ~3
    assert off == 14 + 40 + 1024
    assert bf_size == len(data) == off + 5 * stride
    assert bi_size_image == 5 * stride
    # 24-bit branch: same invariants (no palette)
    rgb = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    d2 = bmp_encode(rgb)
    assert struct.unpack("<I", d2[2:6])[0] == len(d2)
    assert struct.unpack("<I", d2[34:38])[0] == len(d2) - 54
