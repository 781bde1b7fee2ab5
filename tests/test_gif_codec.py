"""Stdlib GIF87a/89a codec: exact round trips (GIF is lossless for
<=256-color content) across interlace/animation/palette settings, LZW
edge cases (dictionary reset at 4096, KwKwK), wild-stream features the
encoder never emits (transparency, frame offsets, disposal, local color
tables), magic-byte dispatch through image_decoder, and the animation
path feeding video_fingerprints."""

import numpy as np
import pytest

from postgresml_spark.operators.multimodal import (
    _lzw_compress,
    _lzw_decompress,
    ahash_reference,
    gif_decode,
    gif_decoder,
    gif_encode,
    gif_encode_animated,
    gif_frames,
    gif_video_decoder,
    image_decoder,
    png_encode,
)


def _img(h=32, w=48, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)


# -- LZW core ---------------------------------------------------------------


@pytest.mark.parametrize(
    "seq,min_code",
    [
        (np.zeros(10, np.uint8), 2),
        (np.arange(256, dtype=np.uint8), 8),
        (np.tile(np.arange(2, dtype=np.uint8), 5000), 2),  # KwKwK pressure
        (np.array([7], np.uint8), 8),
    ],
)
def test_lzw_round_trip(seq, min_code):
    assert np.array_equal(
        _lzw_decompress(_lzw_compress(seq, min_code), min_code, len(seq)), seq
    )


def test_lzw_dictionary_reset_at_4096():
    # 70k random bytes force the 4096-entry table to fill -> CLEAR/reset
    seq = np.random.default_rng(0).integers(0, 256, 70_000).astype(np.uint8)
    enc = _lzw_compress(seq, 8)
    assert np.array_equal(_lzw_decompress(enc, 8, len(seq)), seq)


def test_lzw_clips_at_declared_length():
    # streams longer than the declared pixel count are clipped, not an
    # error (viewer semantics) — both code-aligned and mid-expansion
    for seq in (
        np.arange(100, dtype=np.uint8),
        np.tile(np.arange(2, dtype=np.uint8), 5000),
    ):
        mc = 8 if seq.max() > 3 else 2
        enc = _lzw_compress(seq, mc)
        assert np.array_equal(_lzw_decompress(enc, mc, 50), seq[:50])


# -- still images -----------------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("shape", [(8, 8), (17, 31), (1, 1), (64, 64)])
def test_gray_round_trip_exact(interlace, shape):
    img = _img(*shape)
    out = gif_decoder(gif_encode(img, interlace=interlace), {})
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def test_rgb_round_trip_exact_and_palette_overflow():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    img = pal[rng.integers(0, 200, (20, 30))]
    assert np.array_equal(gif_decode(gif_encode(img)), img)
    with pytest.raises(ValueError, match="palette overflow"):
        gif_encode(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8))


def test_image_decoder_dispatches_gif_and_matches_png_hash():
    img = _img(16, 16, seed=9)
    via_gif = image_decoder(gif_encode(img), {})
    via_png = image_decoder(png_encode(img), {})
    assert np.array_equal(via_gif, img)
    # lossless containers must agree bit-exactly, hence hash-exactly
    assert ahash_reference(via_gif) == ahash_reference(via_png)


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"NOTGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="unrecognized image container"):
        image_decoder(b"\x00\x01\x02\x03garbage", {})


# -- animation --------------------------------------------------------------


def test_animated_round_trip_and_video_contract():
    frames = np.random.default_rng(2).integers(0, 256, (5, 16, 24)).astype(np.uint8)
    data = gif_encode_animated(frames, delay_ms=40, loop=2)
    out = gif_video_decoder(data, {})
    assert out.shape == (5, 16, 24)
    assert np.array_equal(out, frames)


def test_animated_interlaced_round_trip():
    frames = np.random.default_rng(4).integers(0, 256, (3, 33, 9)).astype(np.uint8)
    out = gif_video_decoder(gif_encode_animated(frames, interlace=True), {})
    assert np.array_equal(out, frames)


# -- wild-stream features our encoder never emits ---------------------------


def _wild_gif() -> tuple[bytes, np.ndarray, np.ndarray]:
    """Hand-build a 2-frame GIF using transparency, a frame offset, a
    LOCAL color table and disposal=2 — the features real scraped GIFs
    use and gif_encode doesn't. Returns (bytes, frame0, frame1) as
    expected composited RGB canvases."""
    import struct

    w, h = 6, 4
    gct = np.zeros((4, 3), dtype=np.uint8)
    gct[0] = (10, 20, 30)   # background / frame-0 fill
    gct[1] = (200, 0, 0)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x81, 0, 0)  # GCT, 2-bit... size=2<<1=4
    out += gct.tobytes()
    # frame 0: full-frame, all color 1, disposal=2 (restore bg after)
    out += b"\x21\xf9\x04" + struct.pack("<BHBB", 0x08, 5, 0, 0)
    idx0 = np.ones((h, w), dtype=np.uint8)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out += bytes([2]) + _subblocks(_lzw_compress(idx0, 2))
    # frame 1: 2x2 patch at (2,1) with a LOCAL table, color 0 transparent
    lct = np.zeros((4, 3), dtype=np.uint8)
    lct[1] = (0, 255, 0)
    out += b"\x21\xf9\x04" + struct.pack("<BHBB", 0x01, 5, 0, 0)  # transp idx 0
    out += struct.pack("<BHHHHB", 0x2C, 2, 1, 2, 2, 0x80 | 1)  # LCT size 4
    out += lct.tobytes()
    idx1 = np.array([[1, 0], [0, 1]], dtype=np.uint8)
    out += bytes([2]) + _subblocks(_lzw_compress(idx1, 2))
    out += b"\x3b"
    f0 = np.broadcast_to(gct[1], (h, w, 3)).copy()
    f1 = np.broadcast_to(gct[0], (h, w, 3)).copy()  # disposal-2 restored bg
    f1[1, 2] = (0, 255, 0)
    f1[2, 3] = (0, 255, 0)
    return bytes(out), f0, f1


def _subblocks(payload: bytes) -> bytes:
    from postgresml_spark.operators.multimodal import _gif_subblocks

    return _gif_subblocks(payload)


def test_wild_gif_transparency_offsets_local_table_disposal():
    data, f0, f1 = _wild_gif()
    frames = gif_frames(data)
    assert frames.shape == (2, 4, 6, 3)
    assert np.array_equal(frames[0], f0)
    assert np.array_equal(frames[1], f1)


def test_gif_animation_drives_video_fingerprints(spark):
    from postgresml_spark.operators.multimodal import video_fingerprints

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (6, 16, 16)).astype(np.uint8)
    data = gif_encode_animated(frames, delay_ms=50)
    assets = spark.createDataFrame(
        [(1, "video", bytearray(data), (16, 16, 300, "gif"))],
        "asset_id long, kind string, data binary, "
        "meta struct<width:int,height:int,duration_ms:int,format:string>",
    )
    rows = video_fingerprints(assets, decoder=gif_video_decoder).collect()
    assert len(rows) == 6  # one frame-hash row per composited frame
    direct = gif_video_decoder(data, {})

    def fp64(bits: str) -> int:
        fp = (int(bits[:32], 2) << 32) | int(bits[32:], 2)
        return fp - (1 << 64) if fp >= 1 << 63 else fp

    want = {t: fp64(ahash_reference(direct[t])) for t in range(6)}
    got = {r["t"]: r["fp"] for r in rows}
    assert got == want


def test_disposal2_with_small_local_palette_restores_global_bg():
    """ADVICE r6 (medium): disposal==2 must restore the painted region
    from the GLOBAL color table's background entry — a frame whose
    LOCAL palette is smaller than the global bg index used to
    IndexError (wild GIFs commonly combine local palettes with
    disposal 2)."""
    import struct

    w, h = 4, 3
    gct = np.zeros((4, 3), dtype=np.uint8)
    gct[3] = (9, 99, 199)   # background entry, index PAST any local table
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x81, 3, 0)  # GCT size 4, bg=3
    out += gct.tobytes()
    # frame 0: full-frame with a 2-entry LOCAL table, disposal=2
    lct = np.array([[0, 0, 0], [255, 255, 0]], dtype=np.uint8)
    out += b"\x21\xf9\x04" + struct.pack("<BHBB", 0x08, 5, 0, 0)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x80 | 0)  # LCT size 2
    out += lct.tobytes()
    out += bytes([2]) + _subblocks(
        _lzw_compress(np.ones((h, w), dtype=np.uint8), 2)
    )
    # frame 1: single pixel so the restored canvas is observable
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 1, 1, 0)
    out += bytes([2]) + _subblocks(
        _lzw_compress(np.zeros((1, 1), dtype=np.uint8), 2)
    )
    out += b"\x3b"
    frames = gif_frames(bytes(out))
    assert frames.shape == (2, h, w, 3)
    assert np.array_equal(frames[0], np.broadcast_to(lct[1], (h, w, 3)))
    # after disposal=2 the region is gct[3], then (0,0) repainted gct[0]
    want = np.broadcast_to(gct[3], (h, w, 3)).copy()
    want[0, 0] = gct[0]
    assert np.array_equal(frames[1], want)


def test_animated_gray_frames_three_pixels_wide():
    """ADVICE r6 (low): an (n,h,3) stack of GRAYSCALE frames that
    happen to be 3 px wide must not be misread as RGB — round-trips
    losslessly through the identity gray palette."""
    frames = np.random.default_rng(5).integers(0, 256, (4, 5, 3)).astype(np.uint8)
    data = gif_encode_animated(frames, delay_ms=20)
    got = gif_frames(data)
    assert got.shape == (4, 5, 3, 3)
    assert np.array_equal(got[..., 0], frames)
    assert np.array_equal(got[..., 1], frames)


def test_image_decoder_raw_meta_wins_over_bm_magic():
    """ADVICE r6 (low): a declared format='raw' frame whose first two
    bytes happen to be 'BM' must route to raw_decoder, not the BMP
    sniffer."""
    frame = np.full((2, 4), 7, dtype=np.uint8)
    frame[0, 0], frame[0, 1] = 0x42, 0x4D  # 'B', 'M'
    got = image_decoder(
        frame.tobytes(), {"format": "raw", "height": 2, "width": 4}
    )
    assert np.array_equal(got, frame)
