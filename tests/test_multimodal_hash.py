"""Perceptual image hashing + near-dup over multimodal assets.

The hash math (aHash 8x8 mean-threshold, pHash 32x32 DCT-II low-band
median-threshold) runs on DECODED pixel arrays, so with `raw_decoder`
(a real decoder for format='raw' byte layouts, no codec needed) the
whole pipeline is real in this image — only compressed-codec decode
stays behind `strict_decoder`.

Covers: python-reference parity, brightness-shift invariance, banded
pair enumeration vs brute force, and raw_decoder round-trip through
resize().
"""

from __future__ import annotations

import numpy as np
import pytest

from postgresml_spark.operators.multimodal import (
    ASSET_SCHEMA,
    ahash_reference,
    image_hash,
    image_near_dup_pairs,
    phash_reference,
    raw_decoder,
    resize,
)


def _asset(asset_id: int, arr: np.ndarray) -> dict:
    h, w = arr.shape
    return {
        "asset_id": asset_id,
        "kind": "image",
        "data": arr.astype(np.uint8).tobytes(),
        "meta": {"width": w, "height": h, "duration_ms": None, "format": "raw"},
    }


def _gradient(h: int = 16, w: int = 16, tilt: float = 1.0) -> np.ndarray:
    # max value 200 so the +10 brightness-shift twin (asset 4) never
    # clips — exact invariance is part of the contract under test
    ys, xs = np.mgrid[0:h, 0:w]
    return ((ys * tilt + xs) * 200 / (tilt * (h - 1) + (w - 1))).astype(np.uint8)


@pytest.fixture(scope="module")
def assets(spark):
    base = _gradient()
    near = base.copy()
    near[0, 0:3] ^= 0xFF  # flip a few pixels: perceptually the same
    far = 255 - base  # inverted: maximally different
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    rows = [
        _asset(0, base),
        _asset(1, near),
        _asset(2, far),
        _asset(3, noise),
        _asset(4, (base.astype(int) + 10).clip(0, 255).astype(np.uint8)),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_raw_decoder_roundtrip(assets):
    out = resize(assets, 8, 8, decoder=raw_decoder).collect()
    assert len(out) == 5
    for r in out:
        arr = raw_decoder(bytes(r["data"]), r["meta"].asDict())
        assert arr.shape == (8, 8)


def test_raw_decoder_size_mismatch():
    with pytest.raises(ValueError, match="raw asset"):
        raw_decoder(b"\x00" * 10, {"height": 8, "width": 8})


@pytest.mark.parametrize("method", ["ahash", "phash"])
def test_hash_python_reference_parity(assets, method):
    got = {
        r["asset_id"]: r["sh"]
        for r in image_hash(assets, decoder=raw_decoder, method=method).collect()
    }
    ref_fn = ahash_reference if method == "ahash" else phash_reference
    for row in assets.collect():
        arr = raw_decoder(bytes(row["data"]), row["meta"].asDict())
        assert got[row["asset_id"]] == ref_fn(arr), f"asset {row['asset_id']}"
    for sh in got.values():
        assert len(sh) == 64 and set(sh) <= {"0", "1"}


@pytest.mark.parametrize("method", ["ahash", "phash"])
def test_brightness_shift_invariance(assets, method):
    """+10 uniform brightness moves the mean/median threshold equally →
    identical perceptual hash (asset 4 vs asset 0)."""
    got = {
        r["asset_id"]: r["sh"]
        for r in image_hash(assets, decoder=raw_decoder, method=method).collect()
    }
    assert got[4] == got[0]


def _brute_pairs(assets_df, method, max_hamming):
    ref_fn = ahash_reference if method == "ahash" else phash_reference
    hs = {
        r["asset_id"]: ref_fn(raw_decoder(bytes(r["data"]), r["meta"].asDict()))
        for r in assets_df.collect()
    }
    ids = sorted(hs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = sum(x != y for x, y in zip(hs[a], hs[b]))
            if d <= max_hamming:
                out.add((a, b, d))
    return out


@pytest.mark.parametrize("method", ["ahash", "phash"])
def test_near_dup_pairs_match_brute_force(assets, method):
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_dup_pairs(
            assets, decoder=raw_decoder, method=method, max_hamming=8
        ).collect()
    }
    assert got == _brute_pairs(assets, method, 8)
    # the perceptual contract: brightness twin pairs with the base,
    # the inverted image doesn't
    flat = {(a, b) for a, b, _ in got}
    assert (0, 4) in flat
    assert (0, 2) not in flat
    if method == "ahash":
        # 3 flipped pixels touch ≤2 of the 64 sampled positions
        assert (0, 1) in flat


def test_near_dup_plan_is_banded(assets):
    plan = image_near_dup_pairs(
        assets, decoder=raw_decoder, max_hamming=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -- stdlib PNG codec -------------------------------------------------------


def _filtered_png(arr, ftype):
    """Hand-build a PNG (grayscale (h,w) or RGB/RGBA (h,w,3|4)) whose
    every scanline uses `ftype` — a per-byte reference encoder that
    exercises each decoder filter path (incl. the lane-vectorized
    multi-channel reconstruction) independently."""
    import struct
    import zlib

    import numpy as np

    if arr.ndim == 2:
        h, w, nch, color = arr.shape[0], arr.shape[1], 1, 0
        flat = arr.reshape(h, w)
    else:
        h, w, nch = arr.shape
        color = 2 if nch == 3 else 6
        flat = arr.reshape(h, w * nch)
    stride = w * nch

    def chunk(ct, body):
        return (struct.pack(">I", len(body)) + ct + body
                + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = b""
    prev = [0] * stride
    for y in range(h):
        cur = [int(v) for v in flat[y]]
        left = lambda i: cur[i - nch] if i >= nch else 0
        uleft = lambda i: prev[i - nch] if i >= nch else 0
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = [(cur[i] - left(i)) & 0xFF for i in range(stride)]
        elif ftype == 2:
            enc = [(cur[i] - prev[i]) & 0xFF for i in range(stride)]
        elif ftype == 3:
            enc = [(cur[i] - ((left(i) + prev[i]) >> 1)) & 0xFF
                   for i in range(stride)]
        else:
            enc = [(cur[i] - paeth(left(i), prev[i], uleft(i))) & 0xFF
                   for i in range(stride)]
        raw += bytes([ftype]) + bytes(enc)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    from postgresml_spark.operators.multimodal import _PNG_SIG
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_decode_all_filter_types():
    import numpy as np

    from postgresml_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (6, 11), dtype=np.uint8)
    for ftype in range(5):
        got = png_decode(_filtered_png(arr, ftype))
        assert np.array_equal(got, arr), f"filter {ftype}"


def test_png_decode_all_filter_types_rgb():
    """Multi-channel reconstruction: the left/upper-left neighbors sit
    nch lanes back, and the vectorized Sub/Average/Paeth paths must
    reproduce the per-byte reference encoder exactly (ADVICE r2 #4)."""
    import numpy as np

    from postgresml_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(7)
    for nch in (3, 4):
        arr = rng.integers(0, 256, (5, 9, nch), dtype=np.uint8)
        for ftype in range(5):
            got = png_decode(_filtered_png(arr, ftype))
            assert np.array_equal(got, arr), f"nch {nch} filter {ftype}"


def test_png_decoder_drives_real_image_pipeline(spark):
    """End to end on REAL PNGs: encode arrays, run the Spark hash +
    feature operators with png_decoder, verify against reference math
    on the original pixels."""
    import numpy as np

    from postgresml_spark.operators import multimodal as MM

    rng = np.random.default_rng(9)
    imgs = {i: rng.integers(0, 256, (16, 16), dtype=np.uint8) for i in (1, 2)}
    rows = [
        (i, "image", bytearray(MM.png_encode(a)),
         {"width": 16, "height": 16, "duration_ms": None, "format": "png"})
        for i, a in imgs.items()
    ]
    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    ah = {r["asset_id"]: r["sh"] for r in
          MM.image_hash(assets, decoder=MM.png_decoder, method="ahash").collect()}
    ph = {r["asset_id"]: r["sh"] for r in
          MM.image_hash(assets, decoder=MM.png_decoder, method="phash").collect()}
    for i, a in imgs.items():
        assert ah[i] == MM.ahash_reference(a)
        assert ph[i] == MM.phash_reference(a)


def test_png_decode_rejects_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest

    from postgresml_spark.operators.multimodal import _PNG_SIG, png_decode

    def chunk(ct, body):
        return (struct.pack(">I", len(body)) + ct + body
                + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF))

    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF....")
    # depth 3 exists for no color type; 16-bit palette is also illegal
    bad_depth = (_PNG_SIG
                 + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)))
    with pytest.raises(ValueError, match="depth"):
        png_decode(bad_depth)
    bad_p16 = (_PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)))
    with pytest.raises(ValueError, match="depth"):
        png_decode(bad_p16)


def _ref_png_full(samples, depth, color, interlace=0, plte=None, trns=None,
                  rng=None):
    """Spec-faithful reference encoder for the FULL PNG matrix —
    independent of the decoder under test. samples: (h, w, nch) ints
    (raw sample values: indices for palette, u16 for depth 16). Bit
    packing is MSB-first; every row gets a random filter (byte-level,
    bpp offset) when rng is given, else filter 0; Adam7 passes are
    independently filtered sub-images sharing one zlib stream."""
    import struct
    import zlib

    import numpy as np

    from postgresml_spark.operators.multimodal import _ADAM7, _PNG_SIG

    h, w, nch = samples.shape
    bpp = max(1, nch * depth // 8)

    def pack_row(row):  # (pw, nch) -> packed bytes
        vals = [int(v) for px in row for v in px]
        if depth == 8:
            return bytes(vals)
        if depth == 16:
            return b"".join(struct.pack(">H", v) for v in vals)
        bits = "".join(format(v, f"0{depth}b") for v in vals)
        bits += "0" * (-len(bits) % 8)
        return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    def filt_pass(sub):  # (ph, pw, nch) -> filtered scanline bytes
        out = b""
        prev = None
        for y in range(sub.shape[0]):
            cur = list(pack_row(sub[y]))
            pr = prev if prev is not None else [0] * len(cur)
            ft = int(rng.integers(0, 5)) if rng is not None else 0
            left = lambda i: cur[i - bpp] if i >= bpp else 0
            ul = lambda i: pr[i - bpp] if i >= bpp else 0
            if ft == 0:
                enc = cur
            elif ft == 1:
                enc = [(cur[i] - left(i)) & 0xFF for i in range(len(cur))]
            elif ft == 2:
                enc = [(cur[i] - pr[i]) & 0xFF for i in range(len(cur))]
            elif ft == 3:
                enc = [(cur[i] - ((left(i) + pr[i]) >> 1)) & 0xFF
                       for i in range(len(cur))]
            else:
                enc = [(cur[i] - paeth(left(i), pr[i], ul(i))) & 0xFF
                       for i in range(len(cur))]
            out += bytes([ft]) + bytes(enc)
            prev = cur
        return out

    if interlace:
        raw = b"".join(
            filt_pass(samples[y0::dy, x0::dx])
            for x0, y0, dx, dy in _ADAM7
            if samples[y0::dy, x0::dx].size
        )
    else:
        raw = filt_pass(samples)

    def chunk(ct, body):
        return (struct.pack(">I", len(body)) + ct + body
                + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF))

    png = _PNG_SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    )
    if plte is not None:
        png += chunk(b"PLTE", bytes(int(v) for px in plte for v in px))
    if trns is not None:
        png += chunk(b"tRNS", bytes(int(v) for v in trns))
    return png + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_decode_16bit_all_colors():
    """16-bit gray/RGB/gray+alpha/RGBA round-trip exactly (uint16 out),
    random filters per row — the bpp-offset byte filtering differs from
    the 8-bit lane layout (VERDICT r3 #5)."""
    import numpy as np

    from postgresml_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(21)
    for color, nch in ((0, 1), (4, 2), (2, 3), (6, 4)):
        arr = rng.integers(0, 65536, (7, 5, nch)).astype(np.uint16)
        got = png_decode(_ref_png_full(arr, 16, color, rng=rng))
        want = arr.reshape(7, 5) if nch == 1 else arr
        assert got.dtype == np.uint16 and np.array_equal(got, want), color


def test_png_decode_palette_depths():
    """Palette PNGs at 1/2/4/8-bit index depth decode through PLTE to
    RGB; tRNS adds per-index alpha → RGBA (VERDICT r3 #5)."""
    import numpy as np

    from postgresml_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(5)
    for depth in (1, 2, 4, 8):
        nidx = 1 << depth
        plte = rng.integers(0, 256, (nidx, 3), dtype=np.uint8)
        idx = rng.integers(0, nidx, (9, 13, 1))
        got = png_decode(_ref_png_full(idx, depth, 3, plte=plte, rng=rng))
        assert np.array_equal(got, plte[idx[:, :, 0]]), depth
        # tRNS covering half the palette; the rest defaults to 255
        trns = rng.integers(0, 256, nidx // 2 + 1, dtype=np.uint8)
        got = png_decode(
            _ref_png_full(idx, depth, 3, plte=plte, trns=trns, rng=rng)
        )
        alpha = np.full(nidx, 255, dtype=np.uint8)
        alpha[: len(trns)] = trns
        assert got.shape[2] == 4
        assert np.array_equal(got[:, :, 3], alpha[idx[:, :, 0]]), depth


def test_png_decode_subbyte_gray_and_gray_alpha():
    import numpy as np

    from postgresml_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(6)
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        v = rng.integers(0, mx + 1, (5, 11, 1))
        got = png_decode(_ref_png_full(v, depth, 0, rng=rng))
        assert np.array_equal(got, (v[:, :, 0] * (255 // mx)).astype(np.uint8))
    ga = rng.integers(0, 256, (6, 4, 2)).astype(np.uint8)
    got = png_decode(_ref_png_full(ga, 8, 4, rng=rng))
    assert np.array_equal(got, ga)


def test_png_decode_adam7():
    """Adam7 interlace: every pass is an independently filtered
    sub-image; reassembly must reproduce the original exactly across
    sizes that exercise empty and 1-pixel passes (VERDICT r3 #5)."""
    import numpy as np

    from postgresml_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(8)
    for (h, w) in ((13, 7), (8, 8), (1, 1), (3, 2), (16, 5)):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = png_decode(_ref_png_full(arr, 8, 2, interlace=1, rng=rng))
        assert np.array_equal(got, arr), (h, w)
    # interlaced + palette + sub-byte packing in one stream
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (10, 9, 1))
    got = png_decode(_ref_png_full(idx, 4, 3, interlace=1, plte=plte, rng=rng))
    assert np.array_equal(got, plte[idx[:, :, 0]])
    # interlaced 16-bit gray
    g16 = rng.integers(0, 65536, (9, 6, 1)).astype(np.uint16)
    got = png_decode(_ref_png_full(g16, 16, 0, interlace=1, rng=rng))
    assert np.array_equal(got, g16.reshape(9, 6))


def test_png_decoder_adapter_16bit_luma():
    import numpy as np

    from postgresml_spark.operators.multimodal import png_decoder

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 65536, (6, 7, 3)).astype(np.uint16)
    got = png_decoder(_ref_png_full(arr, 16, 2, rng=rng), {})
    hi = (arr >> 8).astype(np.float64)
    want = (hi[:, :, 0] * 0.299 + hi[:, :, 1] * 0.587
            + hi[:, :, 2] * 0.114).round().astype(np.uint8)
    assert got.dtype == np.uint8 and np.array_equal(got, want)


def test_adam7_pass_geometry_is_canonical():
    """Encoder and decoder share _ADAM7, so a wrong table could still
    round-trip; pin the SPEC's 8x8 pass-number matrix independently."""
    import numpy as np

    from postgresml_spark.operators.multimodal import _ADAM7

    want = [
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
    ]
    got = np.zeros((8, 8), dtype=int)
    for pi, (x0, y0, dx, dy) in enumerate(_ADAM7, start=1):
        got[y0::dy, x0::dx] = pi
    assert got.tolist() == want


def test_png_encode_format_matrix_round_trips():
    """png_encode's corpus-realistic modes (palette / 16-bit / Adam7,
    and their combinations) round-trip through png_decode exactly —
    the encoder half of the r3 VERDICT #5 matrix."""
    import numpy as np

    from postgresml_spark.operators.multimodal import png_decode, png_encode

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (11, 13), dtype=np.uint8)
    rgb = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    two = (64 + 128 * rng.integers(0, 2, (8, 8))).astype(np.uint8)

    # palette: gray input promotes to a gray RGB palette
    assert np.array_equal(
        png_decode(png_encode(two, palette=True)), np.stack([two] * 3, axis=2)
    )
    # palette chooses the smallest depth: 2 colors -> 1 bit
    assert png_encode(two, palette=True)[24] == 1  # IHDR bit-depth byte
    # 256-color palette at depth 8
    pc = rng.integers(0, 200, (16, 16, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(pc, palette=True)), pc)
    # 16-bit: uint8 scales x257 (spec rescale), uint16 verbatim
    out = png_decode(png_encode(gray, bit_depth=16))
    assert out.dtype == np.uint16 and np.array_equal(out, gray.astype(np.uint16) * 257)
    g16 = rng.integers(0, 65536, (6, 5)).astype(np.uint16)
    assert np.array_equal(png_decode(png_encode(g16)), g16)
    # Adam7 in every mode, odd sizes exercising empty/1-px passes
    for shape in ((1, 1), (2, 3), (8, 8), (13, 17)):
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(g, interlace=True)), g)
    assert np.array_equal(png_decode(png_encode(rgb, interlace=True)), rgb)
    assert np.array_equal(
        png_decode(png_encode(two, palette=True, interlace=True)),
        np.stack([two] * 3, axis=2),
    )
    got = png_decode(png_encode(gray, bit_depth=16, interlace=True))
    assert np.array_equal(got, gray.astype(np.uint16) * 257)


def test_image_decoder_sniffs_mixed_corpus():
    """image_decoder dispatches on magic bytes so one closure serves a
    heterogeneous (JPEG + PNG + raw) corpus; wrong containers raise."""
    import numpy as np
    import pytest

    from postgresml_spark.operators.multimodal import (
        image_decoder,
        jpeg_encode,
        jpeg_encode_progressive,
        png_encode,
    )

    rng = np.random.default_rng(12)
    two = (64 + 128 * rng.integers(0, 2, (8, 8))).astype(np.uint8)
    meta = {"width": 8, "height": 8, "format": "png"}
    for data in (
        png_encode(two),
        png_encode(two, palette=True),
        png_encode(two, bit_depth=16, interlace=True),
    ):
        assert np.array_equal(image_decoder(data, meta), two)
    for data in (jpeg_encode(two, quality=95), jpeg_encode_progressive(two, quality=95)):
        got = image_decoder(data, {"format": "jpeg"})
        assert got.shape == (8, 8) and np.abs(
            got.astype(int) - two.astype(int)
        ).max() <= 12
    raw = image_decoder(two.tobytes(), {"width": 8, "height": 8, "format": "raw"})
    assert np.array_equal(raw, two)
    # GIF and BMP are real codecs now — they dispatch, not raise
    from postgresml_spark.operators.multimodal import bmp_encode, gif_encode

    assert np.array_equal(image_decoder(gif_encode(two), {"format": "gif"}), two)
    assert np.array_equal(image_decoder(bmp_encode(two), {"format": "bmp"}), two)
    with pytest.raises(ValueError, match="unrecognized image container"):
        image_decoder(b"RIFF....WEBPVP8 ", {"format": "webp"})
