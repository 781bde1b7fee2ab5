"""Video visual fingerprinting: per-frame aHash posting list + the
shared temporal-alignment (offset-vote) matcher.

Raw-format video = concatenated uint8 frames, so decode is real here
(`raw_video_decoder`) — same contract as the image/audio raw decoders.
"""

from __future__ import annotations

import numpy as np
import pytest

from postgresml_spark.operators.multimodal import (
    ASSET_SCHEMA,
    ahash_reference,
    raw_video_decoder,
    sequence_match,
    video_fingerprints,
)

H = W = 16


def _pat(t: int) -> np.ndarray:
    # seeded-RNG frames: distinct per t (a gradient + t*t "moving"
    # pattern fails here — the shift is mostly uniform brightness,
    # which aHash is deliberately invariant to → colliding hashes)
    rng = np.random.default_rng(424200 + t)
    return rng.integers(0, 256, size=(H, W), dtype=np.uint8)


def _video_asset(asset_id: int, frames: list[np.ndarray]) -> dict:
    data = b"".join(f.tobytes() for f in frames)
    return {
        "asset_id": asset_id,
        "kind": "video",
        "data": data,
        "meta": {
            "width": W,
            "height": H,
            "duration_ms": len(frames) * 40,
            "format": "rawvideo",
        },
    }


@pytest.fixture(scope="module")
def clips():
    a = [_pat(i) for i in range(40)]
    b = [_pat(1000 + i) for i in range(40)]
    q = a[12:28]  # 16-frame excerpt starting at frame 12
    return a, b, q


def test_raw_video_decoder_shape_and_mismatch(clips):
    a, _, _ = clips
    asset = _video_asset(1, a)
    frames = raw_video_decoder(asset["data"], asset["meta"])
    assert frames.shape == (40, H, W)
    assert np.array_equal(frames[7], a[7])
    with pytest.raises(ValueError, match="rawvideo"):
        raw_video_decoder(b"\x00" * 100, {"height": H, "width": W})


def test_frame_hashes_match_reference(spark, clips):
    a, _, _ = clips
    df = spark.createDataFrame([_video_asset(1, a)], ASSET_SCHEMA)
    rows = video_fingerprints(df, decoder=raw_video_decoder).collect()
    assert len(rows) == 40
    by_t = {r["t"]: r["fp"] for r in rows}
    for t in (0, 7, 39):
        bits = ahash_reference(a[t])
        fp = (int(bits[:32], 2) << 32) | int(bits[32:], 2)
        if fp >= 1 << 63:
            fp -= 1 << 64
        assert by_t[t] == fp


def test_excerpt_matches_source_clip(spark, clips):
    a, b, q = clips
    db = spark.createDataFrame(
        [_video_asset(1, a), _video_asset(2, b)], ASSET_SCHEMA
    )
    qdf = spark.createDataFrame([_video_asset(100, q)], ASSET_SCHEMA)
    db_fp = video_fingerprints(db, decoder=raw_video_decoder)
    q_fp = video_fingerprints(qdf, decoder=raw_video_decoder)
    rows = sequence_match(db_fp, q_fp, min_votes=5).collect()
    assert len(rows) == 1
    m = rows[0]
    assert m["query_id"] == 100 and m["db_id"] == 1
    assert m["offset"] == 12
    assert m["votes"] >= 14  # ~all 16 excerpt frames vote together


def test_foreign_clip_rejected(spark, clips):
    a, _, _ = clips
    foreign = [_pat(5000 + i) for i in range(16)]
    db = spark.createDataFrame([_video_asset(1, a)], ASSET_SCHEMA)
    qdf = spark.createDataFrame([_video_asset(200, foreign)], ASSET_SCHEMA)
    rows = sequence_match(
        video_fingerprints(db, decoder=raw_video_decoder),
        video_fingerprints(qdf, decoder=raw_video_decoder),
        min_votes=3,
    ).collect()
    assert rows == []
