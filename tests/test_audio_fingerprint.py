"""Audio spectral fingerprinting (peak constellation) + match join.

Real numpy DSP over raw PCM via `pcm16_decoder` — no codec needed.
Covers: kernel determinism and shift behavior, excerpt→source matching
with the offset recovered exactly, non-match rejection, degenerate
(too-short) audio, and the inverted-index plan shape.
"""

from __future__ import annotations

import numpy as np
import pytest

from postgresml_spark.operators.multimodal import (
    ASSET_SCHEMA,
    audio_fingerprint_array,
    audio_fingerprints,
    audio_match,
    pcm16_decoder,
)

SR = 8000
HOP = 128


def _chirp_mix(sweeps: list[tuple[float, float]], seconds: float, seed: int) -> np.ndarray:
    """Sum of linear chirps (f0→f1 over the clip) + noise. Chirps make
    the spectrum TIME-VARYING — stationary pure tones are degenerate
    for constellation hashing (every frame has identical peaks, so the
    offset histogram is flat)."""
    t = np.arange(int(SR * seconds)) / SR
    dur = t[-1] if t.size else 1.0
    sig = sum(
        np.sin(2 * np.pi * (f0 * t + (f1 - f0) / (2 * dur) * t * t))
        for f0, f1 in sweeps
    )
    rng = np.random.default_rng(seed)
    sig = sig + rng.normal(0, 0.01, t.size)
    return (sig / np.max(np.abs(sig)) * 20000).astype("<i2").astype(np.float64)


def _asset(asset_id: int, sig: np.ndarray) -> dict:
    return {
        "asset_id": asset_id,
        "kind": "audio",
        "data": sig.astype("<i2").tobytes(),
        "meta": {
            "width": None,
            "height": None,
            "duration_ms": int(sig.size * 1000 / SR),
            "format": "pcm16",
        },
    }


@pytest.fixture(scope="module")
def signals():
    # two distinct 2 s tracks; query = a hop-aligned 0.5 s excerpt of
    # track A starting at frame offset 44 (44*128 samples)
    a = _chirp_mix([(300.0, 1400.0), (2000.0, 900.0)], 2.0, seed=1)
    b = _chirp_mix([(3500.0, 600.0), (150.0, 2600.0)], 2.0, seed=2)
    start = 44 * HOP
    q = a[start : start + SR // 2]
    return a, b, q


def test_kernel_deterministic_and_bounded(signals):
    a, _, _ = signals
    fp1 = audio_fingerprint_array(a)
    fp2 = audio_fingerprint_array(a)
    assert fp1 == fp2 and len(fp1) > 100
    for fp, t in fp1:
        f1, f2, dt = fp >> 16, (fp >> 8) & 0xFF, fp & 0xFF
        assert 0 < dt <= 16 and 0 < f1 <= 128 and 0 < f2 <= 128 and t >= 0


def test_kernel_too_short_is_empty():
    assert audio_fingerprint_array(np.zeros(100)) == []
    assert audio_fingerprint_array(np.zeros(0)) == []


def test_pcm16_decoder_roundtrip(signals):
    a, _, _ = signals
    dec = pcm16_decoder(a.astype("<i2").tobytes(), {})
    assert np.array_equal(dec, a)


def test_excerpt_matches_source_at_exact_offset(spark, signals):
    a, b, q = signals
    db = spark.createDataFrame([_asset(1, a), _asset(2, b)], ASSET_SCHEMA)
    qdf = spark.createDataFrame([_asset(100, q)], ASSET_SCHEMA)
    db_fp = audio_fingerprints(db, decoder=pcm16_decoder)
    q_fp = audio_fingerprints(qdf, decoder=pcm16_decoder)
    rows = audio_match(db_fp, q_fp, min_votes=5).collect()
    assert len(rows) == 1
    m = rows[0]
    assert m["query_id"] == 100 and m["db_id"] == 1
    # hop-aligned excerpt → every shared anchor lands at one offset
    assert m["offset"] == 44
    # the winning offset concentrates a large share of the join
    assert m["votes"] >= 50


def test_foreign_query_has_no_confident_match(spark, signals):
    a, _, _ = signals
    foreign = _chirp_mix([(2800.0, 200.0)], 0.5, seed=9)
    db = spark.createDataFrame([_asset(1, a)], ASSET_SCHEMA)
    qdf = spark.createDataFrame([_asset(200, foreign)], ASSET_SCHEMA)
    db_fp = audio_fingerprints(db, decoder=pcm16_decoder)
    q_fp = audio_fingerprints(qdf, decoder=pcm16_decoder)
    # chance hash collisions scatter across offsets; none concentrates
    rows = audio_match(db_fp, q_fp, min_votes=20).collect()
    assert rows == []


def test_match_plan_is_hash_join(spark, signals):
    a, _, q = signals
    db = spark.createDataFrame([_asset(1, a)], ASSET_SCHEMA)
    qdf = spark.createDataFrame([_asset(100, q)], ASSET_SCHEMA)
    plan = (
        audio_match(
            audio_fingerprints(db, decoder=pcm16_decoder),
            audio_fingerprints(qdf, decoder=pcm16_decoder),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wav_decoder_roundtrip_and_match(spark):
    """Stdlib WAV container decode: write real WAV bytes (mono + a
    stereo mixdown case), decode, and verify the fingerprint matcher
    still identifies an excerpt — codec-free end to end on real WAVs."""
    import io
    import wave

    import numpy as np

    from postgresml_spark.operators import multimodal as MM

    rng = np.random.default_rng(5)
    sig = (rng.standard_normal(4096) * 3000).astype("<i2")

    def wav_bytes(samples, nch=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(samples.tobytes())
        return buf.getvalue()

    mono = MM.wav_decoder(wav_bytes(sig), {})
    assert np.array_equal(mono, sig.astype(np.float64))
    # stereo: identical channels mix back to the same signal
    stereo = np.repeat(sig, 2).astype("<i2")
    mixed = MM.wav_decoder(wav_bytes(stereo, nch=2), {})
    assert np.allclose(mixed, sig.astype(np.float64))
    # excerpt of the real WAV matches its source track
    full_fp = MM.audio_fingerprint_array(mono)
    exc_fp = MM.audio_fingerprint_array(mono[1024:3072])
    assert set(h for h, _ in exc_fp) & set(h for h, _ in full_fp)
