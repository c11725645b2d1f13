"""Audio multimodal column: real RIFF/PCM16 codec round-trip +
property pins for the frame features (the imaging test discipline:
the codec is exercised bidirectionally so a header or byte-order bug
cannot hide behind the synthesis contract)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR
from timeseriesdb_spark.functions import audio
from timeseriesdb_spark.operators.multimodal import (
    AUD_FRAME,
    q_audio_frames,
    q_audio_meta,
)


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=300,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip(samples, rate):
    payload = audio.encode_wav(np.array(samples, dtype=np.int16), rate)
    got_rate, got = audio.decode_wav(payload)
    assert got_rate == rate
    assert got.tolist() == samples
    assert len(payload) == 44 + 2 * len(samples)


def test_decode_rejects_non_wav():
    import pytest

    with pytest.raises(ValueError):
        audio.decode_wav(b"BM" + b"\x00" * 60)


def test_synth_samples_clamp_and_rounding():
    s = audio.synth_samples(np.array([0.0, 0.5 / audio.AUD_SCALE, -1e9, 1e9]))
    # half-away: 0.5 rounds to 1 (not banker's 0); extremes clamp
    assert s.tolist() == [0, 1, -32768, 32767]
    assert s.dtype == np.int16


def test_audio_meta_consistent(spark):
    rows = q_audio_meta(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_bytes == 44 + 2 * r.n_samples
        assert r.sample_rate == audio.AUD_RATE
        assert r.duration_ms == r.n_samples * 1000 // r.sample_rate


def test_audio_frames_match_numpy(spark):
    """Recompute one signal's frame features from the raw events in
    numpy through the same real decode path and demand bit-equality."""
    import pandas as pd  # noqa: F401

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    got = {
        (r.user_id, r.frame): (r.energy, r.peak, r.n_zc)
        for r in q_audio_frames(spark, SF_DIR).collect()
    }
    assert got
    uid = next(iter(sorted({u for u, _ in got})))
    g = ev[ev["user_id"] == uid]
    _, s = audio.decode_wav(audio.synth_audio(g["value"].to_numpy()))
    k = len(s) // AUD_FRAME
    m = s[: k * AUD_FRAME].astype(np.int64).reshape(k, AUD_FRAME)
    for f in range(k):
        assert got[(uid, f)] == (
            int((m[f] * m[f]).sum()),
            int(np.abs(m[f]).max()),
            int(((m[f, 1:] * m[f, :-1]) < 0).sum()),
        )
    # frames beyond the complete ones must not exist
    assert (uid, k) not in got
