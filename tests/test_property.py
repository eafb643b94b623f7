"""Property-based tests (hypothesis): the as-of join and sessionize
operators hold their invariants on arbitrary generated timelines, not
just the fixture data.  Example counts are kept small — each example
runs real Spark jobs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pic2vec_spark.ops.asof import asof_join


def _timeline(draw):
    n = draw(st.integers(10, 60))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    return pd.DataFrame(
        {
            "entity_id": rng.integers(0, 5, n),
            "ts": rng.uniform(0, 1000, n).round(3),
            "row_id": np.arange(n),
            "kind": rng.choice(["feature", "query"], n),
            "value": rng.normal(size=n).round(6),
        }
    )


timelines = st.builds(lambda seed: seed, st.integers(0, 2**31 - 1))


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_asof_matches_merge_asof_on_random_timelines(spark, direction, data):
    pdf = _timeline(data.draw)
    # dedup (entity, ts) so tiebreak order is immaterial (merge_asof
    # resolves duplicate keys by input order, ours by tiebreak column)
    pdf = pdf.drop_duplicates(["entity_id", "ts"]).reset_index(drop=True)
    f = pdf[pdf.kind == "feature"][["entity_id", "ts", "row_id", "value"]]
    q = pdf[pdf.kind == "query"][["entity_id", "ts", "row_id"]]
    if f.empty or q.empty:
        return
    out = (
        asof_join(
            spark.createDataFrame(q),
            spark.createDataFrame(f),
            value_cols=["value"],
            tiebreak="row_id",
            direction=direction,
        )
        .select("row_id", "value_asof", "ts", "ts_asof")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )
    expected = (
        pd.merge_asof(
            q.sort_values("ts"),
            f.sort_values("ts"),
            on="ts", by="entity_id", direction=direction, suffixes=("", "_f"),
        )
        .set_index("row_id")
        .sort_index()
    )
    got_v = out["value_asof"].values.astype(float)
    exp_v = expected["value"].values.astype(float)
    nan = np.isnan(got_v) & np.isnan(exp_v)
    assert (nan | np.isclose(got_v, exp_v, atol=1e-9)).all()
    if direction == "backward":  # zero temporal leakage invariant
        m = out["ts_asof"].notna()
        assert (out.loc[m, "ts_asof"] <= out.loc[m, "ts"]).all()


@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 2**31 - 1), gap=st.floats(1.0, 50.0))
def test_sessionize_matches_numpy_reference(spark, seed, gap):
    from pic2vec_spark.ops.windows import sessionize

    rng = np.random.default_rng(seed)
    n = 80
    pdf = pd.DataFrame(
        {
            "entity_id": rng.integers(0, 4, n),
            "ts": rng.uniform(0, 500, n).round(3),
            "row_id": np.arange(n),
        }
    ).drop_duplicates(["entity_id", "ts"])
    got = (
        sessionize(spark.createDataFrame(pdf), gap_s=gap, tiebreak="row_id")
        .toPandas()
        .set_index("row_id")["session_id"]
    )
    for eid, grp in pdf.groupby("entity_id"):
        grp = grp.sort_values("ts")
        sid = (grp.ts.diff() > gap).cumsum()
        for rid, expect in zip(grp.row_id, sid):
            assert got.loc[rid] == expect, (eid, rid)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 6),          # n_frames
    st.integers(4, 24),         # h
    st.integers(4, 24),         # w
    st.integers(0, 2**32 - 1),  # seed
    st.sampled_from(["bmp", "png"]),
)
def test_mjv1_lossless_roundtrip_property(n_frames, h, w, seed, fmt):
    """Any MJV1 stream of lossless frames round-trips bit-exactly at
    any frame count / geometry / lossless codec choice."""
    from pic2vec_spark.codecs import decode_video, encode_video

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for _ in range(n_frames)
    ]
    out = decode_video(encode_video(frames, fmt))
    assert len(out) == n_frames
    for a, b in zip(frames, out):
        assert a.shape == b.shape and (a == b).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.floats(0.25, 1.0),       # gain of the scaled copy
    st.floats(80.0, 2000.0),    # carrier Hz
    st.floats(1.5, 4.0),        # overtone ratio
)
def test_audio_fp64_scale_invariance_property(seed, gain, carrier, ratio):
    """The Haitsma-Kalker fingerprint is stable under volume scaling
    across the whole audio-like signal family (carrier + FM-modulated
    overtone at arbitrary frequencies/phases/amplitudes): <=3 Hamming
    bits down to quarter volume, against ~32 for distinct content.
    Hypothesis originally broke the log1p variant of this kernel on
    SPARSE tones (most mel bands at the absolute floor, where log1p(E)
    ~ E scales with gain^2 — a measured sweep flipped up to 63/64 bits
    at 0.5x volume); audio_fp64 now floors each band RELATIVE to the
    block's total power, which cancels gain exactly up to 16-bit
    requantization noise (3000-signal sweep worst case: 2 bits)."""
    from pic2vec_spark.codecs import decode_wav, encode_wav
    from pic2vec_spark.ops.multimodal import audio_fp64

    rng = np.random.default_rng(seed)
    t = np.arange(4000) / 8000.0
    sig = rng.uniform(0.2, 0.45) * np.sin(
        2 * np.pi * carrier * t + rng.uniform(0, 2 * np.pi)
    ) + rng.uniform(0.05, 0.2) * np.sin(
        2 * np.pi * carrier * ratio * t
        * (1 + 0.1 * np.sin(2 * np.pi * rng.uniform(1, 4) * t))
    )
    sig /= max(1.0, np.abs(sig).max() * 1.05)

    def fp(x, g):
        y, rate = decode_wav(encode_wav(g * x, 8000))
        return audio_fp64(y.mean(axis=1), rate)

    d = bin((fp(sig, 1.0) ^ fp(sig, gain)) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert d <= 3, d


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_decoders_raise_only_value_error_on_adversarial_bytes(seed):
    """Untrusted-ingest contract: decode_image / decode_wav /
    decode_video either succeed or raise ValueError — never a
    struct/zlib/index error that would escape the decode UDFs'
    missing-row handling and crash an executor task.  Fuzz: random
    garbage, truncations and single-byte corruptions of valid media."""
    from pic2vec_spark.codecs import (
        decode_image,
        decode_video,
        decode_wav,
        encode_image,
        encode_video,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    wav = encode_wav(np.sin(np.arange(800) / 20.0) * 0.4, 8000)
    vid = encode_video([img, img[::-1]], ["bmp", "png"])

    cases = []
    for fmt in ("bmp", "png", "jpeg"):
        good = encode_image(img, fmt)
        cut = rng.integers(1, len(good))
        flip = bytearray(good)
        flip[rng.integers(0, len(good))] ^= 0xFF
        cases += [
            ("img", fmt, bytes(rng.integers(0, 256, 40, dtype=np.uint8))),
            ("img", fmt, good[:cut]),
            ("img", fmt, bytes(flip)),
        ]
    for kind, good in (("wav", wav), ("vid", vid)):
        cut = rng.integers(1, len(good))
        flip = bytearray(good)
        flip[rng.integers(0, len(good))] ^= 0xFF
        cases += [
            (kind, None, good[:cut]),
            (kind, None, bytes(flip)),
            (kind, None, good[:8] + bytes(rng.integers(0, 256, 30, dtype=np.uint8))),
        ]

    for kind, fmt, payload in cases:
        try:
            if kind == "img":
                decode_image(payload, fmt)
            elif kind == "wav":
                decode_wav(payload)
            else:
                decode_video(payload)
        except ValueError:
            pass  # the one permitted failure mode
