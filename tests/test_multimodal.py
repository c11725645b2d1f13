"""Real multimodal decode: the pure-numpy BMP/PPM codecs round-trip,
the bilinear kernel matches analytic values, and the full Spark
mapInPandas path (synthesize → encode → decode → resize) produces the
pixels the math says — on both formats, including BMP row padding.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_DIR
from timeseriesdb_spark.functions import imaging as im
from timeseriesdb_spark.operators.multimodal import (
    RESIZE_H,
    RESIZE_W,
    q_multimodal_features,
    q_multimodal_meta,
    q_multimodal_resize,
)


@pytest.mark.parametrize("w,h", [(1, 1), (5, 3), (17, 13), (32, 32)])
@pytest.mark.parametrize("fmt", ["bmp", "ppm"])
def test_codec_roundtrip(w, h, fmt):
    rng = np.random.default_rng(w * 100 + h)
    pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    payload = im.encode_bmp(pix) if fmt == "bmp" else im.encode_ppm(pix)
    got_fmt, got = im.decode_image(payload)
    assert got_fmt == fmt
    assert np.array_equal(got, pix)
    if fmt == "bmp":  # the size formula the meta oracle mirrors
        assert len(payload) == 54 + im.bmp_stride(w) * h
    else:
        assert len(payload) == im.ppm_header_len(w, h) + w * h * 3


def test_bilinear_analytic():
    # solid color is a fixed point
    solid = np.full((20, 30, 1), 77, np.uint8)
    assert np.allclose(im.bilinear_resize(solid, 8, 8), 77.0)
    # 1x2 black/white -> align_corners=False ramp
    bw = np.array([[[0.0], [255.0]]])
    got = im.bilinear_resize(bw, 1, 4)[0, :, 0]
    assert np.allclose(got, [0.0, 63.75, 191.25, 255.0])
    # downsample 4x4 quadrant image to 2x2 = quadrant means
    q = np.zeros((4, 4, 1))
    q[:2, 2:] = 100.0
    q[2:, :2] = 200.0
    q[2:, 2:] = 50.0
    got = im.bilinear_resize(q, 2, 2)[:, :, 0]
    assert np.allclose(got, [[0.0, 100.0], [200.0, 50.0]])


def test_synth_dims_match_oracle_formula():
    for n in [0, 1, 23, 24, 25, 503]:
        w, h = im.synth_dims(n)
        assert w == im.SYNTH_MIN + n % im.SYNTH_W_MOD
        assert h == im.SYNTH_MIN + (n * 7) % im.SYNTH_H_MOD


def _spark_pixels(spark, rows):
    """Run the multimodal resize through a real Spark round trip on a
    synthetic documents frame written as parquet (same shape the
    queries read)."""
    import tempfile

    doc = spark.createDataFrame(rows, "doc_id long, text string")
    d = tempfile.mkdtemp()
    doc.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_resize_through_spark_matches_numpy(spark):
    rows = [(0, "abcdefgh" * 11), (1, "a quick brown fox " * 7)]
    d = _spark_pixels(spark, rows)
    got = {
        (r.doc_id, r.px, r.py): r.value
        for r in q_multimodal_resize(spark, d).collect()
    }
    assert len(got) == len(rows) * RESIZE_W * RESIZE_H
    for doc_id, text in rows:
        payload = im.synth_image(text.encode(), doc_id)
        _, pix = im.decode_image(payload)
        # exact contract: the Spark path equals bilinear_gray_exact
        # BITWISE (N/D over integer taps)
        n, d = im.bilinear_gray_exact(pix, RESIZE_H, RESIZE_W)
        exact = n / float(d)
        # and the rational geometry agrees with the float bilinear
        # reference to FP noise
        gray = pix.astype(np.float64).mean(axis=2)[:, :, None]
        small = im.bilinear_resize(gray, RESIZE_H, RESIZE_W)[:, :, 0]
        for py in range(RESIZE_H):
            for px in range(RESIZE_W):
                assert got[(doc_id, px, py)] == exact[py, px]
                assert got[(doc_id, px, py)] == pytest.approx(
                    small[py, px] / 255.0, abs=1e-9
                )


def test_meta_reads_back_synthesized_headers(spark):
    rows = [(i, "x" * (3 + 7 * i)) for i in range(6)]
    d = _spark_pixels(spark, rows)
    got = {r.doc_id: r for r in q_multimodal_meta(spark, d).collect()}
    for doc_id, text in rows:
        w, h = im.synth_dims(len(text))
        r = got[doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.format == ("bmp" if doc_id % 2 == 0 else "ppm")
        assert r.n_bytes == (
            54 + im.bmp_stride(w) * h
            if doc_id % 2 == 0
            else im.ppm_header_len(w, h) + w * h * 3
        )


def test_features_constant_image_constant_vector(spark):
    # a text of one repeated byte tiles to a constant image: every
    # stripe mean must equal that byte / 255
    rows = [(0, "m" * 40)]
    d = _spark_pixels(spark, rows)
    out = q_multimodal_features(spark, d).collect()
    assert len(out) == 16
    expect = round(ord("m") / 255.0, 6)
    assert all(r.value == pytest.approx(expect, abs=1e-9) for r in out)
    w, h = im.synth_dims(40)
    assert all(r.n_frames_sampled == len(range(0, h, 4)) for r in out)


def test_meta_runs_on_testdata(spark):
    out = q_multimodal_meta(spark, SF_DIR)
    rows = out.limit(5).collect()
    assert rows and all(r.width >= im.SYNTH_MIN for r in rows)
