"""Multimodal binary-column plumbing: schema, batch shape, and kernel
outputs over the deterministic FakeMedia container (codecs absent in
this sandbox; the real-decode path must raise NotImplementedError)."""

from __future__ import annotations

import numpy as np
import pytest

from bank_statement_pdf_parser_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = mm.synth_media_rows(60, seed=42)
    return spark.createDataFrame(rows, mm.MEDIA_DDL), rows


def test_decode_meta(media_df):
    df, rows = media_df
    got = {r.media_id: r for r in
           df.mapInPandas(mm.decode_meta, mm.META_DDL).collect()}
    assert len(got) == len(rows)
    for r in rows:
        g = got[r["media_id"]]
        assert (g.width, g.height, g.sample_rate, g.n_frames) == (
            r["meta"]["width"], r["meta"]["height"],
            r["meta"]["sample_rate"], r["meta"]["n_frames"])
        body = np.frombuffer(r["payload"], dtype=np.uint8,
                             offset=mm.HEADER.size)
        assert g.checksum == int(body.sum())
        assert g.n_bytes == len(r["payload"])


def test_byte_histogram_features(media_df):
    df, rows = media_df
    got = {r.media_id: r.feature for r in
           df.mapInPandas(mm.byte_histogram_features,
                          mm.FEATURE_DDL).collect()}
    for r in rows[:10]:
        body = np.frombuffer(r["payload"], dtype=np.uint8,
                             offset=mm.HEADER.size)
        hist = np.bincount(body, minlength=256).astype(np.float32)
        if hist.sum():
            hist = hist / hist.sum()
        np.testing.assert_allclose(got[r["media_id"]], hist, rtol=1e-6)
    assert all(len(f) == 256 for f in got.values())


def test_frame_sampling(media_df):
    df, rows = media_df
    out = df.mapInPandas(mm.sample_frames(every_k=2), mm.FRAME_DDL).collect()
    vids = {r["media_id"]: r for r in rows if r["kind"] == "video"}
    assert {r.media_id for r in out} == set(vids)
    for r in out:
        v = vids[r.media_id]
        w, h = v["meta"]["width"], v["meta"]["height"]
        assert len(r.frame_bytes) == w * h
        start = mm.HEADER.size + r.frame_idx * w * h
        assert bytes(r.frame_bytes) == v["payload"][start:start + w * h]
        assert r.frame_idx % 2 == 0


def test_real_codec_path_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"\xff\xd8\xff")  # no PIL in sandbox
