"""Multimodal binary-column plumbing: schema, actor pool, stubbed decode."""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_decode_stub_rejects_foreign_payloads():
    from kgray.pipelines.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_synth_roundtrip():
    from kgray.pipelines.multimodal import decode_image, synth_payload

    img = decode_image(synth_payload(7, 20, 12))
    assert img.shape == (12, 20)
    assert img.dtype == np.uint8
    # deterministic
    assert (img == decode_image(synth_payload(7, 20, 12))).all()


def test_media_features_pipeline(ray_session):
    from kgray.pipelines.multimodal import HIST_BINS, media_features

    df = media_features(SF_DIR).to_pandas().sort_values("media_id", ignore_index=True)
    assert len(df) == 128
    assert set(df.columns) == {"media_id", "byte_len", "sha1", "mean_px", "hist"}
    assert df["hist"].map(len).eq(HIST_BINS).all()
    # histogram mass == pixel count == byte_len - 12-byte header
    assert (df["hist"].map(sum) == df["byte_len"] - 12).all()
    # rerun -> identical features (content-hash stability)
    again = media_features(SF_DIR).to_pandas().sort_values("media_id", ignore_index=True)
    assert (df["sha1"] == again["sha1"]).all()
