"""Multimodal plumbing: schema, batch shape, determinism of the stubs."""

from __future__ import annotations

import hashlib

from awsbatch_mapreduce_spark.multimodal.binary import (
    decode_image_features,
    frame_sample,
    synthesize_binary_docs,
)
from tests.conftest import SF_DIR


def test_binary_schema(spark):
    b = synthesize_binary_docs(spark, SF_DIR)
    assert dict(b.dtypes)["payload"] == "binary"
    meta_type = dict(b.dtypes)["meta"]
    assert "mime" in meta_type and "n_bytes" in meta_type


def test_decode_features_match_python(spark):
    b = synthesize_binary_docs(spark, SF_DIR).limit(5)
    feats = {r.doc_id: r for r in decode_image_features(b).collect()}
    for row in b.collect():
        payload = bytes(row.payload)
        f = feats[row.doc_id]
        assert f.n_bytes == len(payload)
        assert f.sha16 == hashlib.sha256(payload).hexdigest()[:16]
        assert f.fake_width == 64 + len(payload) % 192
        assert abs(f.brightness - sum(payload) / len(payload)) < 1e-9


def test_frame_sample_shape(spark):
    b = synthesize_binary_docs(spark, SF_DIR).limit(3)
    frames = frame_sample(b, n_frames=4, frame_bytes=16).collect()
    by_doc: dict[int, list] = {}
    for fr in frames:
        by_doc.setdefault(fr.doc_id, []).append(fr)
    for doc_id, frs in by_doc.items():
        assert len(frs) <= 4
        assert sorted(f.frame_idx for f in frs) == list(range(len(frs)))
        assert all(1 <= f.frame_len <= 16 for f in frs)
