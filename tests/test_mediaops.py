"""Multimodal media ops: deterministic fake-codec decode, feature
extraction, resize, frame sampling, and catalog RI — the Spark-side
plumbing (schemas, Arrow batch shapes, row expansion, join-strategy
switch) is real; only the codec is the SYN1 deterministic stub."""

from __future__ import annotations

import numpy as np
import pytest

from gwv_spark import mediaops


def test_decode_roundtrip_deterministic():
    r1 = mediaops.gen_media_record(7)
    r2 = mediaops.gen_media_record(7)
    assert r1["data"] == r2["data"]
    arr = mediaops.decode_bytes(r1["data"])
    assert arr.ndim == 3
    if r1["kind"] != "audio":
        assert arr.shape[1] == r1["meta"]["height"]
        assert arr.shape[2] == r1["meta"]["width"]


def test_decode_rejects_real_codecs():
    with pytest.raises(NotImplementedError):
        mediaops.decode_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_media_features_matches_numpy(spark):
    media = mediaops.synth_media(spark, 40, partitions=4)
    feats = {r["media_id"]: r for r in mediaops.media_features(media).collect()}
    assert len(feats) == 40
    for idx in (0, 13, 39):
        rec = mediaops.gen_media_record(idx)
        arr = mediaops.decode_bytes(rec["data"])
        row = feats[rec["media_id"]]
        assert row["n_frames"] == arr.shape[0]
        assert row["mean_value"] == pytest.approx(arr.mean(), abs=1e-6)
        hist = np.bincount(arr.reshape(-1) >> 4, minlength=16)[:16]
        assert row["byte_hist"] == ",".join(str(int(x)) for x in hist)


def test_resize_and_frame_sample_shapes(spark):
    media = mediaops.synth_media(spark, 60, partitions=4)
    resized = mediaops.resize_images(media, 8, 8).collect()
    n_images = media.where("kind = 'image'").count()
    assert len(resized) == n_images
    assert all(len(r["data"]) == 64 for r in resized)

    frames = mediaops.sample_frames(media, every_n=2)
    got = frames.groupBy("media_id").count().collect()
    vids = {r["media_id"]: r for r in media.where("kind = 'video'").collect()}
    assert {r["media_id"] for r in got} == set(vids)
    for r in got:
        n_frames = mediaops.decode_bytes(bytes(vids[r["media_id"]]["data"])).shape[0]
        assert r["count"] == (n_frames + 1) // 2


def test_media_ri_finds_dangling(spark, tmp_path):
    d = mediaops.ensure_media(tmp_path, 100)
    media = spark.read.parquet(str(d / "media.parquet"))
    cat = spark.read.parquet(str(d / "media_catalog.parquet"))
    refs = media.select(media.media_id.alias("media_ref"))
    # broadcast path and sort-merge path must agree
    bc = mediaops.media_ri(refs, cat, broadcast_threshold=10**6)
    smj = mediaops.media_ri(refs, cat, broadcast_threshold=0)
    expected = {f"m-{i:08d}" for i in range(100) if i % 19 == 3}
    assert {r["media_ref"] for r in bc.collect()} == expected
    assert {r["media_ref"] for r in smj.collect()} == expected
