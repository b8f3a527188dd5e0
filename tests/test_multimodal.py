"""Multimodal plumbing tests: the decode is a stub, the Spark-side
schema/batching/fan-out is real."""

import pytest

from eynollah_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
    synthetic_assets,
)


def test_feature_extraction_shape(spark):
    assets = synthetic_assets(spark, n=30)
    feats = extract_features(assets, fake_decode=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        assert abs(sum(r.feature) - 1.0) < 1e-9
        assert r.n_bytes > 0


def test_feature_extraction_deterministic(spark):
    assets = synthetic_assets(spark, n=20)
    a = {r.asset_id: tuple(r.feature) for r in extract_features(assets).collect()}
    b = {
        r.asset_id: tuple(r.feature)
        for r in extract_features(assets.repartition(7)).collect()
    }
    assert a == b


def test_frame_sampling_fanout(spark):
    assets = synthetic_assets(spark, n=30)
    frames = sample_frames(assets, every_ms=1000).collect()
    n_videos = assets.filter("modality = 'video'").count()
    assert n_videos > 0
    assert len(frames) >= n_videos  # fan-out: >= 1 frame per video
    by_asset = {}
    for f in frames:
        by_asset.setdefault(f.asset_id, []).append(f)
    for aid, fs in by_asset.items():
        idxs = sorted(f.frame_idx for f in fs)
        assert idxs == list(range(len(fs)))
        assert all(f.ts_ms == f.frame_idx * 1000 for f in fs)


def test_real_decode_raises(spark):
    assets = synthetic_assets(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|decode requires"):
        extract_features(assets, fake_decode=False).collect()
