"""Multimodal binary-column stage tests: actor-pool plumbing, schema, row
expansion, determinism (decode itself is stubbed — no codecs here)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pages_ds(ray_session, tmp_path_factory):
    import ray.data as rd

    from gscap_ray.synth import ensure_pages

    d = tmp_path_factory.mktemp("mmpages")
    p = ensure_pages(str(d / "pages"), 2000, n_hosts=4, days=2, seed=3)
    return rd.read_parquet(p, columns=["url", "html"])


def test_feature_extractor_actor_pool(pages_ds):
    from gscap_ray.stages.multimodal import BinaryFeatureExtractor

    out = pages_ds.map_batches(BinaryFeatureExtractor, batch_format="pyarrow",
                               batch_size=256, concurrency=2,
                               fn_constructor_kwargs=dict(dim=16)).to_pandas()
    assert len(out) == 2000
    assert "html" not in out.columns  # payload projected away
    f = np.stack(out["features"].values)
    assert f.shape == (2000, 16) and f.dtype == np.float32
    assert (out["payload_bytes"] > 0).all()
    # determinism: same url -> same features on a second run
    out2 = pages_ds.map_batches(BinaryFeatureExtractor, batch_format="pyarrow",
                                batch_size=256, concurrency=2,
                                fn_constructor_kwargs=dict(dim=16)).to_pandas()
    a = out.sort_values("url").reset_index(drop=True)
    b = out2.sort_values("url").reset_index(drop=True)
    assert np.array_equal(np.stack(a["features"].values), np.stack(b["features"].values))


def test_real_mode_is_explicitly_stubbed(pages_ds):
    from gscap_ray.stages.multimodal import BinaryFeatureExtractor

    ext = BinaryFeatureExtractor(mode="real")
    with pytest.raises(NotImplementedError):
        ext._decode([b"x"])


def test_frame_sampler_row_expansion(pages_ds):
    from gscap_ray.stages.multimodal import FrameSampler

    out = pages_ds.map_batches(FrameSampler, batch_format="pyarrow",
                               batch_size=512, concurrency=2,
                               fn_constructor_kwargs=dict(k=4, dim=8)).to_pandas()
    assert len(out) == 2000 * 4
    per = out.groupby("url")["frame"].agg(["count", "min", "max"])
    assert (per["count"] == 4).all() and (per["min"] == 0).all() and (per["max"] == 3).all()
    f = np.stack(out["frame_features"].values)
    assert f.shape == (8000, 8)
    # frames of one url differ from each other
    g = out[out["url"] == out["url"].iloc[0]]
    fs = np.stack(g["frame_features"].values)
    assert len(np.unique(fs, axis=0)) == 4
