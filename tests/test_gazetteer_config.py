"""Gazetteer lookup + config/extension-surface tests."""

import numpy as np

from gscap_ray.config import DEFAULT, load_context_layer
from gscap_ray.functions.gazetteer import city_from_dd, dd_from_city, tz_from_dd


def test_tz_from_dd():
    tz = tz_from_dd(np.array([41.0, 48.9, 35.7]), np.array([-87.7, 2.3, 139.7]))
    assert tz.tolist() == ["America/Chicago", "Europe/Paris", "Asia/Tokyo"]


def test_city_sentinel():
    # middle of the southern ocean, tight bound -> None sentinel
    c = city_from_dd(np.array([-60.0]), np.array([-120.0]), max_distance_deg=5.0)
    assert c[0] is None
    c2 = city_from_dd(np.array([51.5]), np.array([-0.1]))
    assert c2[0] == "london"


def test_dd_from_city():
    lat, lon = dd_from_city("tokyo")
    assert round(lat, 1) == 35.7
    assert dd_from_city("atlantis") == (0.0, 0.0)


def test_config_and_layers():
    assert DEFAULT.eps == 0.005 and DEFAULT.min_samples == 100  # gps.py defaults
    polys = load_context_layer("polygons")
    assert len(polys) > 0 and "ring_lat" in polys[0]
    raster = load_context_layer("raster")
    assert raster.sample(np.array([10.0]), np.array([10.0])).shape == (1,)
    gaz = load_context_layer("gazetteer")
    assert hasattr(gaz, "tz_from_dd")


def test_jobconfig_wired_through_flagship(ray_session, tmp_path):
    """JobConfig knobs must actually reach the stages: a non-default
    s2_level / grid / partitions / hex set changes the tile columns, and
    the default config reproduces the canonical output byte-for-byte."""
    import numpy as np

    from gscap_ray.config import DEFAULT, JobConfig
    from gscap_ray.pipelines.flagship import labeled_pages
    from gscap_ray.synth import ensure_pages

    pages = ensure_pages(str(tmp_path / "pw"), 2000, n_hosts=6, days=2, seed=3)
    base = labeled_pages(pages).to_pandas().sort_values("url").reset_index(drop=True)
    same = labeled_pages(pages, config=DEFAULT).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(base, same)

    cfg = JobConfig(s2_level=10, grid_cell_deg=0.5, partitions=32,
                    hex_resolutions=(6,))
    out = labeled_pages(pages, config=cfg).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert "h3_r6" in out.columns and "h3_r7" not in out.columns
    assert (out["part_key"] < 32).all()
    assert not np.array_equal(out["s2_cell"].values, base["s2_cell"].values)
    assert not np.array_equal(out["grid_cell"].values, base["grid_cell"].values)
    # labeling itself is config-sensitive too: a huge eps merges clusters
    loose = labeled_pages(pages, config=JobConfig(eps=5.0, min_samples=2))
    ld = loose.to_pandas()
    assert set(ld.columns) == set(base.columns)
