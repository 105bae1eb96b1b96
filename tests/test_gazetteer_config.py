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
