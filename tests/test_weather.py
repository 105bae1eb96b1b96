"""Weather hourly-expansion + daily-summary kernels (reference
weather.py:349-489 semantics; goldens mirror tests/test_weather.py:269-303's
constant-input and 404->NaN-sentinel cases)."""

import numpy as np
import pandas as pd

from gscap_ray.functions.weather import (
    FAIL_MOD,
    expand_hourly,
    summarize_daily,
    weather_cell,
)


def test_expand_ok_and_sentinel():
    # cell 27 is ok (27 % 13 != 0); cell 26 = 2*FAIL_MOD fails
    cells = np.array([27, 2 * FAIL_MOD], dtype=np.int64)
    days = np.array([17897, 17897], dtype=np.int64)
    df = expand_hourly(cells, days)
    ok = df[df["cell"] == 27]
    bad = df[df["cell"] == 2 * FAIL_MOD]
    # 24-row hourly report (weather.py:458-466)
    assert len(ok) == 24
    assert sorted(ok["hour"]) == list(range(24))
    assert not ok["temperature"].isna().any()
    # failure -> ONE all-NaN row at hour 12 (weather.py:467-475)
    assert len(bad) == 1
    assert int(bad["hour"].iloc[0]) == 12
    assert bad[["temperature", "humidity", "cloudCover", "dewPoint",
                "precipIntensity"]].isna().all().all()


def test_summarize_constant_input():
    # constant 0.5 measures -> mean/median 0.5, std/IQR 0 (the reference's
    # test_weather.py:269-303 golden shape)
    g = pd.DataFrame({
        "cell": 1, "date": "2019-01-02", "hour": range(24),
        "temperature": 0.5, "humidity": 0.5, "cloudCover": 0.5,
        "dewPoint": 0.5, "precipIntensity": 0.5,
    })
    out = summarize_daily(g)
    assert float(out["humidity_mean"].iloc[0]) == 0.5
    assert float(out["humidity_median"].iloc[0]) == 0.5
    assert float(out["humidity_std"].iloc[0]) == 0.0
    assert float(out["humidity_IQR"].iloc[0]) == 0.0
    assert float(out["temp_med"].iloc[0]) == 0.5
    assert float(out["precip_sum"].iloc[0]) == 12.0


def test_summarize_all_nan_sentinel():
    g = pd.DataFrame({
        "cell": [13], "date": ["2019-01-02"], "hour": [12],
        "temperature": [np.nan], "humidity": [np.nan],
        "cloudCover": [np.nan], "dewPoint": [np.nan],
        "precipIntensity": [np.nan],
    })
    out = summarize_daily(g)
    assert np.isnan(out["temp_mean"].iloc[0])
    assert np.isnan(out["humidity_median"].iloc[0])
    assert float(out["precip_sum"].iloc[0]) == 0.0  # np.sum([]) semantics


def test_weather_cell_grid():
    c = weather_cell(np.array([-90.0, 0.0, 89.5]), np.array([-180.0, 0.0, 179.5]))
    assert c.tolist() == [0, 90 * 360 + 180, 179 * 360 + 359]


def test_request_normalization_permutations():
    """verify_request permutations (reference tests/test_weather.py:121-135
    shape): element order free, skip-on-unknown, range/size errors."""
    import datetime as dt

    import pytest

    from gscap_ray.functions.weather import (
        WeatherRequest,
        coerce_request_key,
        normalize_requests,
    )

    d = dt.datetime(2019, 1, 2)
    # 2-tuple, both element orders
    r1 = normalize_requests(("tokyo", d))[0]
    r2 = normalize_requests([(d, "tokyo")])[0]
    assert r1 == r2 and r1.city == "tokyo" and abs(r1.lat - 35.6762) < 1e-9
    # unknown city -> None skip (dd_from_zip (0,0) sentinel semantics)
    assert normalize_requests(("atlantis", d)) == [None]
    # 3-tuple, order free; first float is lat, second lon
    r3 = normalize_requests((35.68, 139.65, d))[0]
    r4 = normalize_requests((d, 35.68, 139.65))[0]
    assert r3 == r4 and r3.city == "tokyo"
    assert isinstance(r3, WeatherRequest)
    # range violations
    with pytest.raises(ValueError):
        normalize_requests((95.0, 0.0, d))
    # missing lat -> TypeError (reference's None < -90 quirk)
    with pytest.raises(TypeError):
        normalize_requests(("x", "y", d))
    # wrong arity
    with pytest.raises(ValueError):
        normalize_requests((1, 2, 3, d))
    # key coercion (check_zipcode_type semantics)
    assert coerce_request_key("47579") == 47579
    assert coerce_request_key(12.0) == 12
    with pytest.raises(TypeError):
        coerce_request_key("abc")
    with pytest.raises(ValueError):
        coerce_request_key(-5)


def test_partition_summary_equals_per_group():
    """The fused partition kernel must emit byte-identical rows to the
    per-(cell, date) path for every report in a mixed partition."""
    from gscap_ray.functions.weather import (
        expand_hourly,
        summarize_daily,
        summarize_daily_partition,
    )

    cells = np.array([1, 2, 13, 26, 7, 7], dtype=np.int64)
    days = np.array([17897, 17897, 17898, 17899, 17897, 17898], dtype=np.int64)
    hourly = expand_hourly(cells, days)

    fused = (summarize_daily_partition(hourly)
             .sort_values(["cell", "date"]).reset_index(drop=True))
    per_group = (pd.concat([summarize_daily(g) for _, g in
                            hourly.groupby(["cell", "date"], sort=True)],
                           ignore_index=True)
                 .sort_values(["cell", "date"]).reset_index(drop=True))
    assert list(fused.columns) == list(per_group.columns)
    for c in fused.columns:
        a, b = fused[c].values, per_group[c].values
        if a.dtype.kind == "f":
            assert (a.view(np.uint64) == b.view(np.uint64)).all(), c
        else:
            assert (a == b).all(), c
