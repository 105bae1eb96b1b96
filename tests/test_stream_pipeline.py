"""End-to-end per-stream kernel tests mirroring the reference's e2e suite
(/root/reference/tests/test_gps.py:592-618 and fixture generator :76-92):
synthetic home cluster at (0,0) during night hours and work cluster at
(0.5,0.5) during weekday office hours, jitter +/-0.0002 deg."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from gscap_ray.functions.stream import (
    cluster_metrics,
    cluster_times,
    clusters_with_context,
    daily_metrics,
    impute_stationary,
    next_phase_clusters,
    resample_minute,
    velocity_frame,
)


def gen_cluster(lat, lon, hours, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(1, 7):
        for h in hours:
            for m in range(60):
                rows.append(dict(
                    ts=dt.datetime(2019, 1, d, h, m),
                    lat=lat + rng.uniform(-0.0002, 0.0002),
                    lon=lon + rng.uniform(-0.0002, 0.0002),
                ))
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def home_and_work():
    home = gen_cluster(0.0, 0.0, list(range(1, 7)) + list(range(18, 24)), seed=1)
    work = gen_cluster(0.5, 0.5, list(range(8, 12)) + list(range(13, 17)), seed=2)
    df = pd.concat([home, work], sort=False).sort_values("ts").reset_index(drop=True)
    return velocity_frame(df)


def test_velocity_frame_columns(home_and_work):
    assert set(home_and_work.columns) == {
        "ts", "lat", "lon", "binning", "displacement", "time_delta", "velocity"}
    assert home_and_work["binning"].iloc[0] == "null"


def test_clusters_home_and_work(home_and_work):
    records, clusters = clusters_with_context(home_and_work)
    cids = set(clusters["cid"])
    assert "home" in cids and "work" in cids
    assert len(records) == len(home_and_work)  # conservation
    home_row = clusters.loc[clusters.cid == "home"].iloc[0]
    assert abs(home_row["lat"]) < 0.001 and abs(home_row["lon"]) < 0.001
    work_row = clusters.loc[clusters.cid == "work"].iloc[0]
    assert abs(work_row["lat"] - 0.5) < 0.001
    assert records.loc[records.cid == "home", "distance_from_home"].max() <= 500 + 1e-9


def test_work_rejected_when_far(home_and_work):
    # move work 10 degrees away -> >161 km from home -> rejected
    home = gen_cluster(0.0, 0.0, list(range(1, 7)) + list(range(18, 24)), seed=1)
    work = gen_cluster(10.5, 10.5, list(range(8, 12)) + list(range(13, 17)), seed=2)
    df = pd.concat([home, work], sort=False).sort_values("ts").reset_index(drop=True)
    records, clusters = clusters_with_context(velocity_frame(df))
    cids = set(clusters["cid"])
    assert "home" in cids and "work" not in cids


def test_work_suppressed_when_not_working(home_and_work):
    df = home_and_work.copy()
    df["working"] = False
    records, clusters = clusters_with_context(df)
    cids = set(clusters["cid"])
    assert "home" in cids and "work" not in cids


def test_small_input_all_xnot():
    df = pd.DataFrame({"lat": [0.0], "lon": [0.0],
                       "ts": [pd.Timestamp("2019-01-01")], "binning": ["stationary"]})
    records, clusters = clusters_with_context(df)
    assert clusters is None and (records["cid"] == "xNot").all()


def test_resample_minute():
    df = pd.DataFrame({
        "lat": [1.0, 3.0, 5.0], "lon": [0.0, 2.0, 4.0],
        "ts": pd.to_datetime(["2019-01-01 10:00:10", "2019-01-01 10:00:50",
                              "2019-01-01 10:02:00"]),
    })
    out = resample_minute(df)
    assert len(out) == 2
    assert out["lat"].tolist() == [2.0, 5.0]
    assert out["ts"].iloc[0] == pd.Timestamp("2019-01-01 10:00:00")


def test_impute_stationary_fills_gap():
    # two stationary points 50 minutes apart, 10 m apart -> 10Min fills 4 rows
    df = pd.DataFrame({
        "lat": [0.0, 0.00009], "lon": [0.0, 0.0],
        "ts": pd.to_datetime(["2019-01-01 10:00:00", "2019-01-01 10:50:00"]),
    })
    out = impute_stationary(df, freq="10Min")
    assert len(out) == 6
    assert out["binning"].iloc[1:].eq("stationary").all()
    # the stream's first row is a null row: the day-start fix applies but the
    # null scrub (gps.py:1734-1736) runs after it, so it ends NaN
    assert np.isnan(out["time_delta"].iloc[0])


def test_impute_day_start_fix_second_day():
    # day 2's first row gets time_delta = seconds since ITS midnight
    df = pd.DataFrame({
        "lat": [0.0, 0.0, 0.0], "lon": [0.0, 0.0, 0.0],
        "ts": pd.to_datetime(["2019-01-01 23:40:00", "2019-01-01 23:50:00",
                              "2019-01-02 07:00:00"]),
    })
    out = impute_stationary(df, freq="10Min")
    # the stationary 23:50 -> 07:00 pair is imputed at 10Min, so day 2 now
    # starts at the imputed 00:00 row; the day-start fix overrides its lag
    # time_delta (600) with seconds-since-midnight (0)
    mid = out.loc[out["ts"] == pd.Timestamp("2019-01-02 00:00:00")]
    assert mid["time_delta"].iloc[0] == 0.0
    nxt = out.loc[out["ts"] == pd.Timestamp("2019-01-02 00:10:00")]
    assert nxt["time_delta"].iloc[0] == 600.0


def test_impute_skips_moving_pairs():
    df = pd.DataFrame({
        "lat": [0.0, 1.0], "lon": [0.0, 0.0],
        "ts": pd.to_datetime(["2019-01-01 10:00:00", "2019-01-01 10:50:00"]),
    })
    out = impute_stationary(df, freq="10Min")
    assert len(out) == 2


def test_sessionize_and_metrics(home_and_work):
    records, clusters = clusters_with_context(home_and_work)
    records["date"] = records["ts"].dt.date
    entries = cluster_times(records)
    assert set(entries["cid"]).issuperset({"home", "work"})
    assert (entries["pos"] >= 1).all()
    # per (date, cid-run) entries: home appears morning + evening each day
    first_day = entries.loc[entries["date"] == dt.date(2019, 1, 1)]
    assert first_day["pos"].is_monotonic_increasing

    dm = daily_metrics(records)
    assert len(dm) == 6
    assert (dm["came_to_work"]).all()
    assert {"location_variance", "hours_of_sleep", "hours_in_home",
            "hours_in_top3"}.issubset(dm.columns)
    cm = cluster_metrics(clusters, entries)
    assert "times_entered" in cm.columns
    assert set(cm["cid"]).issuperset({"home", "work"})


def test_sessionize_midnight_merge():
    # same cid across midnight: previous day's last entry extends to 23:59:59
    ts = pd.to_datetime(["2019-01-01 23:00:00", "2019-01-01 23:30:00",
                         "2019-01-02 00:10:00", "2019-01-02 00:40:00"])
    df = pd.DataFrame({"ts": ts, "lat": 0.0, "lon": 0.0,
                       "binning": "stationary", "cid": "x0",
                       "date": [t.date() for t in ts]})
    entries = cluster_times(df)
    assert len(entries) == 2
    assert entries["time_out"].iloc[0] == pd.Timestamp("2019-01-01 23:59:59")
    assert entries["time_in"].iloc[1] == pd.Timestamp("2019-01-02 00:00:00")


def test_next_phase_clusters(home_and_work):
    records, clusters = clusters_with_context(home_and_work)
    # inject a new dense blob far from existing clusters on day 1
    rng = np.random.default_rng(3)
    blob = pd.DataFrame({
        "ts": pd.to_datetime([f"2019-01-01 12:{m:02d}:{s:02d}"
                              for m in range(30) for s in range(0, 60, 12)]),
        "lat": 0.25 + rng.uniform(-0.0002, 0.0002, 150),
        "lon": 0.25 + rng.uniform(-0.0002, 0.0002, 150),
        "binning": "stationary", "cid": "xNot",
        "displacement": 0.0, "time_delta": 12.0, "velocity": 0.0,
        "distance_from_home": np.nan,
    })
    allr = pd.concat([records, blob], sort=False).sort_values("ts", kind="stable")
    r2, c2 = next_phase_clusters(allr, clusters, min_samples=100)
    new = set(c2["cid"]) - set(clusters["cid"])
    assert len(new) == 1
    ncid = new.pop()
    assert (r2["cid"] == ncid).sum() >= 100


def test_cluster_metrics_unit_safe_midpoints():
    """cluster_times emits datetime64[us] midpoints; the mean interval
    between visits must be identical whether the entries frame carries
    us- or ns-resolution timestamps (the old ns-assuming astype read us
    values 1000x too small)."""
    import numpy as np
    import pandas as pd

    from gscap_ray.functions.stream import cluster_metrics

    base = np.datetime64("2020-01-01T00:00:00", "us")
    mids_us = base + np.array([0, 7200, 14400], "timedelta64[s]")
    entries = pd.DataFrame({
        "cid": ["home"] * 3,
        "midpoint": mids_us,                       # datetime64[us]
        "duration": pd.to_timedelta([600, 600, 600], unit="s"),
    })
    clusters = pd.DataFrame({"cid": ["home"], "lat": [0.0], "lon": [0.0]})
    out_us = cluster_metrics(clusters, entries)
    assert out_us["mean_ti_between_visits"].iloc[0] == 2.0  # hours

    entries_ns = entries.assign(
        midpoint=entries["midpoint"].astype("datetime64[ns]"))
    out_ns = cluster_metrics(clusters, entries_ns)
    assert out_ns["mean_ti_between_visits"].iloc[0] == 2.0
