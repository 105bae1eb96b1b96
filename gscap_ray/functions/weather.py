"""Weather-style hourly report expansion + daily summarize (S3/A5/C10).

Engine analog of the reference's DarkSky path (/root/reference/gscap/
weather.py:405-489): each request (grid cell, date) expands to a 24-row
hourly report; a failed lookup yields ONE all-NaN sentinel row with
hour=12 (weather.py:467-475). The daily summary (weather.py:349-402)
computes nan-aware median/IQR (np.nanpercentile interpolation='nearest'),
mean, population std for cloudCover/dewPoint/humidity/temperature plus the
precip sum, all rounded to 2 dp (weather.py:300-304).

The offline "weather service" is a deterministic integer-arithmetic
function of (cell, epoch-day, hour) so the DuckDB oracle can reproduce it
exactly; cells where cell % 13 == 0 deterministically "fail" (the sentinel
path). numpy's 'nearest' percentile rounds the virtual index half-to-even —
the oracle mirrors it with round_even(q*(n-1), 0).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

FAIL_MOD = 13

from collections import namedtuple  # noqa: E402

WeatherRequest = namedtuple("WeatherRequest", ["lat", "lon", "city", "date"])


def coerce_request_key(key):
    """check_zipcode_type semantics (utils.py:231-243): str/int/float ->
    int; non-numeric strings TypeError; negatives ValueError."""
    def _isint(x):
        try:
            return float(str(x)) == int(float(str(x)))
        except (TypeError, ValueError, OverflowError):
            # OverflowError: int(float('inf')) — 'inf'/'1e400' are
            # non-usable strings and must surface as the documented
            # TypeError, not leak OverflowError
            return False

    if not isinstance(key, (str, int, float)) or \
            (isinstance(key, str) and not _isint(key)):
        raise TypeError
    if isinstance(key, (str, float)):
        key = int(float(key))
    if key < 0:
        raise ValueError
    return key


def normalize_requests(requests):
    """verify_request permutations (weather.py:500-560): a single tuple or
    a list; 2-tuples are (city, datetime) in any element order (exact-key
    gazetteer lookup, None-skip on the (0,0) sentinel — dd_from_zip
    semantics); 3-tuples are (lat, lon, datetime) in any order with the
    reference's check order (range check precedes the None check, so a
    missing lat raises TypeError exactly like the reference's
    ``None < -90``); other sizes ValueError."""
    import datetime as dt

    from .gazetteer import city_from_dd, dd_from_city

    if not isinstance(requests, list):
        requests = [requests]

    def one(r):
        if len(r) == 2:
            city, d = None, None
            for i in r:
                if isinstance(i, str):
                    city = i
                elif isinstance(i, dt.datetime):
                    d = i
            if d is None or city is None:
                raise ValueError("a 2-request needs (city, datetime)")
            lat, lon = dd_from_city(city)
            if lat == lon == 0 and city != "utc_island":
                return None  # unknown key -> skip (weather.py:531-534)
            return WeatherRequest(lat=lat, lon=lon, city=city, date=d)
        if len(r) == 3:
            lat, lon, d = None, None, None
            for i in r:
                if isinstance(i, (int, float)):
                    if lat is None:
                        lat = float(i)
                    elif lon is None:
                        lon = float(i)
                elif isinstance(i, dt.datetime):
                    d = i
            if lat < -90 or lat > 90 or lon < -180 or lon > 180:
                raise ValueError("lat, lon must be in a valid range")
            if d is None:
                raise ValueError("a 3-request needs a datetime")
            city = city_from_dd(lat, lon, max_distance_deg=30.0)[0]
            return WeatherRequest(lat=lat, lon=lon, city=city, date=d)
        raise ValueError("Only tuples of size 2 or 3 are permitted")

    return [one(r) for r in requests]
MEASURES = ("temperature", "humidity", "cloudCover", "dewPoint",
            "precipIntensity",
            # full hourly breadth (reference weather.py:46-53 HOURLY_COLS;
            # the daily summary consumes only the 5 above — these ride
            # along so a reference user keeps every numeric measure)
            "precipProbability", "apparentTemperature", "pressure",
            "windSpeed", "windBearing", "uvIndex", "visibility", "ozone",
            "windGust",
            # error/accumulation columns completing HOURLY_COLS' numerics
            "precipAccumulation", "temperatureError", "pressureError",
            "cloudCoverError", "windSpeedError", "windBearingError")

# categorical HOURLY_COLS (precipType/summary/icon) are derived from the
# numeric grid in expand_hourly when requested


def weather_cell(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """1-degree grid cell id (the request dedup key, D1/D3).

    lon = +180 wraps to -180 (the antimeridian identity) BEFORE encoding:
    floor(180+180) = 360 with the 360-column multiplier would collide
    with the next latitude row's lon = -180 cell, merging two distinct
    requests under one dedup key. Ids for lon < 180 are unchanged."""
    lon = np.where(np.asarray(lon, dtype=np.float64) >= 180.0,
                   np.asarray(lon, dtype=np.float64) - 360.0, lon)
    return (np.floor(lat + 90).astype(np.int64) * 360
            + np.floor(lon + 180).astype(np.int64))


def hourly_values(cell: np.ndarray, d: np.ndarray, hour: np.ndarray,
                  measures: tuple = MEASURES) -> dict:
    """Deterministic hourly measures (integer arithmetic, SQL-replicable).
    Only the requested ``measures`` are computed."""
    c, dd, h = (cell.astype(np.int64), d.astype(np.int64),
                hour.astype(np.int64))
    need = set(measures)
    temp = (((c * 31 + h * 7 + dd * 13) % 400) / 10.0 - 10.0
            if need & {"temperature", "dewPoint", "apparentTemperature"}
            else None)
    wind = (((c * 19 + h * 3 + dd * 5) % 300) / 10.0
            if need & {"windSpeed", "windGust"} else None)
    fns = {
        "temperature": lambda: temp,
        "humidity": lambda: ((c * 17 + h * 5 + dd * 3) % 101) / 100.0,
        "cloudCover": lambda: ((c * 23 + h * 11 + dd * 7) % 101) / 100.0,
        "dewPoint": lambda: temp - ((c * 7 + h) % 50) / 10.0,
        "precipIntensity": lambda: ((c * 41 + h * 13 + dd * 17) % 100) / 1000.0,
        "precipProbability": lambda: ((c * 43 + h * 19 + dd * 11) % 101) / 100.0,
        "apparentTemperature": lambda: temp - ((c * 11 + h * 2) % 30) / 10.0,
        "pressure": lambda: 980.0 + ((c * 13 + h * 17 + dd * 23) % 600) / 10.0,
        "windSpeed": lambda: wind,
        "windBearing": lambda: ((c * 29 + h * 23 + dd * 31) % 360) / 1.0,
        "uvIndex": lambda: ((c * 3 + h * 13 + dd) % 12) / 1.0,
        "visibility": lambda: ((c * 37 + h * 29 + dd * 41) % 161) / 10.0,
        "ozone": lambda: 250.0 + ((c * 47 + h * 31 + dd * 37) % 1500) / 10.0,
        "windGust": lambda: wind + ((c * 5 + h * 7 + dd * 3) % 80) / 10.0,
        "precipAccumulation": lambda: ((c * 53 + h * 37 + dd * 43) % 120) / 10.0,
        "temperatureError": lambda: ((c * 59 + h * 41 + dd * 47) % 30) / 10.0,
        "pressureError": lambda: ((c * 61 + h * 43 + dd * 53) % 50) / 10.0,
        "cloudCoverError": lambda: ((c * 67 + h * 47 + dd * 59) % 21) / 100.0,
        "windSpeedError": lambda: ((c * 71 + h * 53 + dd * 61) % 40) / 10.0,
        "windBearingError": lambda: ((c * 73 + h * 59 + dd * 67) % 90) / 1.0,
    }
    return {m: fns[m]() for m in measures}


def expand_hourly(cell: np.ndarray, d: np.ndarray,
                  measures: tuple = MEASURES,
                  categoricals: bool = False) -> pd.DataFrame:
    """Requests -> hourly rows: 24 per ok request, 1 NaN sentinel (hour=12)
    per failed request (weather.py:458-475 semantics). ``measures`` limits
    which columns are computed (the daily summary consumes 5 of the 20 —
    compute-pruning mirrors column-pruning at the read). ``categoricals``
    adds the string HOURLY_COLS (precipType from a hash grid; summary/icon
    from cloudCover buckets), NULL on sentinel rows."""
    cell = cell.astype(np.int64)
    d = d.astype(np.int64)
    fail = (cell % FAIL_MOD) == 0
    okc, okd = cell[~fail], d[~fail]
    n = okc.shape[0]
    rc = np.repeat(okc, 24)
    rd = np.repeat(okd, 24)
    rh = np.tile(np.arange(24, dtype=np.int64), n)
    # forward the pruning: only the requested measures are computed (the
    # categoricals path additionally needs cloudCover for its buckets)
    comp = tuple(measures)
    if categoricals and "cloudCover" not in comp:
        comp = comp + ("cloudCover",)
    vals = hourly_values(rc, rd, rh, comp)
    fc, fd = cell[fail], d[fail]
    out = {
        "cell": np.concatenate([rc, fc]),
        "d": np.concatenate([rd, fd]),
        "hour": np.concatenate([rh, np.full(fc.shape[0], 12, np.int64)]),
    }
    for m in measures:
        out[m] = np.concatenate([vals[m], np.full(fc.shape[0], np.nan)])
    df = pd.DataFrame(out)
    if categoricals:
        nf = fc.shape[0]
        ptype_code = (rc * 79 + rh * 61 + rd * 71) % 3
        ptype = np.array(["rain", "snow", "sleet"], dtype=object)[ptype_code]
        cc = vals["cloudCover"]  # requested above when categoricals
        sm_code = np.where(cc < 0.25, 0, np.where(cc < 0.75, 1, 2))
        summary = np.array(["clear", "partly cloudy", "cloudy"],
                           dtype=object)[sm_code]
        icon = np.array(["clear-day", "partly-cloudy-day", "cloudy"],
                        dtype=object)[sm_code]
        sent = np.full(nf, None, dtype=object)
        df["precipType"] = np.concatenate([ptype, sent])
        df["summary"] = np.concatenate([summary, sent])
        df["icon"] = np.concatenate([icon, sent])
    df["date"] = ((df["d"].values * np.int64(86_400_000_000))
                  .astype("datetime64[us]").astype("datetime64[D]").astype(str))
    return df.drop(columns=["d"])


def _nearest_q(v: np.ndarray, qs=(25, 50, 75)):
    valid = ~np.isnan(v)
    if not valid.any():
        return [np.nan] * len(qs)
    return list(np.nanpercentile(v, list(qs), method="nearest"))


def _int_stats(v: np.ndarray, scale: float, offset: float):
    """Mean/std via exact integer sums so the result double is identical
    no matter the aggregation order (measures are k/scale grids; float
    summation order would otherwise flip 2-dp rounding at decimal ties
    between the Ray and DuckDB sides). The expression shapes here are
    mirrored verbatim in the oracle SQL."""
    valid = ~np.isnan(v)
    if not valid.any():
        return np.nan, np.nan
    k = np.rint((v[valid] + offset) * scale).astype(np.int64)
    n = int(k.shape[0])
    s = int(k.sum())
    s2 = int((k * k).sum())
    mean = s / (n * scale) - offset
    std = np.sqrt(max(s2 / n - (s / n) * (s / n), 0.0)) / scale
    return np.round(mean, 2), np.round(std, 2)


def _report_stats(vals: dict) -> dict:
    """weather.py:349-402 vstats for ONE (cell, date) report's arrays —
    returns scalars in the output column order."""
    out = {}
    for col, pre, scale, offset in (
            ("cloudCover", "cloud_cover", 100.0, 0.0),
            ("dewPoint", "dew_point", 10.0, 10.0),
            ("humidity", "humidity", 100.0, 0.0)):
        v = vals[col]
        q25, q50, q75 = _nearest_q(v)
        mean, std = _int_stats(v, scale, offset)
        out[f"{pre}_mean"] = mean
        out[f"{pre}_std"] = std
        out[f"{pre}_median"] = np.round(q50, 2)
        out[f"{pre}_IQR"] = np.round(q75 - q25, 2)
    v = vals["temperature"]
    q25, q50, q75 = _nearest_q(v)
    mean, std = _int_stats(v, 10.0, 10.0)
    p = vals["precipIntensity"]
    pv = ~np.isnan(p)
    psum = int(np.rint(p[pv] * 1000).astype(np.int64).sum()) if pv.any() else 0
    out["precip_sum"] = np.round(psum / 1000.0, 2)
    out["temp_mean"] = mean
    out["temp_std"] = std
    out["temp_med"] = np.round(q50, 2)
    out["temp_IQR"] = np.round(q75 - q25, 2)
    return out


_DAILY_COLS = ("cloudCover", "dewPoint", "humidity", "temperature",
               "precipIntensity")


def _negzero_fix(df: pd.DataFrame) -> pd.DataFrame:
    # np.round(-0.004, 2) yields -0.0; DuckDB's round_even yields +0.0.
    # Equal numerically but different bytes — normalize so a byte-level
    # hash of the result matches the oracle. (+0.0 maps -0.0 to +0.0.)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].values + 0.0
    return df


def summarize_daily(g: pd.DataFrame) -> pd.DataFrame:
    """One (cell, date) report -> one summary row."""
    st = _report_stats({c: g[c].values.astype(np.float64)
                        for c in _DAILY_COLS})
    out = {"cell": [int(g["cell"].iloc[0])], "date": [g["date"].iloc[0]],
           **{k: [v] for k, v in st.items()}}
    return _negzero_fix(pd.DataFrame(out))


def summarize_daily_partition(g: pd.DataFrame) -> pd.DataFrame:
    """Many (cell, date) reports per hash partition -> summary rows.

    The per-report pandas DataFrame construction (one per group under
    ``groupby(cell, date).map_groups``) dominated the stage at sf0.1
    (~40k groups); here one lexsort segments the partition and the numpy
    report kernel runs per slice, emitting ONE DataFrame per partition."""
    if len(g) == 0:
        return pd.DataFrame()
    cells = g["cell"].values.astype(np.int64)
    dcodes, dkeys = pd.factorize(g["date"].values)
    order = np.lexsort((dcodes, cells))
    cs, dc = cells[order], dcodes[order]
    cols = {c: g[c].values[order].astype(np.float64) for c in _DAILY_COLS}
    key = cs * np.int64(len(dkeys) + 1) + dc
    bounds = np.flatnonzero(np.diff(key))
    starts = np.concatenate([[0], bounds + 1])
    ends = np.concatenate([bounds + 1, [len(key)]])
    out_cell, out_date, acc = [], [], None
    for s, e in zip(starts, ends):
        st = _report_stats({c: v[s:e] for c, v in cols.items()})
        if acc is None:
            acc = {k: [] for k in st}
        out_cell.append(int(cs[s]))
        out_date.append(dkeys[dc[s]])
        for k, v in st.items():
            acc[k].append(v)
    return _negzero_fix(pd.DataFrame(
        {"cell": np.asarray(out_cell, np.int64), "date": out_date, **acc}))
