"""Property tests for round-2 kernels (places cascade, weather expansion,
image codec, md5 text kernels)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gscap_ray.functions.images import decode_ppm, encode_ppm, resize_bilinear
from gscap_ray.functions.places import (
    IGNORED_PLACE_TYPES,
    MAJOR_TYPES,
    normalize_gmap_types,
)
from gscap_ray.functions.text import md5_token_hash64, rolling_fingerprint
from gscap_ray.functions.weather import FAIL_MOD, expand_hourly

_TYPE_POOL = sorted(MAJOR_TYPES) + ["campground", "museum", "gas_station",
                                    "cafe", "bank", "zoo", "spa", "unknown_x"]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(_TYPE_POOL), min_size=1, max_size=4),
       st.sampled_from(["x", "Target", "Fred Meyer"]))
def test_cascade_total_and_deterministic(types, name):
    """The cascade is total (never raises), deterministic, and its outputs
    are non-empty comma-joined strings."""
    r1 = normalize_gmap_types(name, types)
    r2 = normalize_gmap_types(name, list(reversed(types)))
    assert r1 == r2  # set semantics: element order never matters
    cats, major = r1
    assert cats and major


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(sorted(IGNORED_PLACE_TYPES)), min_size=1,
                max_size=3),
       st.lists(st.sampled_from(_TYPE_POOL), min_size=0, max_size=2))
def test_cascade_skip_on_any_ignored(ignored, extra):
    assert normalize_gmap_types("x", ignored + extra) is None


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 100_000), min_size=1, max_size=30, unique=True),
       st.integers(17_800, 18_000))
def test_weather_expansion_conservation(cells, day):
    """Row conservation: 24 rows per ok request, exactly 1 per failed one;
    hours are complete and measures finite for ok cells."""
    c = np.array(cells, dtype=np.int64)
    d = np.full(c.shape[0], day, dtype=np.int64)
    df = expand_hourly(c, d)
    n_fail = int((c % FAIL_MOD == 0).sum())
    assert len(df) == (len(cells) - n_fail) * 24 + n_fail
    ok = df[df["cell"] % FAIL_MOD != 0]
    if len(ok):
        assert ok.groupby("cell")["hour"].nunique().eq(24).all()
        assert np.isfinite(ok["temperature"]).all()
        assert ok["humidity"].between(0, 1).all()


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 1 << 40), st.integers(2, 24), st.integers(2, 24))
def test_ppm_roundtrip_and_resize_bounds(img_id, h, w):
    rng = np.random.default_rng(img_id % (2**32))
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    out = resize_bilinear(img, 8, 8)
    # interpolation never exceeds the input range
    assert out.min() >= img.min() and out.max() <= img.max()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=33,
                                               max_codepoint=126),
                        min_size=1, max_size=8),
                min_size=0, max_size=20))
def test_fingerprint_deterministic_and_order_sensitive(tokens):
    txt = np.array([" ".join(tokens)], dtype=object)
    f1 = rolling_fingerprint(txt)
    f2 = rolling_fingerprint(txt)
    assert f1[0] == f2[0]
    if len(set(tokens)) > 1 and tokens != tokens[::-1]:
        rev = np.array([" ".join(reversed(tokens))], dtype=object)
        # rolling hash is order-sensitive (unlike a bag hash)
        assert rolling_fingerprint(rev)[0] != f1[0] or len(tokens) < 2


def test_md5_token_hash_matches_duckdb():
    import duckdb

    toks = ["hello", "WORLD", "Füße", "a b", "123"]
    want = md5_token_hash64(toks)
    con = duckdb.connect()
    got = [con.execute("SELECT md5_number_lower(?)", [t]).fetchone()[0]
          for t in toks]
    assert [int(v) for v in want] == [int(g) for g in got]
