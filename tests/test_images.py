"""PPM decode / resize / feature kernels (real multimodal decode path)."""

import numpy as np

from gscap_ray.functions.images import (
    channel_stats,
    decode_ppm,
    encode_ppm,
    resize_bilinear,
    synth_pixels,
)


def test_ppm_roundtrip():
    img = synth_pixels(7)
    assert img.shape == (16, 16, 3)
    back = decode_ppm(encode_ppm(img))
    assert np.array_equal(img, back)


def test_ppm_header_with_comment():
    img = synth_pixels(3)
    data = b"P6\n# a comment\n16 16\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(data), img)


def test_resize_constant_and_shape():
    img = np.full((16, 16, 3), 100, np.uint8)
    out = resize_bilinear(img, 8, 8)
    assert out.shape == (8, 8, 3)
    assert (out == 100).all()  # bilinear of a constant is constant
    up = resize_bilinear(img, 32, 32)
    assert up.shape == (32, 32, 3) and (up == 100).all()


def test_channel_stats_match_formula():
    img = synth_pixels(5)
    st = channel_stats(img)
    # recompute the mean directly from the generator formula
    vals = [(5 * 31 + x * 7 + y * 13) % 256 for x in range(16) for y in range(16)]
    assert st["r_mean"] == round(sum(vals) / 256, 4)
    assert st["px_min"] == int(img.min())


def test_image_features_matches_oracle(ray_session):
    import sys
    from pathlib import Path

    import duckdb

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from check_correctness import compare, to_pandas

    from gscap_ray.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    r = to_pandas(QUERIES["image_features"](sf))
    s = con.sql(ORACLE_SQL["image_features"]).df()
    assert compare("image_features", r, s) is None
