"""Deterministic synthetic world: Common-Crawl-style pages + context layers.

``BASELINE.json.input_hint`` fixes the input shape: a Parquet table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data exists, so this module synthesizes it deterministically
(seeded, reproducible byte-for-byte) at any scale, mirroring the reference's
synthetic GPS fixture geometry (/root/reference/tests/test_gps.py:76-92):
each *host* is the analog of a study participant with a "home" center and a
"work" center 0.5 deg apart; its pages' timestamps follow hour bands (night
at home, weekday office hours at work, commute hours in transit), and the
*geocode* of a page is a pure deterministic function of (url, warc_ts) —
jitter +/-0.0002 deg from the url hash, like the reference's
np.random.uniform jitter.

Host sizes are Zipf-ish so a few hot hosts hold ~10% of pages (skew for the
salting/shuffle paths). Text/html/lang are deterministic functions of the url
hash; ``text`` is the byte-identity invariant column.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = np.array(["en", "de", "fr", "es", "ja"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs how vexingly daft zebras judge sphinx of black quartz "
    "waltz bad nymph for jack quiz vow crawl web page corpus index shard "
    "tile spatial join cluster feature stream batch arrow actor".split()
)
EPOCH = np.datetime64("2019-01-01", "us")

# hour-band model (reference fixture hours: home 1-6 & 18-23, work 8-11 &
# 13-16 weekdays, commute 7/12/17)
_WORK_HOURS = frozenset([8, 9, 10, 11, 13, 14, 15, 16])
_TRANSIT_HOURS = frozenset([7, 12, 17])


def hash64(values) -> np.ndarray:
    """Deterministic vectorized string -> uint64 (pandas murmur-based
    hashing with the library-default fixed key; stable across processes).

    categorize=False: same hash values, ~5x faster on mostly-unique inputs
    (pandas' categorize pre-pass only pays off via hash64_dictionary)."""
    return pd.util.hash_array(np.asarray(values, dtype=object), categorize=False)


def hash64_dictionary(arr) -> np.ndarray:
    """uint64 hashes of an Arrow string array with FEW distinct values:
    dictionary-encode in C++ (no per-row Python objects), hash only the
    dictionary, gather — ~5x the direct path on repetitive columns like
    hosts. Identical values to hash64."""
    import pyarrow.compute as pc

    d = pc.dictionary_encode(arr)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    uniq = d.dictionary.to_numpy(zero_copy_only=False)
    return hash64(uniq)[d.indices.to_numpy()]


def host_centers(host_hash: np.ndarray):
    """home (lat, lon) per host hash; work = home + (0.5, 0.5)."""
    hh = host_hash.astype(np.uint64)
    home_lat = (hh % np.uint64(120000)).astype(np.float64) / 1000.0 - 60.0
    home_lon = ((hh // np.uint64(120000)) % np.uint64(340000)).astype(np.float64) / 1000.0 - 170.0
    return home_lat, home_lon


def geocode(host_hash: np.ndarray, url_hash: np.ndarray, ts_us: np.ndarray):
    """Deterministic geocode of pages: (host_hash, url_hash, warc_ts) -> lat, lon.

    Pure function — the geocode stage and the synthetic-world definition are
    the same thing, so every engine stage downstream is reproducible.
    """
    home_lat, home_lon = host_centers(host_hash)
    work_lat, work_lon = home_lat + 0.5, home_lon + 0.5

    ts = ts_us.astype("datetime64[us]")
    days = ts.astype("datetime64[D]")
    hour = ((ts_us // np.int64(3_600_000_000)) % 24).astype(np.int64)
    minute = ((ts_us // np.int64(60_000_000)) % 60).astype(np.int64)
    weekday = ((days.astype(np.int64) + 3) % 7).astype(np.int64)  # Monday-0; 1970-01-01 = Thu(3)

    is_weekday = weekday < 5
    at_work = is_weekday & np.isin(hour, list(_WORK_HOURS))
    in_transit = is_weekday & np.isin(hour, list(_TRANSIT_HOURS))

    frac = minute.astype(np.float64) / 59.0
    # commute 7h: home->work; 17h: work->home; 12h: at work (lunch)
    t_frac = np.where(hour == 7, frac, np.where(hour == 17, 1.0 - frac, 1.0))
    lat = np.where(at_work, work_lat, home_lat)
    lon = np.where(at_work, work_lon, home_lon)
    lat = np.where(in_transit, home_lat + 0.5 * t_frac, lat)
    lon = np.where(in_transit, home_lon + 0.5 * t_frac, lon)

    uh = url_hash.astype(np.uint64)
    j1 = ((uh & np.uint64(0xFFFFF)).astype(np.float64) / float(0xFFFFF) - 0.5) * 0.0004
    j2 = (((uh >> np.uint64(20)) & np.uint64(0xFFFFF)).astype(np.float64) / float(0xFFFFF) - 0.5) * 0.0004
    moving = in_transit
    lat = np.where(moving, lat, lat + j1)
    lon = np.where(moving, lon, lon + j2)
    return lat, lon


def _zipf_counts(n_pages: int, n_hosts: int, alpha: float = 0.5) -> np.ndarray:
    """Zipf-ish host sizes (hot hosts exercise skew paths). alpha=0.5 keeps
    the hottest host a few percent of rows — skewed enough to matter, small
    enough that one host (an unsplittable per-stream clustering unit) cannot
    serialize the whole stage."""
    w = 1.0 / np.arange(1, n_hosts + 1) ** alpha
    counts = np.floor(w / w.sum() * n_pages).astype(np.int64)
    counts = np.maximum(counts, 8)
    # cap any single host at ~1.5% of rows: a host is the unsplittable unit
    # of per-stream clustering, so an uncapped hot host becomes the straggler
    # that bounds whole-stage parallel speedup (skew note in SURVEY.md §4);
    # the overflow is spread uniformly
    cap = max(64, int(n_pages * 0.015))
    over = counts - np.minimum(counts, cap)
    counts = np.minimum(counts, cap)
    counts += over.sum() // n_hosts
    # trim/pad deterministically to hit n_pages
    diff = n_pages - counts.sum()
    counts[0] += diff
    if counts[0] < 0:
        # tiny worlds (n_pages < ~8*n_hosts): the per-host floor of 8
        # overshoots and the single-host trim went negative, which
        # crashed np.repeat — shed the deficit round-robin from the
        # tail instead (deterministic; existing worlds, where
        # counts[0] >= 0, are byte-identical)
        deficit = -int(counts[0])
        counts[0] = 0
        i = n_hosts - 1
        while deficit > 0:
            if counts[i] > 0:
                counts[i] -= 1
                deficit -= 1
            i = i - 1 if i > 1 else n_hosts - 1
    return counts


def generate_pages_table(n_pages: int, n_hosts: int = 50, days: int = 6,
                         seed: int = 42, hot_frac: float = 0.0) -> pa.Table:
    """Build the pages table in memory (deterministic; ``seed`` varies the
    host name universe). ``hot_frac`` > 0 plants a pathological hot host
    holding that fraction of ALL pages (skew stress, SURVEY §4 /
    VERDICT r2 #10) — bypassing the default 1.5% per-host cap."""
    counts = _zipf_counts(n_pages, n_hosts)
    if hot_frac > 0.0:
        want = int(n_pages * hot_frac)
        # take the surplus evenly from the others, keeping n_pages exact
        surplus = want - counts[0]
        if surplus > 0:
            take = np.minimum(counts[1:] - 8,
                              np.ceil(surplus / (n_hosts - 1)).astype(np.int64))
            taken = np.minimum(take, np.maximum(counts[1:] - 8, 0))
            cum = np.cumsum(taken)
            stop = np.searchsorted(cum, surplus)
            taken[stop + 1:] = 0
            if stop < len(taken):
                taken[stop] -= int(cum[stop] - surplus)
            counts[1:] -= taken
            counts[0] += int(taken.sum())
    hosts = np.array([f"h{seed}-{i}.example.com" for i in range(n_hosts)], dtype=object)

    total_slots = days * 1440
    host_col = np.repeat(hosts, counts)
    # per host: evenly strided minute slots over the day range
    slot_idx = np.concatenate([
        (np.arange(c) * max(1, total_slots // max(c, 1))) % total_slots
        for c in counts
    ])
    day = slot_idx // 1440
    minute_of_day = slot_idx % 1440
    ts_us = (day * 86_400_000_000 + minute_of_day * 60_000_000).astype("int64")
    warc_ts = EPOCH + ts_us.astype("timedelta64[us]")

    seq = np.concatenate([np.arange(c) for c in counts])
    urls = np.array([f"https://{h}/p{s:08d}" for h, s in zip(host_col, seq)], dtype=object)
    uh = hash64(urls)

    # text: 12 words picked by hash nibbles + the hash itself (unique, deterministic)
    nw = len(_WORDS)
    widx = np.stack([( uh >> np.uint64(4 * k) ).astype(np.int64) % nw for k in range(12)], axis=1)
    words = _WORDS[widx]
    text = np.array([" ".join(row) + f" #{u:016x}" for row, u in zip(words, uh)], dtype=object)
    # v4: three deterministic outlinks per page (hash nibbles 12-14 pick the
    # target host index 0-15) so link-extraction operators see a real,
    # skewed host link graph; anchors live only in html — `text` stays the
    # byte-identity invariant column
    l0 = ((uh >> np.uint64(48)) & np.uint64(15)).astype(np.int64)
    l1 = ((uh >> np.uint64(52)) & np.uint64(15)).astype(np.int64)
    l2 = ((uh >> np.uint64(56)) & np.uint64(15)).astype(np.int64)
    html = np.array([
        (f'<html><body><a href="https://h{seed}-{a}.example.com/">o0</a>'
         f'<a href="https://h{seed}-{b}.example.com/">o1</a>'
         f'<a href="https://h{seed}-{c}.example.com/">o2</a>'
         f'<p>{t}</p></body></html>').encode()
        for a, b, c, t in zip(l0, l1, l2, text)
    ], dtype=object)
    lang = LANGS[(uh % np.uint64(5)).astype(np.int64)]

    from .schema import PAGES
    return pa.Table.from_arrays(
        [pa.array(urls, pa.string()), pa.array(warc_ts, pa.timestamp("us")),
         pa.array(html, pa.binary()), pa.array(text, pa.large_string()),
         pa.array(lang, pa.string())],
        schema=PAGES,
    )


def ensure_pages(out_dir: str, n_pages: int, n_hosts: int = 50, days: int = 6,
                 seed: int = 42, files: int = 8, hot_frac: float = 0.0) -> str:
    """Write (once) a deterministic pages parquet dataset; returns out_dir.

    Split into ``files`` row-group-aligned part files so ray.data can
    parallelize the read.
    """
    marker = os.path.join(out_dir, "_DONE")
    hot = f" hot={hot_frac}" if hot_frac > 0.0 else ""
    stamp = f"v4 rows={n_pages} hosts={n_hosts} days={days} seed={seed}{hot}\n"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == stamp:
                return out_dir
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    t = generate_pages_table(n_pages, n_hosts=n_hosts, days=days, seed=seed,
                             hot_frac=hot_frac)
    per = max(1, t.num_rows // files)
    k = 0
    for off in range(0, t.num_rows, per):
        pq.write_table(t.slice(off, per), os.path.join(out_dir, f"part-{k:05d}.parquet"))
        k += 1
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir


def generate_polygon_layer(n_hosts: int = 50, seed: int = 42,
                           extra: int = 100) -> list[dict]:
    """Deterministic polygon context layer covering host home/work centers
    (a 'residential' and an 'office' box per host) plus ``extra`` random
    boxes — the offline replacement for the reference's Places API
    (gps.py:504-562)."""
    hosts = np.array([f"h{seed}-{i}.example.com" for i in range(n_hosts)], dtype=object)
    hlat, hlon = host_centers(hash64(hosts))
    polys = []
    for i in range(n_hosts):
        for tag, la, lo in (("residential", hlat[i], hlon[i]),
                            ("office", hlat[i] + 0.5, hlon[i] + 0.5)):
            d = 0.003
            polys.append(dict(
                place_id=f"{tag[0]}{i}", name=f"{tag}-{i}", major_category=tag,
                ring_lat=[la - d, la - d, la + d, la + d],
                ring_lon=[lo - d, lo + d, lo + d, lo - d],
            ))
    rng = np.random.default_rng(seed)
    for j in range(extra):
        la, lo = rng.uniform(-60, 60), rng.uniform(-170, 170)
        w, h = rng.uniform(0.05, 0.5, 2)
        polys.append(dict(
            place_id=f"x{j}", name=f"area-{j}", major_category="area",
            ring_lat=[la - h, la - h, la + h, la + h],
            ring_lon=[lo - w, lo + w, lo + w, lo - w],
        ))
    return polys
