"""Tests for text-analysis, dedup and ANN kernels."""

import numpy as np

from gscap_ray.functions.ann import (
    cosine_pairs_above,
    cosine_topk,
    hyperplane_lsh_codes,
    ivf_assign,
    normalize,
)
from gscap_ray.functions.dedup import (
    exact_key,
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    shingle_hashes,
    simhash64,
    window_hashes,
)
from gscap_ray.functions.text import (
    bigram_repetition,
    detect_language,
    gopher_quality,
    quality_features,
    rolling_fingerprint,
    stopword_ratio,
    token_counts,
)

RNG = np.random.default_rng(99)


def test_token_counts():
    t = np.array(["a b  c", "", "   ", "one"], dtype=object)
    assert token_counts(t).tolist() == [3, 0, 0, 1]


def test_stopword_ratio():
    t = np.array(["the cat and the dog", "zebra quartz"], dtype=object)
    r = stopword_ratio(t)
    assert r[0] == 0.6 and r[1] == 0.0


def test_quality_features():
    q = quality_features(np.array(["Hello world 42", ""], dtype=object))
    assert q["n_tokens"].tolist() == [3, 0]
    assert q["digit_ratio"][0] > 0 and q["alpha_ratio"][1] == 0.0


def test_gopher_quality_gates():
    good = " ".join(
        ["the children walked across the meadow and it was pleasant for everyone"] * 5)
    few_words = "the cat and it was here"                      # < 50 words
    no_alpha = " ".join(["123 456"] * 30)                      # 0 alpha words
    no_stops = " ".join(["zebra quartz lion tiger puma"] * 12) # 0 stop hits
    long_words = " ".join(["antidisestablishmentarianism"] * 60)  # mean len > 10
    q = gopher_quality(np.array(
        [good, few_words, no_alpha, no_stops, long_words, "", "   "],
        dtype=object))
    assert q["keep"].tolist() == [1, 0, 0, 0, 0, 0, 0]
    assert q["n_words"].tolist()[5:] == [0, 0]
    assert q["n_alpha_words"][2] == 0 and q["n_stop_hits"][3] == 0
    # stopword counting is token-equality: 'The' counts, 'theory' doesn't
    q2 = gopher_quality(np.array(["The theory of the atom", "a and are"],
                                 dtype=object))
    assert q2["n_stop_hits"].tolist() == [3, 3]
    assert q2["n_alpha_words"].tolist() == [5, 3]
    assert q2["word_chars"].tolist() == [len("Thetheoryoftheatom"), 7]


def test_bigram_repetition():
    f = bigram_repetition(np.array(
        ["a b a b a b a b c",      # top bigram 'a b' x4 of 8 -> drop
         "w w w w w w",            # 'w w' x5 of 5 -> drop
         "the cat sat on the mat near the cat again ok fine",  # no dominant
         "", "   ", "solo"],       # degenerate: 0 bigrams -> keep
        dtype=object))
    assert f["n_bigrams"].tolist() == [8, 5, 11, 0, 0, 0]
    assert f["top_bigram_count"].tolist() == [4, 5, 2, 0, 0, 0]
    assert f["keep"].tolist() == [0, 0, 1, 1, 1, 1]
    # pairs never cross document boundaries: 'b'|'c' vs 'c'|'b' docs
    g = bigram_repetition(np.array(["b c b c b", "c b"], dtype=object))
    assert g["top_bigram_count"].tolist() == [2, 1]


def test_detect_language():
    t = np.array([
        "the cat is on the mat and it is happy",
        "der hund ist nicht mit der katze und das ist gut",
        "le chat est dans la maison et les oiseaux",
        "el perro es de la casa y los gatos no",
        "これは日本語のテキストです",
    ], dtype=object)
    assert detect_language(t).tolist() == ["en", "de", "fr", "es", "ja"]


def test_fingerprint_deterministic_order_sensitive():
    a = rolling_fingerprint(np.array(["a b c", "a b c", "c b a"], dtype=object))
    assert a[0] == a[1] and a[0] != a[2]


def test_exact_key_and_shingles():
    k = exact_key(np.array(["x", "x", "y"], dtype=object))
    assert k[0] == k[1] != k[2]
    s1 = shingle_hashes("the quick brown fox jumps".split())
    s2 = shingle_hashes("the quick brown fox leaps".split())
    assert 0 < jaccard(s1, s2) < 1
    assert jaccard(s1, s1) == 1.0


def test_window_hashes():
    toks = "a b c d e f g h i".split()          # 9 tokens -> 2 windows of 8
    w = window_hashes(toks, 8)
    assert w.size == 2 and w.dtype == np.uint64
    assert window_hashes("a b c".split(), 8).size == 0   # < k tokens: none
    # repeated window within one doc counts once (distinct)
    rep = window_hashes(("x " * 20).split(), 8)
    assert rep.size == 1
    # shared 8-token span across docs -> common hash
    a = window_hashes("p q r s t u v w extra1".split(), 8)
    b = window_hashes("other p q r s t u v w".split(), 8)
    assert np.intersect1d(a, b).size == 1


def test_minhash_estimates_jaccard():
    base = [f"w{i}" for i in range(200)]
    a_toks = base
    b_toks = base[:150] + [f"v{i}" for i in range(50)]
    sa = shingle_hashes(a_toks)
    sb = shingle_hashes(b_toks)
    true_j = jaccard(sa, sb)
    ma = minhash_signature(sa, n_perm=128)
    mb = minhash_signature(sb, n_perm=128)
    est = (ma == mb).mean()
    assert abs(est - true_j) < 0.15


def test_lsh_bands_collide_for_near_dups():
    toks = [f"w{i}" for i in range(300)]
    sa = minhash_signature(shingle_hashes(toks))
    sb = minhash_signature(shingle_hashes(toks[:295] + ["x"] * 5))
    sc = minhash_signature(shingle_hashes([f"z{i}" for i in range(300)]))
    ba, bb, bc = lsh_band_keys(sa), lsh_band_keys(sb), lsh_band_keys(sc)
    assert (ba == bb).any()          # near-dup shares >=1 band
    assert not (ba == bc).any()      # unrelated shares none


def test_simhash_hamming():
    a = simhash64("the quick brown fox jumps over the lazy dog".split())
    b = simhash64("the quick brown fox jumps over the lazy cat".split())
    c = simhash64("completely different words entirely unrelated content here".split())
    assert hamming64(np.array([a]), np.array([b]))[0] < hamming64(np.array([a]), np.array([c]))[0]
    assert hamming64(np.array([a]), np.array([a]))[0] == 0


def test_cosine_topk_exact():
    corpus = RNG.standard_normal((500, 16))
    ids = np.arange(1000, 1500)
    q = corpus[[3, 77]] + RNG.standard_normal((2, 16)) * 0.01
    top_ids, scores = cosine_topk(q, corpus, ids, k=5)
    assert top_ids[0, 0] == 1003 and top_ids[1, 0] == 1077
    # exact check vs full computation
    full = normalize(q) @ normalize(corpus).T
    want = np.argsort(-full[0], kind="stable")[:5]
    assert top_ids[0].tolist() == ids[want].tolist()
    assert np.all(np.diff(scores, axis=1) <= 1e-12)


def test_cosine_pairs_above():
    e = RNG.standard_normal((100, 8))
    e[50] = e[10] * 2.0  # same direction -> cos = 1
    ids = np.arange(100)
    a, b, s = cosine_pairs_above(e, ids, threshold=0.999)
    assert (10, 50) in set(zip(a.tolist(), b.tolist()))
    # brute-force check
    full = normalize(e) @ normalize(e).T
    iu = np.triu_indices(100, k=1)
    want = int((full[iu] > 0.999).sum())
    assert len(a) == want


def test_lsh_codes_and_ivf():
    e = RNG.standard_normal((200, 16))
    e[100:] = e[:100] + RNG.standard_normal((100, 16)) * 0.01
    codes = hyperplane_lsh_codes(e)
    assert (codes[:100] == codes[100:]).mean() > 0.7
    assign, cent = ivf_assign(e, n_cells=8)
    assert assign.shape == (200,) and cent.shape[0] == 8
    assert (assign[:100] == assign[100:]).mean() > 0.8


def test_embedding_lsh_finds_planted_dupes(ray_session):
    """LSH-bucketed near-dup path finds exactly the planted >0.95 pairs
    (the testdata tables contain none, so the oracle check there is
    trivially empty; this plants real ones)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gscap_ray.functions.ann import cosine_pairs_above, normalize

    rng = np.random.default_rng(77)
    base = rng.standard_normal((40, 16))
    # plant 5 near-dup pairs: tiny perturbations of existing rows
    dup = base[:5] + rng.normal(0, 0.01, (5, 16))
    emb = np.vstack([base, dup])
    ids = np.arange(len(emb))
    want_a, want_b, _ = cosine_pairs_above(emb, ids, threshold=0.95)
    want = set(zip(want_a.tolist(), want_b.tolist()))
    assert len(want) >= 5  # the planted pairs are above threshold

    import gscap_ray.queries as Q

    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(emb)})
    orig = Q._emb_read
    try:
        Q._emb_read = lambda sf: rd.from_pandas(pdf)
        got = Q.q_embedding_dupes_lsh("unused")
    finally:
        Q._emb_read = orig
    assert set(zip(got["id_a"], got["id_b"])) == want


def test_embedding_lsh_planted_skew(ray_session):
    """VERDICT r2 #5 done-criterion: a pathological hot bucket — one tight
    cluster holding 60% of all vectors (every LSH table puts them in ONE
    bucket) — still returns exactly the >0.95 pairs, exercising the
    chunk-pair decomposition + Hamming prefilter path instead of a dense
    within-bucket matmul."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gscap_ray.functions.ann import cosine_pairs_above

    rng = np.random.default_rng(123)
    # hot cluster: 120 copies of one direction with tiny jitter (all
    # mutually >0.95 — a worst-case b^2 bucket), plus 80 scattered vectors
    center = rng.standard_normal(16)
    hot = center[None, :] + rng.normal(0, 0.004, (120, 16))
    cold = rng.standard_normal((80, 16)) * 3
    emb = np.vstack([hot, cold])
    ids = np.arange(len(emb))
    want_a, want_b, _ = cosine_pairs_above(emb, ids, threshold=0.95)
    want = set(zip(want_a.tolist(), want_b.tolist()))
    assert len(want) >= 120 * 119 // 2  # the hot cluster is all-pairs

    import gscap_ray.queries as Q

    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(emb)})
    orig, orig_chunk = Q._emb_read, Q._LSH_CHUNK
    try:
        Q._emb_read = lambda sf: rd.from_pandas(pdf)
        # shrink the chunk size so the hot bucket actually decomposes
        Q._LSH_CHUNK = 32
        got = Q.q_embedding_dupes_lsh("unused")
    finally:
        Q._emb_read, Q._LSH_CHUNK = orig, orig_chunk
    assert set(zip(got["id_a"], got["id_b"])) == want


def test_ngram_jaccard_prefix_filter_lossless(ray_session):
    """The AllPairs prefix filter (index only the first n - ceil(t*n) + 1
    of each doc's globally-ordered shingles) must find EVERY pair with
    exact Jaccard >= 0.5 — compare against brute-force all-pairs on
    adversarial inputs: identical docs, single-shingle docs, pairs planted
    right at / just under the threshold, empties."""
    import pandas as pd
    import ray.data as rd

    import gscap_ray.queries as Q

    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(400)])
    texts = []
    # random background docs
    for _ in range(60):
        texts.append(" ".join(rng.choice(vocab, size=rng.integers(5, 40))))
    # identical pair (J = 1.0)
    texts += ["alpha beta gamma delta epsilon"] * 2
    # single-shingle docs (< k tokens): identical and different
    texts += ["tiny doc", "tiny doc", "other doc"]
    # planted pair exactly at threshold: share half their tokens-run
    base = [f"s{i}" for i in range(30)]
    texts.append(" ".join(base))
    texts.append(" ".join(base[:16] + [f"t{i}" for i in range(14)]))
    # near-identical long pair (one token changed mid-doc)
    long = [f"u{i}" for i in range(50)]
    texts.append(" ".join(long))
    texts.append(" ".join(long[:25] + ["X"] + long[26:]))
    texts.append("")  # empty doc is excluded on both sides

    ids = np.arange(len(texts), dtype=np.int64)
    # brute-force expected pairs
    shs = [shingle_hashes(t.split()) for t in texts]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if not texts[i].split() or not texts[j].split():
                continue
            jc = jaccard(shs[i], shs[j])
            if jc >= 0.5:
                want[(i, j)] = round(jc, 4)
    assert len(want) >= 2  # the planted pairs exist

    pdf = pd.DataFrame({"doc_id": ids, "text": texts})
    orig = Q._read
    try:
        Q._read = lambda sf, table, columns=None: rd.from_pandas(pdf)
        got = Q.q_ngram_jaccard("unused")
        got_mh = Q.q_minhash_dedup("unused")
    finally:
        Q._read = orig
    got_pairs = {(a, b): j for a, b, j in
                 zip(got["doc_a"], got["doc_b"], got["jaccard"])}
    assert got_pairs == want
    # the two lossless-at-0.5 generators agree end to end
    assert got_pairs == {(a, b): j for a, b, j in
                         zip(got_mh["doc_a"], got_mh["doc_b"],
                             got_mh["jaccard"])}


def test_bpe_token_counts_matches_duckdb_re2():
    """The BPE-ish pretokenizer must count identically under Python re and
    DuckDB's RE2 (the oracle side) — adversarial contractions, non-ASCII,
    pure punctuation, whitespace runs."""
    import duckdb
    import pyarrow as pa

    from gscap_ray.functions.text import BPE_PRETOKEN_PATTERN, bpe_token_counts

    texts = ["", "  ", "it's a test", "abc123!!", "héllo wörld", "a'b'll c",
             "tab\tnl\n x", "don't can't we'll I'm you're I'd I've",
             "...---...", "ALLCAPS lower 42 3.14", "'", "''s", "x'sy"]
    got = bpe_token_counts(np.array(texts, dtype=object))
    con = duckdb.connect()
    con.register("d", pa.table({"text": texts}))
    sql_pat = BPE_PRETOKEN_PATTERN.replace("'", "''")
    want = [r[0] for r in con.execute(
        f"SELECT len(regexp_extract_all(text, '{sql_pat}')) FROM d").fetchall()]
    assert got.tolist() == want


def test_myers_distance_matches_dp():
    """Bit-parallel Myers vs a plain DP reference over random short byte
    strings (incl. empties and length skew)."""
    import random

    from gscap_ray.functions.dedup import myers_distance_batch

    def dp(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1,
                           prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return d[n]

    rng = random.Random(7)
    A, B, want = [], [], []
    for _ in range(300):
        la, lb = rng.randint(0, 40), rng.randint(0, 40)
        A.append(bytes(rng.choice(b"abcde ") for _ in range(la)))
        B.append(bytes(rng.choice(b"abcde ") for _ in range(lb)))
        want.append(dp(A[-1], B[-1]))
    assert list(myers_distance_batch(A, B)) == want


def test_fuzzy_dedup_prefix_filter_lossless(ray_session):
    """The PassJoin pigeonhole segment filter (5 fixed segments, +/-d
    probe window) must find EVERY pair within Levenshtein 4 on the
    lowercased 32-char prefix — compare against brute-force all-pairs DP on planted typo
    clusters: exact dups, 1..4 substitutions/indels, a 5-edit pair that
    must be excluded, short docs excluded by the domain filter."""
    import pandas as pd
    import ray.data as rd

    import gscap_ray.queries as Q

    def dp(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1,
                           prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return d[n]

    rng = np.random.default_rng(23)
    vocab = np.array(["table", "scan", "merge", "row", "fast", "slow",
                      "agg", "join", "key", "value"])
    texts = []
    for _ in range(40):  # background docs, >= 32 chars
        texts.append(" ".join(rng.choice(vocab, size=12)))
    base = "the quick brown fox jumps over the lazy dog"
    texts.append(base)                      # planted cluster
    texts.append(base)                      # exact dup (d=0)
    texts.append("The quick brown fox jumps over it")   # case-folded, d small
    texts.append("thx quick brown fox jumps over the")  # 1 substitution
    texts.append("the quick brwn fox jumps over the laz")   # deletion
    texts.append("the quick brown foxx jumps over the")  # insertion
    texts.append("zzz quick brown fox jumps xxxx yyy")   # ~>4 edits vs base
    texts.append("short doc")               # < 32 chars: out of domain
    ids = np.arange(len(texts), dtype=np.int64)

    keys = {i: t[:32].lower() for i, t in zip(ids, texts) if len(t) >= 32}
    want = {(int(i), int(j), dp(keys[i], keys[j]))
            for i in keys for j in keys
            if i < j and dp(keys[i], keys[j]) <= 4}
    assert any(d == 0 for _, _, d in want)
    assert any(1 <= d <= 4 for _, _, d in want)

    pdf = pd.DataFrame({"doc_id": ids, "text": texts,
                        "n_chars": [len(t) for t in texts]})
    orig = Q._read
    try:
        Q._read = lambda sf, table, columns=None: rd.from_pandas(pdf)
        got = Q.q_fuzzy_dedup("unused")
    finally:
        Q._read = orig
    got_set = {(int(a), int(b), int(d)) for a, b, d in
               zip(got["doc_a"], got["doc_b"], got["dist"])}
    assert got_set == want
