"""Text-analysis kernels for document tables (language-ID, quality scoring,
token counting, fingerprinting).

These are the large-scale training-data operators layered on the engine
(driver brief: "Beyond the reference's own operators..."); each runs
vectorized (pandas str / numpy) inside ``map_batches``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")

STOPWORDS_EN = frozenset("the and of a to in is it you that was for on are".split())

# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (public common-word lists)
_LANG_MARKERS = {
    "en": frozenset("the and of to in is that it for was with as are be this".split()),
    "de": frozenset("der die das und ist nicht ein eine mit von für auf dem den".split()),
    "fr": frozenset("le la les et de des un une est pour que dans sur pas".split()),
    "es": frozenset("el la los las de y que en un una es por para con no".split()),
}


def tokenize(texts: np.ndarray) -> list[list[str]]:
    """Whitespace tokenization (empty string -> no tokens)."""
    s = pd.Series(texts, dtype="object").fillna("")
    return [t.split() if t.strip() else [] for t in s]


def token_counts(texts: np.ndarray) -> np.ndarray:
    """Whitespace token count, SQL-matchable:
    0 if trim(text)='' else len(regexp_split_to_array(trim(text),'\\s+'))."""
    s = pd.Series(texts, dtype="object").fillna("").str.strip()
    n = s.str.split(_WS).str.len().values.astype(np.int64)
    n[s.values == ""] = 0
    return n


# GPT-2-style BPE pretokenizer, restricted to lookahead-free RE2-compatible
# syntax so Python re and DuckDB regexp_extract_all count identically:
# contractions, space-prefixed letter runs, digit runs, punctuation runs,
# residual whitespace. (The published GPT-2 pattern's \s+(?!\S) lookahead
# is dropped — RE2 has no lookahead; trailing-space tokens merge into the
# \s+ branch on both sides, keeping the count deterministic.)
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")
_BPE_PRETOKEN = re.compile(BPE_PRETOKEN_PATTERN)


def bpe_token_counts(texts: np.ndarray) -> np.ndarray:
    """BPE-ish pretoken count per document (compiled-regex findall pass;
    the string scan is C, only the per-doc count crosses into Python)."""
    s = pd.Series(texts, dtype="object").fillna("")
    return s.str.count(_BPE_PRETOKEN).values.astype(np.int64)


def stopword_ratio(texts: np.ndarray, stopwords=STOPWORDS_EN) -> np.ndarray:
    """fraction of lowercase whitespace tokens that are stopwords (0.0 for
    empty docs), rounded to 4 dp."""
    out = np.zeros(len(texts), dtype=np.float64)
    for i, toks in enumerate(tokenize(texts)):
        if toks:
            low = [t.lower() for t in toks]
            out[i] = sum(t in stopwords for t in low) / len(low)
    return np.round(out, 4)


def quality_features(texts: np.ndarray) -> dict[str, np.ndarray]:
    """Heuristic quality features: lengths, token stats, symbol ratios."""
    s = pd.Series(texts, dtype="object").fillna("")
    n_chars = s.str.len().values.astype(np.int64)
    toks = tokenize(texts)
    n_tokens = np.array([len(t) for t in toks], dtype=np.int64)
    mean_tok = np.array([np.mean([len(w) for w in t]) if t else 0.0 for t in toks])
    alpha = s.str.count(r"[A-Za-z]").values.astype(np.float64)
    digit = s.str.count(r"[0-9]").values.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha_ratio = np.where(n_chars > 0, alpha / n_chars, 0.0)
        digit_ratio = np.where(n_chars > 0, digit / n_chars, 0.0)
    return dict(
        n_chars=n_chars,
        n_tokens=n_tokens,
        mean_token_len=np.round(mean_tok, 4),
        alpha_ratio=np.round(alpha_ratio, 4),
        digit_ratio=np.round(digit_ratio, 4),
        stop_ratio=stopword_ratio(texts),
    )


# precompiled whitespace-token-equality marker patterns: (?:^|\s)w(?=\s|$)
# counts exactly the tokens equal to a marker word — one vectorized C regex
# pass per language instead of a Python token loop (VERDICT r1 lang-ID fix)
_LANG_PATTERNS = {
    lang: re.compile(r"(?:^|\s)(?:" + "|".join(sorted(words)) + r")(?=\s|$)")
    for lang, words in _LANG_MARKERS.items()
}
_CJK = re.compile(r"[぀-ヿ㐀-鿿]")


def detect_language(texts: np.ndarray) -> np.ndarray:
    """Stopword/codepoint language-ID heuristic over {en, de, fr, es, ja}.

    'ja' on any CJK/kana codepoint; otherwise the language with the most
    marker-stopword hits, ties resolved in fixed order en > de > fr > es.
    Vectorized: one precompiled-regex count pass per language."""
    s = pd.Series(texts, dtype="object").fillna("").str.lower()
    counts = {lang: s.str.count(pat).values.astype(np.int64)
              for lang, pat in _LANG_PATTERNS.items()}
    n_en, n_de = counts["en"], counts["de"]
    n_fr, n_es = counts["fr"], counts["es"]
    out = np.full(len(s), "en", dtype=object)
    out[n_de > n_en] = "de"
    out[n_fr > np.maximum(n_en, n_de)] = "fr"
    out[n_es > np.maximum(n_fr, np.maximum(n_en, n_de))] = "es"
    out[s.str.contains(_CJK).values] = "ja"
    return out


# one C-regex pass per feature: tokens containing an ASCII letter, and
# tokens equal to a stopword (lookahead keeps alternation order irrelevant)
_ALPHA_TOKEN = re.compile(r"(?:^|\s)\S*[A-Za-z]")
_STOP_TOKEN = re.compile(
    r"(?:^|\s)(?:" + "|".join(sorted(STOPWORDS_EN)) + r")(?=\s|$)")

# Gopher-style gates (Rae et al. 2021, table A1), integer-only so the
# decision is bit-stable: word count in [50, 100k]; mean word length in
# [3, 10] expressed as 3*n_words <= word_chars <= 10*n_words; >=80% of
# words contain an alphabetic character; >=2 stopword hits.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_MIN_ALPHA_FRAC_NUM = 8  # n_alpha_words/n_words >= 8/10
GOPHER_MIN_STOP_HITS = 2


def gopher_quality(texts: np.ndarray) -> dict[str, np.ndarray]:
    """Gopher/C4-style quality-filter decision features, all integers.

    Returns n_words (whitespace tokens), word_chars (non-whitespace
    chars = total token length), n_alpha_words (tokens containing an
    ASCII letter), n_stop_hits (tokens equal to an English stopword,
    case-folded), and keep (0/1 int64 gate). Every count has an exact
    DuckDB twin (regexp_split_to_array + list_filter), so the filter
    decision is oracle-checkable bit-for-bit — no float thresholds."""
    s = pd.Series(texts, dtype="object").fillna("")
    st = s.str.strip()
    n_words = st.str.split(_WS).str.len().values.astype(np.int64)
    n_words[st.values == ""] = 0
    word_chars = s.str.replace(_WS, "", regex=True).str.len().values.astype(np.int64)
    n_alpha = st.str.count(_ALPHA_TOKEN).values.astype(np.int64)
    n_stop = st.str.lower().str.count(_STOP_TOKEN).values.astype(np.int64)
    keep = ((n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
            & (GOPHER_MIN_MEAN_WORD_LEN * n_words <= word_chars)
            & (word_chars <= GOPHER_MAX_MEAN_WORD_LEN * n_words)
            & (10 * n_alpha >= GOPHER_MIN_ALPHA_FRAC_NUM * n_words)
            & (n_stop >= GOPHER_MIN_STOP_HITS)).astype(np.int64)
    return dict(n_words=n_words, word_chars=word_chars,
                n_alpha_words=n_alpha, n_stop_hits=n_stop, keep=keep)


# repetition gate (Gopher "repetitious text"): the most frequent word
# bigram may cover at most 1/5 of a document's bigrams
REPETITION_MAX_TOP_BIGRAM_FRAC_DEN = 5


def bigram_repetition(texts: np.ndarray) -> dict[str, np.ndarray]:
    """Top-bigram repetition features, all integers.

    For each doc: n_bigrams = max(n_words-1, 0), top_bigram_count = the
    highest occurrence count of any adjacent-token pair, and keep = 1
    unless the top bigram covers more than 1/5 of all bigrams. Bigram
    identity is a 60-bit key h30(a)*2^30 + h30(b) over per-token
    md5_number_lower hashes — bit-identical to the DuckDB twin, so the
    counts (not just the decision) are oracle-checkable. Per-doc local:
    no shuffle; one structured np.unique per batch."""
    toks = tokenize(texts)
    n_words = np.array([len(t) for t in toks], dtype=np.int64)
    n_bigrams = np.maximum(n_words - 1, 0)
    flat = [w for t in toks for w in t]
    top = np.zeros(len(texts), dtype=np.int64)
    if flat:
        h30 = (md5_token_hash64(flat) % np.uint64(1 << 30)).astype(np.int64)
        bounds = np.concatenate([[0], np.cumsum(n_words)])
        doc_idx = np.repeat(np.arange(len(texts)), n_bigrams)
        # adjacent pairs within each doc: drop each doc's last token slot
        keep_pos = np.ones(len(flat), dtype=bool)
        keep_pos[bounds[1:][n_words > 0] - 1] = False
        a = h30[:-1][keep_pos[:-1]] if len(flat) > 1 else np.empty(0, np.int64)
        b = h30[1:][keep_pos[:-1]] if len(flat) > 1 else np.empty(0, np.int64)
        gram = a * np.int64(1 << 30) + b
        # native-int lexsort + run-length counting (structured np.unique
        # sorts void dtype via memcmp — far slower than two int64 passes)
        order = np.lexsort((gram, doc_idx))
        ds, gs = doc_idx[order], gram[order]
        if len(ds):
            new = np.ones(len(ds), dtype=bool)
            new[1:] = (np.diff(ds) != 0) | (np.diff(gs) != 0)
            starts = np.flatnonzero(new)
            counts = np.diff(np.concatenate([starts, [len(ds)]]))
            np.maximum.at(top, ds[starts], counts.astype(np.int64))
    keep = ((n_bigrams == 0)
            | (REPETITION_MAX_TOP_BIGRAM_FRAC_DEN * top <= n_bigrams)
            ).astype(np.int64)
    return dict(n_bigrams=n_bigrams, top_bigram_count=top, keep=keep)


def md5_token_hash64(tokens: list[str]) -> np.ndarray:
    """uint64 per-token hash = little-endian bytes 8..16 of md5(token) —
    bit-identical to DuckDB's md5_number_lower(), so token-hash-based
    kernels (fingerprint, simhash) are oracle-checkable."""
    import hashlib

    return np.array([int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")
                     for t in tokens], dtype=np.uint64)


_FP_BASE = 65599
_FP_MOD = 2147483647  # 2^31 - 1; keeps a*base + b within int64 in SQL too


def rolling_fingerprint(texts: np.ndarray) -> np.ndarray:
    """Deterministic rolling polynomial hash over whitespace-token md5
    hashes (document fingerprint): acc = (acc*65599 + h) mod (2^31-1),
    seeded with the first token's hash; 0 for empty docs. Matches the
    DuckDB list_reduce oracle exactly."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, toks in enumerate(tokenize(texts)):
        if not toks:
            continue
        h30 = (md5_token_hash64(toks) % np.uint64(1 << 30)).astype(np.int64)
        acc = int(h30[0])
        for v in h30[1:].tolist():
            acc = (acc * _FP_BASE + v) % _FP_MOD
        out[i] = acc
    return out
