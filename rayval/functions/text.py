"""Text-analysis batch functions for the documents table — the
training-data-pipeline operator set (language-ID, quality scoring, token
counting, fingerprinting, shingling, MinHash, SimHash).  All are pure
per-batch functions designed for ``map_batches``: vectorized where the work
is columnar, tight per-doc numpy loops where the work is genuinely per-item
(signatures over variable-length shingle sets).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from rayval.state.hashing import hash64, rehash, window_hashes

# Regex classes pinned to RE2 (DuckDB) semantics so oracle comparisons hold on
# NON-ascii text too: RE2's \s is [\t\n\f\r ] and \w is [0-9A-Za-z_], while
# Python's are Unicode-aware — e.g. NBSP is Python-\s but not RE2-\s, and 'é'
# is Python-\w but not RE2-\w.  The oracle SQL uses \s/\w, so the Python side
# spells out the RE2 classes explicitly.
RE2_WS = "\t\n\f\r "
TOKEN_RE = re.compile(rf"[^{RE2_WS}]+")         # RE2 \S+
PUNCT_RE = re.compile(rf"[^0-9A-Za-z_{RE2_WS}]")  # RE2 [^\w\s]
WORD_RE = re.compile(r"[\w']+")                 # internal only (langid/simhash)
_WS_RE = re.compile(rf"[{RE2_WS}]+")            # RE2 \s+

# tiny per-language stopword profiles (public common-word lists); scoring is a
# plain hit-count — deterministic, vocabulary-based, no model download
LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the a of and to in is it you that he was for on are with as".split()),
    "es": frozenset("el la de que y a en un ser se no haber por con su para".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist".split()),
    "fr": frozenset("le de un être et à il avoir ne je son que se qui dans".split()),
    "zh": frozenset("的 一 是 不 了 人 我 在 有 他 这 中 大 来 上".split()),
}
STOPWORDS = LANG_PROFILES["en"]


def token_count(texts: pd.Series) -> np.ndarray:
    """#whitespace-separated tokens (regex \\S+), vectorized."""
    return texts.fillna("").str.count(TOKEN_RE).to_numpy(dtype=np.int64)


# BPE-ish pre-tokenizer (GPT-2-style contraction/word/number/punct splits,
# ASCII classes, NO lookahead) — RE2-compatible so the DuckDB oracle runs the
# IDENTICAL pattern; both engines use leftmost-first alternation.
BPE_RE_SRC = rf"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9{RE2_WS}]+|[{RE2_WS}]+"
BPE_RE = re.compile(BPE_RE_SRC)


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """#BPE-ish pre-tokens per document, vectorized."""
    return texts.fillna("").str.count(BPE_RE).to_numpy(dtype=np.int64)


def quality_scores(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality features: length, token count, punctuation count,
    stopword count, plus derived ratios.  Raw COUNTS are the canonical
    output — derive fixed-point ratios from them in the exact same IEEE op
    order as any SQL oracle (multiply first, then divide) to keep floor()
    comparisons bit-stable."""
    t = texts.fillna("").reset_index(drop=True)
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    n_tokens = t.str.count(TOKEN_RE).to_numpy(dtype=np.int64)
    n_punct = t.str.count(PUNCT_RE).to_numpy(dtype=np.int64)
    toks = t.str.lower().str.findall(TOKEN_RE)
    n_stop = _profile_hits(toks, STOPWORDS, len(t))
    denom = np.maximum(n_tokens, 1)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_punct": n_punct,
            "n_stop": n_stop,
            "punct_ratio": n_punct / np.maximum(n_chars, 1),
            "stopword_ratio": n_stop / denom,
            "mean_token_len": (n_chars - np.maximum(n_tokens - 1, 0)) / denom,
        }
    )


def _profile_hits(tok_lists: pd.Series, vocab: frozenset, n: int) -> np.ndarray:
    """int64[n] per-row count of tokens that appear in ``vocab`` — explode +
    ``isin`` + positional groupby-size; no per-row/per-token Python loop.
    ``tok_lists`` must carry a RangeIndex (positional row ids)."""
    out = np.zeros(n, dtype=np.int64)
    ex = tok_lists.explode().dropna()
    if len(ex):
        hits = ex[ex.isin(vocab)].groupby(level=0).size()
        if len(hits):
            out[hits.index.to_numpy(dtype=np.int64)] = hits.to_numpy(dtype=np.int64)
    return out


_ZH_CHAR_RE = re.compile("[" + "".join(sorted(LANG_PROFILES["zh"])) + "]")


def langid(texts: pd.Series) -> np.ndarray:
    """N-gram/stopword heuristic language ID: the language whose profile has
    the most hits wins; ties and zero-hit rows -> 'und'.  Deterministic
    (profiles are frozen; tie-break is lexicographic — argmax over the
    lexicographically-sorted language axis returns the first maximum).

    Space-separated languages score by profile-token hits.  ``zh`` scores by
    profile-CHARACTER hits — WORD_RE cannot segment unspaced CJK text, so a
    token-based zh profile would be dead weight (it could never match).

    Fully vectorized: tokens explode once, each profile scores via ``isin`` +
    positional groupby; zh scores via one char-class ``str.count``.
    """
    n = len(texts)
    lowered = texts.fillna("").str.lower().reset_index(drop=True)
    toks = lowered.str.findall(WORD_RE)
    token_langs = sorted(k for k in LANG_PROFILES if k != "zh")
    scores = np.zeros((n, len(token_langs)), dtype=np.int64)
    ex = toks.explode().dropna()
    for j, lang in enumerate(token_langs):
        if len(ex):
            hits = ex[ex.isin(LANG_PROFILES[lang])].groupby(level=0).size()
            if len(hits):
                scores[hits.index.to_numpy(dtype=np.int64), j] = hits.to_numpy(dtype=np.int64)
    n_zh = lowered.str.count(_ZH_CHAR_RE).to_numpy(dtype=np.int64)
    best_j = scores.argmax(axis=1)  # first max -> lexicographic tie-break
    best_n = scores[np.arange(n), best_j]
    out = np.empty(n, dtype=object)
    out[:] = "und"
    has_hits = best_n > 0
    out[has_hits] = np.array(token_langs, dtype=object)[best_j[has_hits]]
    out[n_zh > best_n] = "zh"  # zh wins only on STRICTLY more hits
    return out


def normalize_text(texts: pd.Series) -> pd.Series:
    """Canonical form for fingerprinting: lowercase, collapse whitespace, trim."""
    return texts.fillna("").str.lower().str.replace(_WS_RE, " ", regex=True).str.strip()


def fingerprint_md5(texts: pd.Series) -> np.ndarray:
    """Document fingerprint: md5 hex of the normalized text (matches DuckDB's
    ``md5(...)`` for the oracle); use ``fingerprint_rolling`` for the
    integer rolling-hash variant."""
    return np.array([hashlib.md5(s.encode()).hexdigest() for s in normalize_text(texts)], dtype=object)


def fingerprint_rolling(texts: pd.Series) -> np.ndarray:
    """64-bit integer fingerprint over the normalized text bytes — the engine's
    vectorized wrapping-mod-2^64 buffer polynomial (state/hashing.py hash64:
    one cumsum pass over the concatenated Arrow data buffer, no per-byte
    Python), returned as int64."""
    norm = pa.array(normalize_text(texts), type=pa.string())
    return hash64(norm).view(np.int64)


# ---------------------------------------------------------------- shingles
def _norm_for_shingles(text: str, k: int) -> str:
    s = _WS_RE.sub(" ", (text or "").lower()).strip()
    return s if len(s) >= k else s.ljust(k)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-char shingle set of the normalized text —
    sliding-window polynomial hashes over the UTF-32 codepoints (ONE
    vectorized pass, no per-window substring objects)."""
    s = _norm_for_shingles(text, k)
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    return np.unique(window_hashes(codes, k))


def batch_minhash_signatures(
    texts, num_perm: int = 64, k: int = 5, seed: int = 7
) -> np.ndarray:
    """uint64[n_docs, num_perm] MinHash signatures for a whole batch in one
    vectorized pass: all documents' shingle hashes come from ONE sliding-
    window sweep over the concatenated normalized corpus, and each
    permutation's minimum is a single ``np.minimum.reduceat`` over document
    boundaries — no per-document Python loop.

    Identical output to ``minhash_signature(char_shingles(t, k), num_perm)``
    row by row (same window hash, same salted rehash, min over multiset ==
    min over set).
    """
    norm = [_norm_for_shingles(t, k) for t in texts]
    n_docs = len(norm)
    if n_docs == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    lens = np.fromiter((len(s) for s in norm), dtype=np.int64, count=n_docs)
    codes = np.frombuffer("".join(norm).encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    counts = lens - k + 1  # >= 1 (padded)
    # full sweep produces windows at every position incl. ones crossing doc
    # boundaries; select each doc's own [start, start+count) window range
    all_win = window_hashes(codes, k)
    win_off = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())
    sel = np.repeat(doc_starts - win_off, counts) + np.arange(total, dtype=np.int64)
    win = all_win[sel]

    salts = np.arange(num_perm, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    sig = np.empty((n_docs, num_perm), dtype=np.uint64)
    for j in range(num_perm):
        sig[:, j] = np.minimum.reduceat(rehash(win, int(salts[j])), win_off)
    return sig


def minhash_signature(shingles: np.ndarray, num_perm: int = 64, seed: int = 7) -> np.ndarray:
    """uint64[num_perm] MinHash signature via num_perm salted rehashes of the
    shingle hash set (one-hash-per-perm variant; deterministic)."""
    if shingles.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    salts = np.arange(num_perm, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    # (num_perm, n) rehash then min over shingles
    sig = np.empty(num_perm, dtype=np.uint64)
    for j in range(num_perm):
        sig[j] = rehash(shingles, int(salts[j])).min()
    return sig


def minhash_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Estimated Jaccard from two signatures."""
    return float(np.mean(a == b))


def exact_jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    """Exact Jaccard over two shingle-hash sets (sorted-unique uint64)."""
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (unweighted)."""
    return int(batch_simhash64([text])[0])


def batch_simhash64(texts) -> np.ndarray:
    """int64[n_docs] SimHash signatures for a whole batch in one vectorized
    pass: all documents' tokens hash together, per-bit votes accumulate with
    ``np.add.reduceat`` over document boundaries.  Docs with no tokens -> 0.
    """
    tok_lists = pd.Series(texts).fillna("").str.lower().str.findall(WORD_RE)
    counts = tok_lists.str.len().to_numpy(dtype=np.int64)
    n_docs = len(counts)
    out = np.zeros(n_docs, dtype=np.int64)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    flat = [w for ws in tok_lists for w in ws]
    hs = hash64(pa.array(flat, type=pa.string()))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    ne_counts = counts[nonempty]
    starts = np.concatenate([[0], np.cumsum(ne_counts)[:-1]])
    sums = np.add.reduceat(bits, starts, axis=0)  # (n_nonempty, 64)
    votes = sums * 2 - ne_counts[:, None]
    vals = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = vals.view(np.int64)
    return out


def token_stream(batch_texts: "pa.Array"):
    """THE shared tokenization primitive behind every word-n-gram operator
    (exact Jaccard, decontamination, repetition): ascii_lower + [a-z0-9]+
    runs, nulls as empty docs — byte-for-byte the DuckDB oracles'
    ``list_transform(regexp_extract_all(text, '[a-zA-Z0-9]+'), lower)``.
    Returns (flat tokens pa.Array, parent doc indices int64 np.ndarray).
    One implementation so a regex/filter tweak can't silently break one
    caller's oracle parity while the others still match."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = batch_texts.combine_chunks() if isinstance(batch_texts, pa.ChunkedArray) else batch_texts
    toks = pc.split_pattern_regex(pc.ascii_lower(pc.fill_null(arr, "")), pattern="[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    p = parents.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, p


def gram_windows(flat, p: np.ndarray, n: int):
    """Word-n-gram stream over a token stream: (space-joined grams pa.Array,
    gram parent ids int64).  Token windows [i, i+n) lie within one doc iff
    the parents agree at the ends (parents are nondecreasing, so the middle
    agrees for free).  Empty stream -> (None, empty)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    L = len(p)
    if L < n:
        return None, np.empty(0, dtype=np.int64)
    ok = p[: L - n + 1] == p[n - 1:]
    if not ok.any():
        return None, np.empty(0, dtype=np.int64)
    mask = pa.array(ok)
    parts = [flat.slice(j, L - n + 1).filter(mask) for j in range(n)]
    return pc.binary_join_element_wise(*parts, " "), p[: L - n + 1][ok]


def repetition_scores(batch_texts: "pa.Array", n: int = 2):
    """Gopher-style repetition quality signal, fully vectorized over one
    Arrow batch: per doc, the share of word-``n``-grams taken by the single
    most frequent one (boilerplate / keyword-stuffing detector).

    Returns (n_tokens, n_grams, top_gram_n) int64 arrays aligned to the
    batch; derive the fixed-point ratio as ``1e6 * top // n_grams`` in the
    SAME op order as the SQL oracle.  Tokenization is :func:`token_stream`
    (shared with the Jaccard/decontamination ops).  Grams are counted as
    uint64 hashes (a 2^-64-scale collision could merge two grams' counts).
    """
    from rayval.state.hashing import hash64

    m = len(batch_texts)
    flat, p = token_stream(batch_texts)
    n_tokens = np.bincount(p, minlength=m).astype(np.int64) if len(p) else np.zeros(m, np.int64)
    n_grams = np.zeros(m, dtype=np.int64)
    top = np.zeros(m, dtype=np.int64)
    grams, par = gram_windows(flat, p, n)
    if grams is not None:
        gram_h = hash64(grams)
        n_grams = np.bincount(par, minlength=m).astype(np.int64)
        # count occurrences of each (doc, gram): sort by (doc, hash),
        # run-length the equal pairs, then per-doc max over the runs with
        # ONE reduceat (runs are already grouped by doc after the lexsort)
        order = np.lexsort((gram_h, par))
        ps, hs = par[order], gram_h[order]
        new = np.empty(len(ps), dtype=bool)
        new[0] = True
        new[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
        starts = np.flatnonzero(new)
        run_counts = np.diff(np.append(starts, len(ps)))
        run_docs = ps[starts]
        doc_starts = np.flatnonzero(np.r_[True, run_docs[1:] != run_docs[:-1]])
        top[run_docs[doc_starts]] = np.maximum.reduceat(run_counts, doc_starts)
    return n_tokens, n_grams, top


# PII detection patterns — deliberately ASCII/RE2-compatible (no lookahead,
# no unicode classes) so the DuckDB oracle runs the IDENTICAL source string.
# Conservative by design: a corpus-hygiene pass wants high recall on the
# obvious shapes (emails, international/US phone-ish digit runs, 16-digit
# card-ish runs); precision tuning belongs to a downstream reviewer.
PII_EMAIL_SRC = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE_SRC = r"\+?[0-9][0-9 ().-]{7,}[0-9]"
PII_EMAIL_RE = re.compile(PII_EMAIL_SRC)
PII_PHONE_RE = re.compile(PII_PHONE_SRC)


def pii_counts(texts: pd.Series) -> pd.DataFrame:
    """(n_emails, n_phones) per row — vectorized str.count with the pinned
    RE2-compatible patterns (oracle parity like BPE_RE)."""
    t = texts.fillna("").reset_index(drop=True)
    return pd.DataFrame(
        {
            "n_emails": t.str.count(PII_EMAIL_RE).to_numpy(dtype=np.int64),
            "n_phones": t.str.count(PII_PHONE_RE).to_numpy(dtype=np.int64),
        }
    )


def truncate_tokens(col: "pa.ChunkedArray | pa.Array", max_tokens: int):
    """Token-budget truncation — clip each document to its first
    ``max_tokens`` space-separated tokens (the context-length clipping stage
    of a training pipeline).  Tokenization is single-space split, exactly
    DuckDB's ``string_split(text, ' ')`` (consecutive spaces yield empty
    tokens on both sides), so the SQL oracle is
    ``array_to_string(string_split(text,' ')[1:K], ' ')``.

    Fully vectorized: n_tokens is one ``count_substring`` kernel (+1), and
    the clipped prefix is one RE2 ``extract_regex`` with a bounded-repetition
    anchor (^token( token){0,K-1}) — no per-row Python, no token list
    materialization.  Returns (text_trunc StringArray, n_tokens int64 numpy,
    was_truncated bool numpy); null texts stay null with n_tokens null."""
    import pyarrow.compute as pc

    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n_tokens = pc.add(pc.count_substring(col, " "), 1)
    pattern = r"^(?P<t>[^ ]*(?: [^ ]*){0,%d})" % (max_tokens - 1)
    trunc = pc.struct_field(pc.extract_regex(col, pattern), "t")
    was_trunc = pc.greater(n_tokens, max_tokens)
    return trunc, n_tokens, was_trunc
