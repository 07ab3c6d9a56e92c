"""Text-analysis functions + dedup/similarity operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayval.functions.text import (
    char_shingles,
    exact_jaccard,
    fingerprint_md5,
    fingerprint_rolling,
    langid,
    minhash_jaccard,
    minhash_signature,
    quality_scores,
    simhash64,
    token_count,
)


def test_token_count():
    s = pd.Series(["a b  c", "", None, "  x "])
    assert list(token_count(s)) == [3, 0, 0, 1]


def test_quality_scores():
    q = quality_scores(pd.Series(["The cat, the dog!", ""]))
    assert q["n_tokens"].tolist() == [4, 0]
    assert q["n_punct"].tolist() == [2, 0]
    assert q["n_stop"].tolist() == [2, 0]  # 'The'/'the' both count (lowercased); 'cat,'/'dog!' don't


def test_langid_deterministic():
    s = pd.Series(["the cat is on the mat", "el perro en la casa", "der hund und die katze", "xyzzy plugh"])
    out = list(langid(s))
    assert out[0] == "en" and out[1] == "es" and out[2] == "de" and out[3] == "und"
    assert list(langid(s)) == out


def test_fingerprints_normalize():
    s = pd.Series(["Hello   World", "hello world", "hello world "])
    fps = fingerprint_md5(s)
    assert fps[0] == fps[1] == fps[2]
    fr = fingerprint_rolling(s)
    assert fr[0] == fr[1] == fr[2]
    assert fingerprint_rolling(pd.Series(["a"]))[0] != fr[0]


def test_shingles_and_jaccard():
    a = char_shingles("the quick brown fox", 5)
    b = char_shingles("the quick brown fox", 5)
    c = char_shingles("a completely different document", 5)
    assert exact_jaccard(a, b) == 1.0
    assert exact_jaccard(a, c) < 0.1


def test_minhash_estimates_jaccard():
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base + "and then some"
    far = "entirely unrelated content about databases " * 5
    sa = minhash_signature(char_shingles(base), 128)
    sb = minhash_signature(char_shingles(near), 128)
    sc = minhash_signature(char_shingles(far), 128)
    true_ab = exact_jaccard(char_shingles(base), char_shingles(near))
    assert abs(minhash_jaccard(sa, sb) - true_ab) < 0.15
    assert minhash_jaccard(sa, sc) < 0.2
    assert minhash_jaccard(sa, sa) == 1.0


def test_simhash_similar_texts_close():
    from rayval.functions.phash import hamming64

    a = simhash64("the quick brown fox jumps over the lazy dog near the river bank today")
    b = simhash64("the quick brown fox jumps over the lazy dog near the river bank")
    c = simhash64("completely different words about query engines and columnar formats here")
    assert hamming64(np.array([b]), a)[0] < hamming64(np.array([c]), a)[0]
    assert simhash64("") == 0


@pytest.fixture(scope="module")
def doc_ds(ray_session):
    import ray.data

    texts = [
        "the quick brown fox jumps over the lazy dog " * 3,
        "the quick brown fox jumps over the lazy dog " * 3 + "extra",
        "totally different content about columnar engines",
        "another unique document with its own words entirely",
        "the quick brown fox jumps over the lazy dog " * 3,  # exact dup of 0
    ]
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array([f"d{i}" for i in range(len(texts))]), "text": pa.array(texts)})
    )


def test_exact_dup_members(doc_ds):
    from rayval.stages.docdedup import exact_dup_members

    out = exact_dup_members(doc_ds, "text", "doc_id")
    assert set(out["doc_id"].to_pylist()) == {"d0", "d4"}


def test_minhash_lsh_finds_near_dups(doc_ds):
    from rayval.stages.docdedup import minhash_lsh_candidates

    out = minhash_lsh_candidates(doc_ds, "text", "doc_id", est_threshold=0.5).to_pandas()
    pairs = set(zip(out.a, out.b))
    assert ("d0", "d4") in pairs  # exact dup pair
    assert ("d0", "d1") in pairs  # near dup pair
    assert not any({"d2", "d3"} & {a, b} and {a, b} <= {"d2", "d3"} for a, b in pairs)


def test_minhash_lsh_exact_verify(doc_ds):
    from rayval.stages.docdedup import minhash_lsh_candidates

    texts = {r["doc_id"]: r["text"] for r in doc_ds.take_all()}
    out = minhash_lsh_candidates(
        doc_ds, "text", "doc_id", est_threshold=0.5, texts_for_verify=texts, exact_threshold=0.9999
    ).to_pandas()
    assert set(zip(out.a, out.b)) == {("d0", "d4")}  # only the exact dup survives
    assert (out.jaccard == 1.0).all()


def test_simhash_neardups_stage(doc_ds):
    from rayval.stages.docdedup import simhash_neardups

    out = simhash_neardups(doc_ds, "text", "doc_id", max_hamming=3).to_pandas()
    assert ("d0", "d4") in set(zip(out.a, out.b))
    assert (out.hamming <= 3).all()


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16))
    base[5] = base[0] + rng.standard_normal(16) * 0.01  # near-dup of row 0
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(20), type=pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in base], type=pa.list_(pa.float32())),
            }
        )
    )


def test_brute_topk(emb_ds):
    from rayval.stages.similarity import brute_topk

    rows = {r["vec_id"]: r["embedding"] for r in emb_ds.take_all()}
    out = brute_topk(emb_ds, np.array(rows[0]), k=3).to_pandas()
    assert list(out.vec_id[:2]) == [0, 5]  # self then planted near-dup
    assert len(out) == 3
    assert out.score.is_monotonic_decreasing


def test_lsh_topk_contains_neardup(emb_ds):
    from rayval.stages.similarity import lsh_topk

    rows = {r["vec_id"]: r["embedding"] for r in emb_ds.take_all()}
    out = lsh_topk(emb_ds, np.array(rows[0]), k=3).to_pandas()
    assert 0 in set(out.vec_id) and 5 in set(out.vec_id)


def test_embedding_neardups(emb_ds):
    from rayval.stages.similarity import embedding_neardups

    out = embedding_neardups(emb_ds, threshold=0.99).to_pandas()
    assert set(zip(out.a, out.b)) == {(0, 5)}


def test_dup_groups_from_pairs():
    import pyarrow as pa

    from rayval.stages.docdedup import dup_groups_from_pairs

    pairs = pa.table({"a": ["d1", "d2", "d7"], "b": ["d2", "d3", "d8"]})
    out = dup_groups_from_pairs(pairs).to_pandas()
    groups = dict(zip(out.key, out.group))
    assert groups["d1"] == groups["d2"] == groups["d3"] == "d1"  # transitive chain
    assert groups["d7"] == groups["d8"] == "d7"
    assert len(set(groups.values())) == 2


def test_ivf_topk(emb_ds):
    import numpy as np

    from rayval.stages.similarity import brute_topk, ivf_topk

    rows = {r["vec_id"]: r["embedding"] for r in emb_ds.take_all()}
    exact = brute_topk(emb_ds, np.array(rows[0]), k=3).to_pandas()
    approx = ivf_topk(emb_ds, np.array(rows[0]), k=3, n_lists=4, n_probe=2).to_pandas()
    # the planted near-dup (5) and the query itself must survive the probe
    assert 0 in set(approx.vec_id) and 5 in set(approx.vec_id)
    assert approx.score.is_monotonic_decreasing
    # recall vs exact top-3 is at least 2/3 on this tiny set
    assert len(set(approx.vec_id) & set(exact.vec_id)) >= 2


def test_ann_recall_gate(ray_session):
    """Quantitative quality bar for the ANN scale paths: recall@10 vs exact
    brute-force cosine must be >= 0.9 on a clustered 600x24 fixture (fixed
    seeds, 10 queries) for BOTH hyperplane-LSH multiprobe and IVF."""
    import ray.data

    from rayval.stages.similarity import brute_topk, ivf_topk, lsh_topk

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((8, 24)) * 3
    pts = np.vstack([c + rng.standard_normal((75, 24)) for c in centers])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(pts)), type=pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in pts], type=pa.list_(pa.float32())),
            }
        )
    )
    queries = pts[rng.choice(len(pts), size=10, replace=False)] + rng.standard_normal((10, 24)) * 0.05

    def recall(approx, exact, k=10):
        tot = 0.0
        for q in range(10):
            a = set(approx[approx.query_id == q].vec_id)
            e = set(exact[exact.query_id == q].vec_id)
            tot += len(a & e) / len(e)
        return tot / 10

    exact = brute_topk(ds, queries, k=10).to_pandas()
    lsh = lsh_topk(ds, queries, k=10, n_planes=10, probe_bits=2).to_pandas()
    ivf = ivf_topk(ds, queries, k=10, n_lists=8, n_probe=4).to_pandas()
    r_lsh, r_ivf = recall(lsh, exact), recall(ivf, exact)
    assert r_lsh >= 0.9, f"LSH recall@10 {r_lsh:.3f} < 0.9"
    assert r_ivf >= 0.9, f"IVF recall@10 {r_ivf:.3f} < 0.9"


def test_hot_bucket_guard_minhash(ray_session):
    """A 1%-duplicated corpus (one text repeated 40x among 400 docs) must not
    trigger an O(b^2) pair blowup: the hot band buckets short-circuit to
    representative chains, and the dup cluster's connected component is
    preserved."""
    import time

    import ray.data

    from rayval.stages.docdedup import dup_groups_from_pairs, minhash_lsh_candidates

    dup_text = "the same duplicated document body repeated verbatim " * 4
    texts = [dup_text if i % 10 == 0 else f"unique doc {i} with distinct words {i*7} {i*13}"
             for i in range(400)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([f"d{i:04d}" for i in range(400)]), "text": pa.array(texts)})
    )
    t0 = time.time()
    out = minhash_lsh_candidates(ds, "text", "doc_id", est_threshold=0.5, hot_cap=8)
    dt = time.time() - t0
    groups = dup_groups_from_pairs(out).to_pandas()
    dup_ids = {f"d{i:04d}" for i in range(400) if i % 10 == 0}
    comp = groups[groups.key.isin(dup_ids)]
    # all 40 copies land in ONE component rooted at the smallest key
    assert set(comp.key) == dup_ids
    assert set(comp.group) == {"d0000"}
    # guarded: emitted pairs stay near-linear in the cluster size, not b^2/2
    cluster_pairs = out.to_pandas()
    cluster_pairs = cluster_pairs[cluster_pairs.a.isin(dup_ids) & cluster_pairs.b.isin(dup_ids)]
    assert len(cluster_pairs) < 40 * 3, len(cluster_pairs)
    assert dt < 60


def test_hot_bucket_guard_small_buckets_unchanged(doc_ds):
    """Below the cap the guard must be a no-op: same candidate set with a
    tiny cap-free run."""
    from rayval.stages.docdedup import minhash_lsh_candidates

    a = minhash_lsh_candidates(doc_ds, "text", "doc_id", est_threshold=0.5, hot_cap=256).to_pandas()
    b = minhash_lsh_candidates(doc_ds, "text", "doc_id", est_threshold=0.5, hot_cap=10**9).to_pandas()
    assert set(zip(a.a, a.b)) == set(zip(b.a, b.b))


def test_simhash_max_hamming_respected(doc_ds):
    """ADVICE fix: max_hamming > 3 must widen the filter (bands derived from
    max_hamming keep pigeonhole recall), not silently clamp to 3."""
    from rayval.stages.docdedup import simhash_neardups

    tight = simhash_neardups(doc_ds, "text", "doc_id", max_hamming=0).to_pandas()
    wide = simhash_neardups(doc_ds, "text", "doc_id", max_hamming=10).to_pandas()
    assert (tight.hamming == 0).all()
    assert (wide.hamming <= 10).all()
    # d0/d4 identical -> present even at max_hamming=0
    assert ("d0", "d4") in set(zip(tight.a, tight.b))
    # the wide run keeps everything the tight run found
    assert set(zip(tight.a, tight.b)) <= set(zip(wide.a, wide.b))


def test_dup_groups_propagate_matches_union_find(ray_session):
    """Distributed min-label propagation == driver union-find, exactly."""
    import ray.data

    from rayval.stages.docdedup import dup_groups_from_pairs, dup_groups_propagate

    pairs = pa.table(
        {
            "a": pa.array(["d1", "d2", "d5", "d7", "d8", "d2"]),
            "b": pa.array(["d2", "d3", "d6", "d8", "d9", "d1"]),
        }
    )
    uf = dup_groups_from_pairs(pairs)
    prop = dup_groups_propagate(ray.data.from_arrow(pairs))
    assert uf.to_pydict() == prop.to_pydict()


def test_langid_chinese():
    """zh scores by profile-character hits (WORD_RE can't segment unspaced
    CJK) — Chinese text must classify as zh, not 'und'."""
    from rayval.functions.text import langid

    s = pd.Series([
        "我是一个人他在中国这是一个大的地方",   # unspaced Chinese
        "the quick brown fox is on the hill with a dog",
        "",
    ])
    out = langid(s)
    assert out[0] == "zh"
    assert out[1] == "en"
    assert out[2] == "und"


def test_quality_scores_non_ascii_matches_duckdb():
    """Regex classes are pinned to RE2 semantics: punct/token counts agree
    with DuckDB on accented letters, CJK, and NBSP."""
    import duckdb

    from rayval.functions.text import quality_scores, token_count, normalize_text
    import hashlib

    rows = [
        "héllo wörld — déjà vu!",
        "中文文本，没有空格。",
        "nbsp separated tokens",
        "plain ascii text, with punct...",
    ]
    q = quality_scores(pd.Series(rows))
    tc = token_count(pd.Series(rows))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    for r in rows:
        con.execute("INSERT INTO t VALUES (?)", [r])
    exp = con.execute(r"""
        SELECT len(regexp_extract_all(s, '\S+')) AS n_tokens,
               len(regexp_extract_all(s, '[^\w\s]')) AS n_punct,
               md5(trim(regexp_replace(lower(s), '\s+', ' ', 'g'))) AS fp
        FROM t
    """).df()
    assert list(q["n_tokens"]) == list(exp["n_tokens"]), (list(q["n_tokens"]), list(exp["n_tokens"]))
    assert list(tc) == list(exp["n_tokens"])
    assert list(q["n_punct"]) == list(exp["n_punct"]), (list(q["n_punct"]), list(exp["n_punct"]))
    got_fp = [hashlib.md5(s.encode()).hexdigest() for s in normalize_text(pd.Series(rows))]
    assert got_fp == list(exp["fp"])


def test_bpe_token_count_matches_duckdb_including_non_ascii():
    """The BPE-ish pre-tokenizer pattern is RE2-compatible: identical counts
    in Python and DuckDB, including contractions, numbers, punct runs,
    non-ASCII letters (which fall into the punct class under ASCII classes
    on BOTH engines), and NBSP."""
    import duckdb

    from rayval.functions.text import BPE_RE_SRC, bpe_token_count

    rows = [
        "It's 2024, isn't it? We'll see...",
        "héllo wörld",
        "a1b2 c3",
        "",
        "tab\tsep and nbsp\u00a0gap",
    ]
    got = list(bpe_token_count(pd.Series(rows)))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    for r in rows:
        con.execute("INSERT INTO t VALUES (?)", [r])
    pat = BPE_RE_SRC.replace("'", "''").replace("\t", "\\t").replace("\n", "\\n").replace("\f", "\\f").replace("\r", "\\r")
    exp = [r[0] for r in con.execute(f"SELECT len(regexp_extract_all(s, '{pat}')) FROM t").fetchall()]
    assert got == exp, (got, exp)
    # sanity: contractions split off ('s, 'll), words+numbers separate
    assert got[0] > 8


# ----------------------------------------------- n-gram Jaccard near-dups
def _ref_ngram_pairs(texts: dict, n=3, threshold_e6=500_000, max_df=64):
    """Pure-Python reference: distinct word-n-gram sets, df-guarded
    intersection (na/nb stay FULL distinct counts; the guard only caps which
    grams may witness a pair), floored 1e-6 fixed-point jaccard."""
    import itertools
    import re

    grams = {}
    for k, t in texts.items():
        toks = [w.lower() for w in re.findall(r"[a-zA-Z0-9]+", t)]
        grams[k] = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    df = {}
    for s in grams.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    ok = {g for g, c in df.items() if 2 <= c <= max_df}
    rows = []
    for a, b in itertools.combinations(sorted(grams), 2):
        nc = len(grams[a] & grams[b] & ok)
        if not nc:
            continue
        nu = len(grams[a]) + len(grams[b]) - nc
        if 1_000_000 * nc >= threshold_e6 * nu:
            rows.append((a, b, nc, nu, (1_000_000 * nc) // nu))
    return sorted(rows)


def _run_ngram(texts: dict, **kw):
    import ray.data

    from rayval.stages.docdedup import ngram_jaccard_pairs

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(texts)), "text": pa.array(list(texts.values()))})
    )
    t = ngram_jaccard_pairs(ds, "text", "doc_id", **kw)
    return sorted(zip(*[t[c].to_pylist() for c in ["a", "b", "n_common", "n_union", "jac_e6"]]))


def test_ngram_jaccard_matches_reference(ray_session):
    texts = {
        "d0": "the quick brown fox jumps over the lazy dog " * 3,
        "d1": "the quick brown fox jumps over the lazy dog " * 3 + "extra",
        "d2": "totally different content about columnar engines today ok",
        "d3": "totally different content about columnar engines tomorrow ok",
        "d4": "the quick brown fox jumps over the lazy dog " * 3,  # exact dup of d0
        "d5": "short doc",  # < n tokens: contributes nothing
        "d6": "héllo wörld foo bar baz foo bar baz qux",  # non-ASCII separators
        "d7": "hello wrld foo bar baz foo bar baz qux quux",
    }
    got = _run_ngram(texts, threshold_e6=100_000)
    exp = _ref_ngram_pairs(texts, threshold_e6=100_000)
    assert got == exp and len(got) >= 3
    d04 = [r for r in got if (r[0], r[1]) == ("d0", "d4")]
    assert d04 and d04[0][4] == 1_000_000  # exact dup -> jaccard exactly 1


def test_ngram_jaccard_hot_gram_guard(ray_session):
    # one stop-phrase shared by every doc; otherwise disjoint texts
    texts = {
        f"d{i}": f"common phrase here unique{i} word{i} tail{i} end{i}" for i in range(6)
    }
    assert _run_ngram(texts, threshold_e6=1, max_df=4) == []  # df=6 > 4: dropped
    loose = _run_ngram(texts, threshold_e6=1, max_df=64)
    assert len(loose) == 15  # all pairs witnessed by the (guard-passing) hot gram
    assert _ref_ngram_pairs(texts, threshold_e6=1, max_df=64) == loose


def test_ngram_jaccard_empty_and_threshold(ray_session):
    texts = {"a": "", "b": "x y", "c": "one two three four", "d": "five six seven eight"}
    assert _run_ngram(texts) == []  # no shared grams at all


def test_ngram_jaccard_hashed_path_identical(ray_session):
    """hash_grams=True (the 10^12-doc shuffle shape: uint64 gram hashes, not
    strings) must produce the identical pair listing."""
    texts = {
        "d0": "the quick brown fox jumps over the lazy dog " * 3,
        "d1": "the quick brown fox jumps over the lazy dog " * 3 + "extra",
        "d2": "totally different content about columnar engines today ok",
        "d3": "totally different content about columnar engines tomorrow ok",
        "d6": "héllo wörld foo bar baz foo bar baz qux",
        "d7": "hello wrld foo bar baz foo bar baz qux quux",
    }
    assert _run_ngram(texts, threshold_e6=100_000, hash_grams=True) == _run_ngram(
        texts, threshold_e6=100_000
    )


# ------------------------------------------- similarity edge-case regressions
def _emb_table(vecs, ids=None):
    ids = ids if ids is not None else list(range(len(vecs)))
    return pa.table(
        {"vec_id": pa.array(ids, type=pa.int64()),
         "embedding": pa.array([[float(x) for x in v] for v in vecs], type=pa.list_(pa.float32()))}
    )


def test_ann_empty_blocks_survive(ray_session):
    """An empty block (empty fragment / filtered-out block) must not crash
    the matmul in any of the three top-k operators."""
    import ray.data

    from rayval.stages.similarity import brute_topk, ivf_topk, lsh_topk

    rng = np.random.default_rng(5)
    full = _emb_table(rng.standard_normal((12, 8)))
    empty = full.slice(0, 0)
    ds = ray.data.from_arrow([empty, full, empty])
    q = rng.standard_normal(8)
    assert len(brute_topk(ds, q, k=3)) == 3
    assert len(lsh_topk(ds, q, k=3, n_planes=6, probe_bits=2)) <= 3
    assert len(ivf_topk(ds, q, k=3, n_lists=4, n_probe=4)) == 3


def test_ann_null_embedding_raises(ray_session):
    """flatten() silently drops null list rows -> a null embedding must be a
    loud error, never a silently misaligned matrix."""
    import ray.data

    from rayval.stages.similarity import brute_topk

    t = pa.table(
        {"vec_id": pa.array([0, 1, 2, 3], type=pa.int64()),
         "embedding": pa.array([[1.0] * 16, None, [2.0] * 16, [3.0] * 16], type=pa.list_(pa.float32()))}
    )
    with pytest.raises(Exception, match="null embedding"):
        brute_topk(ray.data.from_arrow(t), np.ones(16), k=2)


def test_lsh_probe_bits_semantics(ray_session):
    """probe_bits=0 probes ONLY the query's bucket; deeper probing can only
    widen the candidate set; out-of-range raises."""
    import ray.data

    from rayval.stages.similarity import lsh_topk

    rng = np.random.default_rng(9)
    ds = ray.data.from_arrow(_emb_table(rng.standard_normal((40, 8))))
    q = rng.standard_normal(8)
    n0 = len(lsh_topk(ds, q, k=40, n_planes=6, probe_bits=0))
    n1 = len(lsh_topk(ds, q, k=40, n_planes=6, probe_bits=1))
    n3 = len(lsh_topk(ds, q, k=40, n_planes=6, probe_bits=3))
    assert n0 <= n1 <= n3
    with pytest.raises(ValueError):
        lsh_topk(ds, q, k=5, n_planes=6, probe_bits=7)


def test_embedding_neardups_duplicate_key_no_self_pairs(ray_session):
    """A repeated vec_id (contract violation) must not emit a==b rows."""
    import ray.data

    from rayval.stages.similarity import embedding_neardups

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((10, 8))
    vecs[7] = vecs[3]  # identical vectors under a REPEATED id
    ids = list(range(10))
    ids[7] = 3
    out = embedding_neardups(ray.data.from_arrow(_emb_table(vecs, ids)), threshold=0.99)
    assert (out["a"].to_numpy(zero_copy_only=False) < out["b"].to_numpy(zero_copy_only=False)).all()


def test_fragment_id_stable_and_collision_guard(tmp_path):
    """Partition ids: canonical numbered stems use the number; other names a
    CROSS-PROCESS stable hash (builtin hash() is PYTHONHASHSEED-randomized);
    colliding ids are refused up front."""
    import subprocess
    import sys

    from rayval.sources.parquet import fragment_id, list_fragments

    assert fragment_id("/x/part-00042.parquet") == 42
    assert fragment_id("/x/7.parquet") == 7
    code = "from rayval.sources.parquet import fragment_id; print(fragment_id('/x/east.parquet'))"
    outs = {
        subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                       env={"PYTHONPATH": "/root/repo", "PYTHONHASHSEED": str(s)}).stdout.strip()
        for s in (1, 2)
    }
    assert len(outs) == 1 and outs == {str(fragment_id("/x/east.parquet"))}

    import pyarrow.parquet as pq_mod
    t = pa.table({"a": [1]})
    for name in ("train-001.parquet", "val-001.parquet"):
        pq_mod.write_table(t, str(tmp_path / name))
    with pytest.raises(ValueError, match="collision"):
        list_fragments(str(tmp_path))


def test_exact_dup_null_text_matches_sql_semantics(ray_session):
    """NULL texts are excluded (SQL: md5(NULL) IS NULL, never IN-matches);
    they must NOT be grouped with empty-string docs."""
    import ray.data

    from rayval.stages.docdedup import exact_dup_members

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(["a", "b", "c", "d"]),
                  "text": pa.array([None, None, "", ""], type=pa.string())})
    )
    out = exact_dup_members(ds, "text", "doc_id")
    assert sorted(out["doc_id"].to_pylist()) == ["c", "d"]  # empties dup; nulls out


def test_minhash_empty_result_keeps_schema(ray_session):
    """Zero candidates must return the typed (string, string, float64)
    schema, not pandas-inferred null columns."""
    import ray.data

    from rayval.stages.docdedup import minhash_lsh_candidates

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(["x", "y"]),
                  "text": pa.array(["totally unique first document text here",
                                    "completely different second content entirely"])})
    )
    out = minhash_lsh_candidates(ds, "text", "doc_id", est_threshold=0.99)
    assert out.num_rows == 0
    assert out.schema.field("a").type == pa.string()
    assert out.schema.field("b").type == pa.string()


def test_embedding_neardups_lsh_recall_gate(ray_session):
    """The LSH-bucketed near-dup path: precision must be 1.0 (exact verify —
    every emitted pair is a true pair) and recall >= 0.9 vs the exact block
    join on a corpus with planted near-dup clusters."""
    import ray.data

    from rayval.stages.similarity import embedding_neardups, embedding_neardups_lsh

    rng = np.random.default_rng(21)
    base = rng.standard_normal((60, 16))
    for i in range(0, 30, 3):  # plant 10 near-dup pairs
        base[i + 1] = base[i] + rng.standard_normal(16) * 0.05
    t = _emb_table(base)
    ds = ray.data.from_arrow(t)
    exact = embedding_neardups(ds, threshold=0.9)
    approx = embedding_neardups_lsh(ds, threshold=0.9, n_planes=6, bands=8, seed=3)
    exact_pairs = set(zip(exact["a"].to_pylist(), exact["b"].to_pylist()))
    approx_pairs = set(zip(approx["a"].to_pylist(), approx["b"].to_pylist()))
    assert exact_pairs, "fixture must contain true near-dups"
    assert approx_pairs <= exact_pairs  # precision 1.0 by construction
    recall = len(approx_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, (recall, len(exact_pairs))
    # exact cos values agree for recovered pairs
    ex = {(a, b): c for a, b, c in zip(exact["a"].to_pylist(), exact["b"].to_pylist(), exact["cos"].to_pylist())}
    for a, b, c in zip(approx["a"].to_pylist(), approx["b"].to_pylist(), approx["cos"].to_pylist()):
        assert abs(ex[(a, b)] - c) < 1e-9


# ------------------------------------------------- composed cleaning pipeline
def test_clean_corpus_end_to_end(ray_session):
    """Composed pipeline: quality filter -> exact dedup keep-first ->
    near-dup keep-canonical, with exact per-stage counts."""
    import ray.data

    from rayval.pipelines.clean_corpus import CleanConfig, clean_corpus

    texts = {
        1: "the quick brown fox jumps over the lazy dog " * 3,
        2: "the quick brown fox jumps over the lazy dog " * 3,      # exact dup of 1
        3: "the quick brown fox jumps over the lazy dog " * 3 + "x y z",  # near dup of 1
        4: "completely different content about streaming engines today",
        5: "tiny",                                                   # < min_tokens
        6: "the the the the the the the the",                        # all stopwords
    }
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(texts), type=pa.int64()),
                  "text": pa.array(list(texts.values()))})
    )
    rep = clean_corpus(ds, cfg=CleanConfig(min_tokens=5, minhash_est_threshold=0.6))
    assert rep["rows_in"] == 6
    assert rep["rows_after_quality"] == 4          # 5 (short) and 6 (stopwords) out
    assert rep["exact_dropped"] == 1               # doc 2
    assert rep["near_dropped"] == 1                # doc 3 (canonical is 1)
    assert rep["rows_out"] == 2
    kept_ids = sorted(r["doc_id"] for r in rep["_kept"].take_all())
    assert kept_ids == [1, 4]


def test_clean_corpus_writes_partitioned(ray_session, tmp_path):
    import glob

    import ray.data

    from rayval.pipelines.clean_corpus import CleanConfig, clean_corpus

    rng = np.random.default_rng(17)
    words = np.array("alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi "
                     "omicron pi rho sigma tau upsilon phi chi psi omega".split())
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                  "text": pa.array([" ".join(rng.choice(words, size=12, replace=True)) for _ in range(40)])})
    )
    out = str(tmp_path / "cleaned")
    rep = clean_corpus(ds, out_dir=out, cfg=CleanConfig(write_partitions=4))
    assert rep["rows_out"] == 40
    files = glob.glob(out + "/*.parquet")
    assert files
    import pyarrow.parquet as pq_mod
    total = sum(pq_mod.read_metadata(f).num_rows for f in files)
    assert total == 40


def test_ngram_jaccard_property_random_corpora(ray_session):
    """Property check across seeded random corpora: the distributed
    inverted-index join must equal the pure-Python set reference exactly
    (hypothesis-style, seeds enumerated to keep Ray round-trips bounded)."""
    vocab = ("red blue green gold iron copper river stone cloud meadow "
             "falcon harbor ember willow quartz cedar").split()
    for seed in (0, 1, 2, 3):
        rng = np.random.default_rng(seed)
        texts = {}
        for i in range(14):
            n_words = int(rng.integers(0, 18))
            texts[f"d{i:02d}"] = " ".join(rng.choice(vocab, size=n_words)) if n_words else ""
        # plant one near-dup pair per corpus
        texts["d90"] = texts["d00"] + " extra tail words"
        got = _run_ngram(texts, threshold_e6=100_000, max_df=8)
        exp = _ref_ngram_pairs(texts, threshold_e6=100_000, max_df=8)
        assert got == exp, (seed, got, exp)


def test_clean_corpus_allowed_langs(ray_session):
    """The language gate: multi-lang and SINGLE-lang sets both work (Ray's
    filter-expr parser rejects tuple syntax and mis-parses a one-element
    parenthesized list — the bracket form must be used)."""
    import ray.data

    from rayval.pipelines.clean_corpus import CleanConfig, clean_corpus

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array(["the cat is on the mat and the dog sat",
                                    "el perro en la casa come y duerme bien",
                                    "der hund und die katze laufen im garten"])})
    )
    rep2 = clean_corpus(ds, cfg=CleanConfig(min_tokens=3, allowed_langs=frozenset({"en", "es"})))
    assert sorted(r["doc_id"] for r in rep2["_kept"].take_all()) == [1, 2]
    rep1 = clean_corpus(ds, cfg=CleanConfig(min_tokens=3, allowed_langs=frozenset({"de"})))
    assert sorted(r["doc_id"] for r in rep1["_kept"].take_all()) == [3]


def test_clean_corpus_near_dup_keeps_native_min(ray_session):
    """Canonical keep uses NATIVE key order: group {2, 10} keeps 2, not the
    lexicographic '10'."""
    import ray.data

    from rayval.pipelines.clean_corpus import CleanConfig, clean_corpus

    t = "the quick brown fox jumps over the lazy dog " * 3
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([2, 10], type=pa.int64()),
                  "text": pa.array([t, t + "tail"])})
    )
    rep = clean_corpus(ds, cfg=CleanConfig(min_tokens=5, minhash_est_threshold=0.6))
    assert [r["doc_id"] for r in rep["_kept"].take_all()] == [2]


def test_clean_corpus_semijoin_fallback_majority_dup(ray_session):
    """A majority-duplicate corpus with broadcast_drop_limit=0 must route
    member filtering through the hash-partitioned anti semi-join (path
    recorded in the report) and produce counts identical to the broadcast
    path."""
    import ray.data

    from rayval.pipelines.clean_corpus import CleanConfig, clean_corpus

    base = "some sufficiently long unique sentence about distributed engines number"
    texts = {}
    for i in range(30):   # 30 docs in 10 exact-dup triples -> 20 dropped
        texts[i] = f"{base} {i % 10} with extra shared words appended here"
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(texts), type=pa.int64()),
                  "text": pa.array(list(texts.values()))})
    )
    rep_b = clean_corpus(ds, cfg=CleanConfig(min_tokens=3))
    rep_s = clean_corpus(ds, cfg=CleanConfig(min_tokens=3, broadcast_drop_limit=0))
    assert rep_b.get("exact_filter_path") == "broadcast"
    assert rep_s.get("exact_filter_path") == "semijoin"
    for k in ("rows_in", "rows_after_quality", "exact_dropped", "near_dropped", "rows_out"):
        assert rep_s[k] == rep_b[k], k
    assert rep_s["exact_dropped"] == 20
    assert sorted(r["doc_id"] for r in rep_s["_kept"].take_all()) == sorted(
        r["doc_id"] for r in rep_b["_kept"].take_all()
    )


def test_contaminated_docs_planted(ray_session):
    """Planted contamination: docs sharing a 3-gram with the benchmark are
    flagged with the exact distinct-shared-gram count; clean docs are not."""
    import ray.data

    from rayval.stages.docdedup import contaminated_docs

    bench = ["the secret benchmark answer is forty two"]
    docs = {
        0: "nothing to see here just ordinary corpus text",
        1: "he whispered the secret benchmark answer aloud",      # shares 2 grams
        2: "answer is forty two said the machine",                # shares 2 grams
        3: "forty two is answer the reversed order no gram",      # reordered: 0 grams
        4: "the secret benchmark answer is forty two verbatim",   # 5 grams (all of bench's)
    }
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(docs), type=pa.int64()),
                  "text": pa.array(list(docs.values()))})
    )
    out = contaminated_docs(ds, "text", "doc_id", bench, n=3)
    got = {r["doc_id"]: r["n_hits"] for r in out.to_pylist()}
    assert got == {1: 2, 2: 2, 4: 5}


def test_pack_sequences_greedy_reset(ray_session):
    """Packing vs a pure-Python greedy reference: budget respected, singleton
    overflow flagged, deterministic across block splits, no doc lost."""
    import numpy as np
    import ray.data

    from rayval.stages.packing import pack_sequences

    rng = np.random.default_rng(9)
    n = 120
    g = rng.integers(0, 3, n)
    k = np.arange(n)
    sz = rng.integers(1, 900, n)
    sz[5] = 5000  # singleton overflow
    sz[17] = 0    # zero-size doc packs but adds nothing
    t_blocks = [
        pa.table({"g": pa.array(g[i:i+17], pa.int64()), "k": pa.array(k[i:i+17], pa.int64()),
                  "sz": pa.array(sz[i:i+17], pa.int64())})
        for i in range(0, n, 17)
    ]
    out = pack_sequences(ray.data.from_arrow(t_blocks), "g", "k", "sz", budget=2000).take_all()
    assert len(out) == n
    by_row = {r["k"]: r for r in out}
    # python reference per group
    for grp in (0, 1, 2):
        keys = sorted(kk for kk, gg in zip(k, g) if gg == grp)
        exp_seq, exp_pos, s, acc, pos = {}, {}, 0, 0, 0
        for kk in keys:
            size = int(sz[kk])
            if pos > 0 and acc + size > 2000:
                s, acc, pos = s + 1, 0, 0
            exp_seq[kk], exp_pos[kk] = s, pos
            acc += size
            pos += 1
        for kk in keys:
            r = by_row[kk]
            assert (r["seq_id"], r["seq_pos"]) == (exp_seq[kk], exp_pos[kk]), (grp, kk, r)
            assert r["overflow"] == (r["seq_size"] > 2000)
    # every sequence's seq_size is the sum of its members' sizes
    agg = {}
    for r in out:
        agg.setdefault((r["g"], r["seq_id"]), [0, r["seq_size"]])[0] += r["size"]
    for (gg, sid), (tot, claimed) in agg.items():
        assert tot == claimed, (gg, sid)
    # determinism across a different block split
    out2 = pack_sequences(
        ray.data.from_arrow(pa.table({"g": pa.array(g, pa.int64()), "k": pa.array(k, pa.int64()),
                                      "sz": pa.array(sz, pa.int64())})),
        "g", "k", "sz", budget=2000,
    ).take_all()
    assert sorted(map(str, out)) == sorted(map(str, out2))


def test_repetition_scores_reference():
    """Vectorized repetition signal vs a pure-Python bigram counter,
    including empty/null/single-token docs."""
    import collections
    import re

    from rayval.functions.text import repetition_scores

    texts = ["a b a b a b", "x y z w", "", None, "q q q q q",
             "Spam SPAM spam ham spam spam", "one"]
    n_tok, n_gr, top = repetition_scores(pa.array(texts, pa.string()), 2)
    for i, t in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        grams = [" ".join(toks[j:j+2]) for j in range(len(toks) - 1)]
        c = collections.Counter(grams)
        assert n_tok[i] == len(toks), (i, t)
        assert n_gr[i] == len(grams), (i, t)
        assert top[i] == (max(c.values()) if c else 0), (i, t)


def test_pack_sequences_negative_sizes_clamped(ray_session):
    """Corrupt negative sizes clamp to 0 (a negative would break the cumsum
    monotonicity searchsorted relies on) — packing equals the all-zeros-for-
    negatives greedy reference."""
    import ray.data

    from rayval.stages.packing import pack_sequences

    t = pa.table({"g": pa.array([1] * 4, pa.int64()), "k": pa.array([0, 1, 2, 3], pa.int64()),
                  "sz": pa.array([3, 7, -3, -10], pa.int64())})
    out = pack_sequences(ray.data.from_arrow(t), "g", "k", "sz", budget=4).take_all()
    got = {r["k"]: (r["seq_id"], r["size"]) for r in out}
    # clamped sizes: [3, 7, 0, 0] -> greedy: [0], [1], [2, 3] — the zeros
    # cannot join seq 1 (its size 7 already exceeds the budget, and a doc
    # joins only if the resulting seq_size stays <= budget)
    assert got == {0: (0, 3), 1: (1, 7), 2: (2, 0), 3: (2, 0)}


def test_pii_counts_patterns():
    """Planted PII shapes hit; plain text and near-misses don't."""
    from rayval.functions.text import pii_counts

    c = pii_counts(pd.Series([
        "write to alice.smith+tag@sub.example.co.uk today",
        "not-an-email @ nowhere, and 123 is short",
        "+44 20 7946 0958 and (555) 867-5309",
        None,
        "version 1.2.3.4 released",           # dots, no @/digit-run
    ]))
    assert c["n_emails"].tolist() == [1, 0, 0, 0, 0]
    assert c["n_phones"].tolist() == [0, 0, 2, 0, 0]


def test_pack_sequences_sharded(ray_session):
    """n_shards splits each group into hash(key) subgroups packed
    independently: same budget guarantees, unique seq_ids (shard-encoded),
    no doc lost, deterministic."""
    import numpy as np
    import ray.data

    from rayval.stages.packing import pack_sequences

    rng = np.random.default_rng(31)
    n = 200
    t = pa.table({"g": pa.array(rng.integers(0, 2, n), pa.int64()),
                  "k": pa.array(np.arange(n), pa.int64()),
                  "sz": pa.array(rng.integers(1, 500, n), pa.int64())})
    ds = ray.data.from_arrow(t)
    out = pack_sequences(ds, "g", "k", "sz", budget=1200, n_shards=4).take_all()
    assert len(out) == n
    # per (g, seq_id): size sums match and fit the budget unless singleton
    agg = {}
    for r in out:
        a = agg.setdefault((r["g"], r["seq_id"]), [0, 0, r["seq_size"]])
        a[0] += r["size"]; a[1] += 1
    for (g, sid), (tot, cnt, claimed) in agg.items():
        assert tot == claimed
        assert claimed <= 1200 or cnt == 1
    # deterministic
    out2 = pack_sequences(ds, "g", "k", "sz", budget=1200, n_shards=4).take_all()
    assert sorted(map(str, out)) == sorted(map(str, out2))
    # shards genuinely split: more than one distinct shard prefix PER GROUP
    per_group_shards = {}
    for r in out:
        per_group_shards.setdefault(r["g"], set()).add(r["seq_id"] >> 32)
    assert all(len(s) > 1 for s in per_group_shards.values()), per_group_shards


def test_exact_dup_members_null_key_member_counts(ray_session):
    """A dup group whose members include a NULL key must still clear the
    n_total > 1 bar (regression: Arrow's keyed count skips null keys and the
    group undercounted to 1); grp = min over NON-null keys (SQL MIN)."""
    import ray.data

    from rayval.stages.docdedup import exact_dup_members

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(["b", None, "z"], type=pa.string()),
                  "text": pa.array(["same", "same", "other"])})
    )
    out = exact_dup_members(ds, "text", "doc_id")
    got = sorted(zip(out["doc_id"].to_pylist(), out["grp"].to_pylist()),
                 key=lambda x: (x[0] is None, x[0]))
    assert got == [("b", "b"), (None, "b")]


def test_kmeans_sample_block_independent_with_dup_keys(ray_session):
    """The training sample must not depend on block boundaries even when
    key_col is heavily duplicated (the old key-only hash made whole tie
    classes keep-or-drop per batch): the hash mixes vector contents, so the
    global bottom-by-hash set — and the centroids — are identical across
    block layouts and the coalesce+re-prune level."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.similarity import kmeans_centroids

    rng = np.random.default_rng(3)
    n, d = 600, 8
    vecs = rng.normal(size=(n, d))
    t = pa.table({
        "k": pa.array((np.arange(n) % 5).astype(np.int64)),  # 5 dup key values
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    })
    c1 = kmeans_centroids(ray.data.from_arrow(t).repartition(3), k=4,
                          key_col="k", sample_rows=128)
    c2 = kmeans_centroids(ray.data.from_arrow(t).repartition(23), k=4,
                          key_col="k", sample_rows=128)
    np.testing.assert_array_equal(c1, c2)


def test_kmeans_sample_block_independent_d1_keyless(ray_session):
    """d=1 regression: sum(v) == v[0] for every 1-dim vector, so XORing the
    SAME hash family over both reductions cancelled to all-zeros — every row
    tied and the sample silently became block-layout-dependent.  The two
    reductions now go through distinct families (hash64 + rehash), so the
    keyless d=1 sample — and the centroids — are layout-independent."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.similarity import kmeans_centroids

    rng = np.random.default_rng(7)
    vals = rng.normal(size=400)
    t = pa.table({"embedding": pa.array([[float(v)] for v in vals],
                                        pa.list_(pa.float64()))})
    c1 = kmeans_centroids(ray.data.from_arrow(t).repartition(3), k=4,
                          sample_rows=128)
    c2 = kmeans_centroids(ray.data.from_arrow(t).repartition(23), k=4,
                          sample_rows=128)
    np.testing.assert_array_equal(c1, c2)


def test_kmeans_sample_block_independent_permuted_tails(ray_session):
    """Vectors with equal sum AND equal first coordinate (permuted tails,
    e.g. [a,b,c] vs [a,c,b]) defeated the sum+first two-reduction hash: the
    whole fixture became one tie class and the sample was block-layout-
    dependent.  The third (seeded position-weighted) reduction distinguishes
    them, so centroids are identical across block layouts."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.similarity import kmeans_centroids

    rng = np.random.default_rng(11)
    n = 420
    tails = rng.normal(size=(n, 3))
    # force equal sum and equal first coordinate across ALL rows: v[0]=1.0,
    # last tail element compensates so every row sums to exactly 5.0
    vecs = np.column_stack([np.ones(n), tails])
    vecs[:, -1] = 5.0 - vecs[:, :-1].sum(axis=1)
    t = pa.table({"embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float64()))})
    c1 = kmeans_centroids(ray.data.from_arrow(t).repartition(3), k=4,
                          sample_rows=128)
    c2 = kmeans_centroids(ray.data.from_arrow(t).repartition(23), k=4,
                          sample_rows=128)
    np.testing.assert_array_equal(c1, c2)
