"""Composed training-data cleaning pipeline over a documents table — the
end-to-end workflow the engine's text operators exist for, chained as ONE
streaming pass per stage family (engine-new surface; the reference has no
corpus tooling):

    read (column-pruned)
      -> quality + language annotation   (vectorized map_batches, no shuffle)
      -> quality / language FILTER       (streaming filter)
      -> exact dedup, keep-first         (partial counts -> tiny groupby ->
                                          broadcast losers; no row shuffle)
      -> near-dup dedup, keep-canonical  (MinHash-LSH banded shuffle ->
                                          connected components -> broadcast
                                          non-canonical members)
      -> write cleaned parquet (partitioned) + per-stage report

Scale shape: the corpus text crosses the cluster exactly once per annotate/
filter pass and (below ``broadcast_drop_limit``) NEVER enters a shuffle —
both dedup stages exchange only (hash/band, key, signature) rows, and the
drop-sets broadcast via ``ray.put`` are bounded by |duplicate members|, not
corpus size.  When a majority-duplicate corpus breaks that small-side
assumption, :func:`_filter_out` routes the member filter through an explicit
hash-partitioned anti semi-join instead (path recorded in the report).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rayval.functions.text import langid, quality_scores
from rayval.stages.docdedup import exact_dup_members, minhash_lsh_candidates, dup_groups_from_pairs


@dataclass
class CleanConfig:
    min_tokens: int = 5
    max_stop_ratio_e6: int = 900_000   # drop docs that are ~all stopwords
    allowed_langs: Optional[frozenset] = None  # None = keep every language
    minhash_est_threshold: float = 0.7
    write_partitions: int = 8
    broadcast_drop_limit: int = 1_000_000  # drop-sets up to this broadcast via
    # ray.put + per-batch is_in (the duplicate-members-are-few fast path);
    # BIGGER sets (majority-duplicate corpora) route through an explicit
    # hash-partitioned anti semi-join (stages/join.bucket_join against the
    # drop-key set), so no process ever holds the whole drop set — the corpus
    # pays one all-to-all in that regime, which is unavoidable: the keep/drop
    # decision needs every row co-located with 1/B of a corpus-sized set
    drop_join_buckets: int = 32


def annotate(batch: pa.Table) -> pa.Table:
    """Quality + language columns, fully vectorized (functions/text.py)."""
    texts = batch["text"].to_pandas().fillna("")
    q = quality_scores(texts)
    n_tok = q["n_tokens"].to_numpy(dtype=np.int64)
    n_stop = q["n_stop"].to_numpy(dtype=np.int64)
    stop_e6 = np.zeros(len(n_tok), dtype=np.int64)
    nz = n_tok > 0
    stop_e6[nz] = (1_000_000 * n_stop[nz]) // n_tok[nz]
    return (
        batch.append_column("n_tokens", pa.array(n_tok))
        .append_column("stop_ratio_e6", pa.array(stop_e6))
        .append_column("lang_pred", pa.array(langid(texts), type=pa.string()))
    )


def _filter_out(
    kept: "ray.data.Dataset", drop: set, key_t, cfg: CleanConfig, report: dict, stage: str
) -> "ray.data.Dataset":
    """Remove rows whose doc_id is in ``drop``: broadcast is_in below
    ``cfg.broadcast_drop_limit``, hash-partitioned anti semi-join above it.
    Records the path taken in ``report[f"{stage}_filter_path"]``."""
    if len(drop) <= cfg.broadcast_drop_limit:
        report[f"{stage}_filter_path"] = "broadcast"
        ref = ray.put(pa.array(sorted(drop), type=key_t))
        # fill_null(True): a null doc_id is never IN the drop set, so it is
        # KEPT — pinned explicitly because is_in(null) is null and a bare
        # filter would silently drop it (the semijoin path keeps it: null
        # keys match nothing in an Arrow join)
        return kept.map_batches(
            lambda b: b.filter(
                pc.fill_null(pc.invert(pc.is_in(b["doc_id"], value_set=ray.get(ref))), True)
            ),
            batch_format="pyarrow",
        )
    report[f"{stage}_filter_path"] = "semijoin"
    from rayval.stages.join import bucket_join

    drop_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(sorted(drop), type=key_t),
                  "__drop": pa.array(np.ones(len(drop), dtype=np.int8))})
    )
    cols = list(kept.schema().names)
    joined = bucket_join(kept, drop_ds, key="doc_id", n_buckets=cfg.drop_join_buckets, how="left")
    return joined.map_batches(
        lambda b: b.filter(b["__drop"].is_null()).select(cols), batch_format="pyarrow"
    )


def clean_corpus(
    ds: "ray.data.Dataset",
    out_dir: Optional[str] = None,
    cfg: Optional[CleanConfig] = None,
) -> dict:
    """Run the full cleaning chain; returns a per-stage report dict
    (counts are exact).  ``out_dir`` writes the cleaned corpus as
    partitioned parquet; None skips the write (report only)."""
    cfg = cfg or CleanConfig()  # fresh per call: a shared mutable default
    # dataclass would leak one caller's mutations into every later call
    report: dict = {}
    ds = ds.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True).materialize()
    report["rows_in"] = ds.count()

    kept = ds.filter(
        expr=f"n_tokens >= {cfg.min_tokens} and stop_ratio_e6 <= {cfg.max_stop_ratio_e6}"
    )
    if cfg.allowed_langs is not None:
        langs = sorted(cfg.allowed_langs)
        quoted = ", ".join(f"'{l}'" for l in langs)
        # BRACKET list syntax: Ray's filter-expr parser has no visit_Tuple,
        # so `in ('en', 'es')` crashes and `in ('en')` parses as a plain
        # string whose characters get iterated
        kept = kept.filter(expr=f"lang_pred in [{quoted}]")
    kept = kept.materialize()
    report["rows_after_quality"] = kept.count()

    # exact dedup: drop every member of an exact-dup group EXCEPT its min key
    members = exact_dup_members(kept, "text", "doc_id")
    drop_exact: set = set()
    if members.num_rows:
        mdf = members.to_pandas()
        drop_exact = set(mdf["doc_id"]) - set(mdf["grp"])  # grp = min key per group
    report["exact_dup_members"] = int(members.num_rows)
    report["exact_dropped"] = len(drop_exact)
    key_t0 = kept.schema().base_schema.field("doc_id").type
    if drop_exact:
        kept = _filter_out(kept, drop_exact, key_t0, cfg, report, "exact").materialize()

    # near-dup dedup: connected components over LSH candidates, keep the
    # canonical (lexicographically-smallest) member of each group
    str_keyed = kept.map_batches(
        lambda b: pa.table({"doc_id": pc.cast(b["doc_id"], pa.string()), "text": b["text"]}),
        batch_format="pyarrow",
    )
    pairs = minhash_lsh_candidates(
        str_keyed, "text", "doc_id", est_threshold=cfg.minhash_est_threshold
    )
    drop_near: set = set()
    key_t = kept.schema().base_schema.field("doc_id").type
    if pairs.num_rows:
        groups = dup_groups_from_pairs(pairs)
        gdf = groups.to_pandas()
        # pick the canonical member by the NATIVE key order, matching the
        # exact-dedup stage (lexicographic min of the stringified id would
        # keep 10 over 2 for integer keys — inconsistent 'keep-first')
        if pa.types.is_integer(key_t):
            gdf["key_n"] = gdf["key"].astype(np.int64)
        elif pa.types.is_string(key_t) or pa.types.is_large_string(key_t):
            gdf["key_n"] = gdf["key"]
        else:
            raise NotImplementedError(f"clean_corpus key type {key_t} (int/string supported)")
        canon = gdf.groupby("group")["key_n"].transform("min")
        drop_near = set(gdf.loc[gdf["key_n"] != canon, "key_n"])
    report["near_dup_pairs"] = int(pairs.num_rows)
    report["near_dropped"] = len(drop_near)
    if drop_near:
        kept = _filter_out(kept, drop_near, key_t, cfg, report, "near")
    kept = kept.materialize()
    report["rows_out"] = kept.count()

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        kept.repartition(cfg.write_partitions).write_parquet(out_dir)
        report["out_dir"] = out_dir
    report["_kept"] = kept
    return report
