"""TF-IDF keyword extraction — per-document top-k terms, distributed.

A training-data pipeline uses this for cheap keyword features, topic-ish
clustering inputs and corpus triage.  The operator is a COMPOSITION of the
engine's existing primitives, demonstrating the intended way to build new
pipelines out of them:

1. **tf rows** (map-only): the shared tokenizer (``functions/text.
   token_stream`` — byte-for-byte the DuckDB oracles' ``regexp_extract_all +
   lower``) feeds one vectorized Arrow ``group_by`` per batch.  A document is
   ONE row, so a batch's (doc, token, tf) rows are final — no cross-batch
   merge.
2. **df** (combiner + tiny groupby): tf rows are globally unique per
   (doc, token), so document frequency is a per-batch partial count on token
   followed by a ``groupby(token).sum`` over vocabulary-sized partials —
   input rows never re-shuffle.
3. **join** (the one real exchange): ``stages/join.bucket_join`` on token —
   both sides narrow.  Stop-word tokens are simultaneously the hottest join
   keys AND the lowest-idf terms; ``max_df`` drops them before the join
   (identically in any SQL oracle), the same guard the n-gram Jaccard stage
   uses for hot grams.
4. **score** (map-only): integer fixed-point ``score_e6 = tf *
   ((n_docs * 1_000_000) // df)`` — a reciprocal-df idf (rank-monotone in
   N/df, chosen over log-idf so both engine and DuckDB compute EXACT int64
   arithmetic; a float ln() would hash-mismatch on rounding).  Overflow
   bound: tf x (N·1e6/df) must fit int64 — fine through ~1e9 docs with
   singleton-df terms; past that pass ``max_df``/min_df or rescale.
5. **top-k per doc**: ``stages/topn.topn_per_group`` (score desc, token-
   ascending tie-break) — per-batch combiner bounds any doc at k rows per
   batch before the final exchange.

Output: (key_col, score_e6 int64, token string) — ``topn_per_group``'s
projection; join tf/df back by (key, token) if needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayval.functions.text import token_stream
from rayval.stages.join import bucket_join
from rayval.stages.topn import topn_per_group


def tf_rows(ds, text_col: str, key_col: str):
    """(key, token, tf) rows — one per distinct (document, token)."""
    key_t = ds.schema().base_schema.field(key_col).type

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {key_col: pa.array([], key_t), "token": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        flat, p = token_stream(batch[text_col])
        if len(p) == 0:
            return empty
        t = pa.table({key_col: batch[key_col].take(pa.array(p)), "token": flat})
        part = (
            t.group_by([key_col, "token"]).aggregate([("token", "count")]).combine_chunks()
        )
        return pa.table(
            {key_col: part[key_col], "token": part["token"],
             "tf": part["token_count"].cast(pa.int64())}
        )

    return ds.select_columns([text_col, key_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )


def tfidf_topk(
    ds,
    text_col: str,
    key_col: str,
    k: int = 5,
    n_docs: int | None = None,
    n_buckets: int = 32,
    max_df: int | None = None,
):
    """Per-document top-``k`` tokens by integer tf-idf (see module doc).

    ``n_docs`` is the idf's N (defaults to ``ds.count()`` — parquet metadata,
    no data read).  ``max_df`` drops tokens appearing in more than that many
    documents BEFORE the join (stop-word/hot-key guard; replicate with a
    ``HAVING`` clause in any oracle)."""
    if n_docs is None:
        n_docs = ds.count()
    tf = tf_rows(ds, text_col, key_col)

    def df_partial(batch: pa.Table) -> pa.Table:
        part = batch.group_by("token").aggregate([("token", "count")]).combine_chunks()
        return pa.table(
            {"token": part["token"], "df_n": part["token_count"].cast(pa.int64())}
        )

    from ray.data.aggregate import Sum

    df = (
        tf.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("df_n", alias_name="df"))
    )
    if max_df is not None:
        df = df.filter(expr=f"df <= {int(max_df)}")

    joined = bucket_join(tf, df, key="token", n_buckets=n_buckets)

    idf_num = np.int64(n_docs) * np.int64(1_000_000)

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch["tf"].to_numpy(zero_copy_only=False)
        dfv = batch["df"].to_numpy(zero_copy_only=False)
        s = tfv * (idf_num // dfv)
        return batch.append_column("score_e6", pa.array(s, type=pa.int64()))

    scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return topn_per_group(scored, key_col, "score_e6", k, tie_col="token")
