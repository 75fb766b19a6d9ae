"""Sequence packing: assign documents to token-budget bins for training.

North-star extension (not in the reference, SURVEY.md §2.7): LLM
training consumes fixed-length contexts, so curation pipelines pack
variable-length documents into bins of ~context-length tokens. Two
deterministic policies:

- ``concat_pack_bins`` — concatenation packing: the group's token
  stream is (conceptually) concatenated in ``order_col`` order and cut
  at exact ``budget`` boundaries; a document belongs to the bin where
  it ENDS. This is what concat-and-chunk dataloaders do; it is a
  closed-form window expression (whole-stage codegen, one shuffle on
  the group key) and therefore cross-engine oracle-checkable.
- ``greedy_pack_bins`` — first-fit-contiguous greedy: a new bin opens
  when the CURRENT bin would overflow, so bins never exceed the budget
  (except a single oversized document, which gets its own bin). The
  running "current bin" state is inherently sequential per group, so
  this is an ``applyInPandas`` over groups — each group packs in one
  task, parallelism = number of groups.

Scale shape for both: partitioned by the group columns — pack per
shard/language/source, never globally (a global pack would serialize
the corpus through one partition, which this API deliberately does not
offer).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check(group_cols: Sequence[str], budget: int) -> None:
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty: a global pack would serialize "
            "the corpus through one window partition — pack per shard/"
            "language instead"
        )


def _order_list(order_col: str | Sequence[str]) -> list[str]:
    """Normalize the ordering spec. Pass EVERY column needed to make the
    order total (e.g. ``["shard_pos", "doc_id"]``): with ties left
    unbroken, window/sort order — and therefore bin assignment — is
    whatever the shuffle happened to produce."""
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if not cols:
        raise ValueError("order_col must name at least one column")
    return cols


def concat_pack_bins(
    df: DataFrame,
    group_cols: Sequence[str],
    token_col: str,
    budget: int,
    *,
    order_col: str | Sequence[str],
    bin_col: str = "bin_id",
) -> DataFrame:
    """Concatenation packing (see module docstring): ``bin_col`` =
    ceil(inclusive-prefix-sum(tokens) / budget) - 1, clamped at 0.
    Pure window expression — deterministic and SQL-expressible
    (DuckDB twin: SUM(...) OVER (PARTITION BY g ORDER BY o ROWS
    UNBOUNDED PRECEDING)).

    ``order_col`` may be a list when one column does not make the order
    total (ties ⇒ nondeterministic bins). NULL ``token_col`` values
    contribute 0 to the prefix sum (SQL SUM-ignores-NULL semantics on
    both engines); the sum is coalesced so an all-NULL prefix still
    yields bin 0 instead of a NULL bin id."""
    _check(group_cols, budget)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*_order_list(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inc_sum = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    bin_id = (F.ceil(inc_sum / F.lit(budget)) - 1).cast("long")
    return df.withColumn(bin_col, F.greatest(bin_id, F.lit(0).cast("long")))


def greedy_pack_bins(
    df: DataFrame,
    group_cols: Sequence[str],
    token_col: str,
    budget: int,
    *,
    order_col: str | Sequence[str],
    bin_col: str = "bin_id",
) -> DataFrame:
    """First-fit-contiguous greedy packing (see module docstring): bins
    never exceed ``budget`` except for a single oversized document.
    Sequential per group ⇒ Arrow-batched ``applyInPandas``; output =
    input columns + ``bin_col``.

    ``order_col`` may be a list (see ``concat_pack_bins``). NULL
    ``token_col`` values raise: a NaN would silently poison the running
    fill (NaN comparisons are all False ⇒ every subsequent document
    lands in the current bin and the budget invariant is void)."""
    _check(group_cols, budget)
    group_cols = list(group_cols)
    order_cols = _order_list(order_col)
    out_schema = df.withColumn(bin_col, F.lit(0).cast("long")).schema

    def pack(pdf):
        import numpy as np

        if pdf[token_col].isna().any():
            bad = pdf.loc[pdf[token_col].isna(), order_cols].head(3)
            raise ValueError(
                f"greedy_pack_bins: NULL {token_col!r} values (e.g. at "
                f"{bad.to_dict('records')}) would void the budget "
                "invariant — filter or impute them first"
            )
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        toks = pdf[token_col].to_numpy()
        bins = np.empty(len(toks), dtype=np.int64)
        cur_bin, cur_fill = 0, 0
        for i, t in enumerate(toks):
            if cur_fill > 0 and cur_fill + t > budget:
                cur_bin += 1
                cur_fill = 0
            bins[i] = cur_bin
            cur_fill += t
        pdf[bin_col] = bins
        return pdf

    return df.groupBy(*group_cols).applyInPandas(pack, schema=out_schema)


def materialize_packed_sequences(
    df: DataFrame,
    group_cols: Sequence[str],
    text_col: str,
    bin_col: str = "bin_id",
    *,
    order_col: str | Sequence[str],
    sep: str = "\n\n",
    out_col: str = "packed_text",
    boundaries_col: str | None = None,
) -> DataFrame:
    """Finish a pack: concatenate each bin's documents (in ``order_col``
    order) into one training sequence — (group_cols..., bin_col,
    packed_text, n_docs).

    ``boundaries_col``: when set, also emit the character START offset
    of each document inside ``packed_text`` (``array<long>``, one entry
    per document, first is 0) — the per-document boundary metadata a
    training loader needs for loss masking / block-diagonal attention
    over packed sequences. Computed as a codegen ``aggregate`` prefix
    fold over the sorted texts; no extra shuffle.

    One keyed aggregation on (group, bin): collect (order, text)
    structs, array_sort (struct ordering = field order, so the order
    columns lead), then transform+array_join — all codegen, no window,
    no Python. Bins are budget-bounded by construction, so a bin's
    concatenated payload is bounded too (no skew blow-up).
    """
    _check(group_cols, 1)
    order_cols = _order_list(order_col)
    key = [*group_cols, bin_col]
    pair = F.struct(*[F.col(c) for c in order_cols], F.col(text_col).alias("__t__"))
    texts = F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["__t__"])
    aggs = [
        F.count("*").alias("n_docs"),
        F.array_join(texts, sep).alias(out_col),
    ]
    out_cols = [*key, out_col, "n_docs"]
    if boundaries_col is not None:
        offsets = F.aggregate(
            texts,
            F.struct(
                F.array().cast("array<long>").alias("o"),
                F.lit(0).cast("long").alias("c"),
            ),
            lambda acc, t: F.struct(
                F.concat(acc["o"], F.array(acc["c"])).alias("o"),
                (acc["c"] + F.length(t) + F.lit(len(sep))).alias("c"),
            ),
            lambda acc: acc["o"],
        )
        aggs.append(offsets.alias(boundaries_col))
        out_cols.append(boundaries_col)
    return df.groupBy(*key).agg(*aggs).select(*out_cols)
