"""Sequence packing for training batches (north-star op, no reference
analog): assign documents to fixed-token-budget packs so training
sequences waste minimal padding.

Optimal bin packing is NP-hard and inherently sequential; the
distributed shape here is the standard compromise: documents are
hash-assigned to ``n_groups`` independent groups, and each group runs
deterministic first-fit-decreasing (FFD) locally in one Arrow batch.
Waste stays within a few percent of global FFD for realistic length
distributions (many docs per group), while the plan is one shuffle +
an embarrassingly parallel ``applyInPandas`` — the same recipe works
unchanged on a 100-TB corpus by raising ``n_groups`` so each group
fits in executor memory.

Determinism: group assignment is a hash of the key (not
``spark_partition_id``), and FFD orders by (tokens desc, key asc), so
output is stable across cluster layouts — required for the tests and
for reproducible training runs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    key_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_groups: int = 64,
) -> DataFrame:
    """Pack documents into ``(pack_id, doc_id, n_tokens, pack_fill)``
    rows with per-pack token sums ≤ ``budget``.

    A document LONGER than the budget gets its own pack with
    ``oversize = true`` (callers decide whether to truncate or split —
    this operator never drops data silently).
    """
    import pandas as pd

    out_schema = (
        f"pack_id long, {key_col} long, {tokens_col} long, "
        "pack_fill long, oversize boolean"
    )

    def pack_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            [tokens_col, key_col], ascending=[False, True]
        ).reset_index(drop=True)
        group = int(pdf["_grp"].iloc[0])
        fills: list[int] = []
        members: list[list[int]] = []
        assignment: list[int] = []
        for i in range(len(pdf)):
            t = int(pdf[tokens_col].iloc[i])
            placed = None
            if t <= budget:
                for p, fill in enumerate(fills):
                    if fill + t <= budget:
                        placed = p
                        break
            if placed is None:
                placed = len(fills)
                fills.append(0)
                members.append([])
            fills[placed] += t
            members[placed].append(i)
            assignment.append(placed)
        pdf = pdf.assign(
            pack_id=[group * 1_000_000_000 + p for p in assignment],
            pack_fill=[fills[p] for p in assignment],
            oversize=pdf[tokens_col] > budget,
        )
        return pdf[["pack_id", key_col, tokens_col, "pack_fill", "oversize"]]

    grouped = df.select(
        key_col,
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_groups)).alias("_grp"),
    )
    return grouped.groupBy("_grp").applyInPandas(pack_group, out_schema)
