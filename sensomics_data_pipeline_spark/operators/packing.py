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


#: auto-sizing target: enough docs per group that local FFD stays
#: within a few percent of global FFD, small enough that the per-group
#: Arrow batch is trivially memory-bounded
_TARGET_DOCS_PER_GROUP = 1024

#: auto-sizing ceiling — one group per shuffle partition is plenty at
#: any scale the group count itself should not become a driver burden
_MAX_AUTO_GROUPS = 65536


def pack_sequences(
    df: DataFrame,
    key_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_groups: int | None = None,
) -> DataFrame:
    """Pack documents into ``(pack_id, doc_id, n_tokens, pack_fill)``
    rows with per-pack token sums ≤ ``budget``.

    A document LONGER than the budget gets its own pack with
    ``oversize = true`` (callers decide whether to truncate or split —
    this operator never drops data silently).

    ``n_groups=None`` (the default) auto-sizes the group count from a
    cheap count of the (key, tokens) projection:
    ``clamp(ceil(n_docs / 1024), 1, 65536)`` — per-group Python work
    stays CONSTANT as data grows (the r5 rehearsal measured slope 3.74
    with a pinned group count: linear per-group work, flat
    parallelism). Callers that cannot afford the extra count job — or
    that need byte-stable pack ids across differently-sized inputs —
    pass an explicit count.
    """
    import numpy as np
    import pandas as pd

    if n_groups is None:
        n_docs = df.select(key_col).count()
        n_groups = max(
            1,
            min(
                _MAX_AUTO_GROUPS,
                -(-n_docs // _TARGET_DOCS_PER_GROUP),
            ),
        )

    out_schema = (
        f"pack_id long, {key_col} long, {tokens_col} long, "
        "pack_fill long, oversize boolean"
    )

    def pack_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # First-fit-decreasing, vectorized: the scan for "first pack
        # with room" is one numpy comparison over the fills array per
        # doc (C speed) instead of a Python list walk — identical
        # placement decisions, ~40x faster on multi-thousand-doc
        # groups (the placement loop itself was the r5 hot spot).
        pdf = pdf.sort_values(
            [tokens_col, key_col], ascending=[False, True]
        ).reset_index(drop=True)
        group = int(pdf["_grp"].iloc[0])
        toks = pdf[tokens_col].to_numpy(dtype=np.int64)
        n = len(toks)
        fills = np.zeros(n, dtype=np.int64)  # ≤ one pack per doc
        assignment = np.empty(n, dtype=np.int64)
        n_packs = 0
        for i in range(n):
            t = toks[i]
            placed = -1
            if t <= budget and n_packs:
                room = fills[:n_packs] + t <= budget
                j = int(np.argmax(room))
                if room[j]:
                    placed = j
            if placed < 0:
                placed = n_packs
                n_packs += 1
            fills[placed] += t
            assignment[i] = placed
        pdf = pdf.assign(
            pack_id=group * 1_000_000_000 + assignment,
            pack_fill=fills[assignment],
            oversize=toks > budget,
        )
        return pdf[["pack_id", key_col, tokens_col, "pack_fill", "oversize"]]

    grouped = df.select(
        key_col,
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_groups)).alias("_grp"),
    )
    return grouped.groupBy("_grp").applyInPandas(pack_group, out_schema)
