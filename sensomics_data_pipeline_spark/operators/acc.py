"""Accelerometer alignment + resampling (SURVEY.md §2.4 J1, §2.6 W4,
§2.3 R6/R7).

The reference aligns the acx/acy/acz streams with an O(n³) greedy
candidate search (``/root/reference/acc_reformat.py:136-215``), then
rebuilds rows one-by-one with O(n²) concat (``:118-131``). Two plans:

- **Plan A (default, scalable)** ``align_axes``: tolerance-bucketed
  as-of alignment — round each timestamp to the 0.5 s match tolerance,
  pivot the three axes onto one row per bucket. Linear, shuffle-on-bucket,
  no Python. Semantics: rows align when their timestamps fall in the
  same 0.5 s bucket (the reference's pairwise |Δt| ≤ 0.5 s check,
  ``:136-143``); unmatched samples drop, mirroring the greedy skip.
- **Plan B (parity)** ``align_axes_greedy``: exact reference greedy
  drop-order, per session/day group via ``applyInPandas`` — the
  algorithm is inherently sequential; partition by (subject, date) so
  state never crosses partitions.

NOTE reference bug (documented, SURVEY.md §2.4): ``xyz_match`` computes
the y–z distance twice and never checks x–z (``acc_reformat.py:138-139``).
Plan B replicates it behind ``replicate_xz_bug=True`` for golden parity;
Plan A's bucket semantics supersede it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensomics_data_pipeline_spark.functions.scalars import g_force
from sensomics_data_pipeline_spark.functions.timeops import second_of_day
from sensomics_data_pipeline_spark.operators.windows import sessionize


def align_axes(
    ac: DataFrame,
    partition_cols: list[str],
    ts_col: str = "date_time",
    kind_col: str = "kind",
    value_col: str = "data",
    tolerance_s: float = 0.5,
) -> DataFrame:
    """Plan A: bucket-pivot 3-axis alignment (J1 + R6).

    ``groupBy(bucket).pivot(kind)`` — the long→wide axis assembly
    (``acc_reformat.py:118-131``) fused with the alignment. ``first()``
    per bucket per axis (ties are duplicate reports inside the
    tolerance). Rows missing any axis are dropped, like the reference's
    greedy skip of unmatched samples.
    """
    bucket = F.floor(
        F.unix_micros(F.col(ts_col)) / int(tolerance_s * 1_000_000)
    ).alias("_bucket")
    wide = (
        ac.select(*partition_cols, bucket, ts_col, kind_col, value_col)
        .groupBy(*partition_cols, "_bucket")
        .pivot(kind_col, ["acx", "acy", "acz"])
        .agg(F.first(value_col))
        .withColumn(
            ts_col,
            F.timestamp_micros(
                (F.col("_bucket") * int(tolerance_s * 1_000_000)).cast("long")
            ),
        )
        .drop("_bucket")
    )
    return wide.filter(
        F.col("acx").isNotNull() & F.col("acy").isNotNull() & F.col("acz").isNotNull()
    )


def resample_10hz(
    aligned: DataFrame,
    partition_cols: list[str],
    ts_col: str = "date_time",
    sample_cols: tuple[str, str, str] = ("acx", "acy", "acz"),
    gap_seconds: float = 1.0,
    burst: bool = False,
) -> DataFrame:
    """W4 + R7: sessionize on >1 s gaps, then synthesize smooth 10 Hz
    timestamps (``smooth_timestamp``, ``acc_reformat.py:218-228``).

    Each aligned row fans into 5 output rows with timestamps
    ``session_start − 0.4 + 0.5·k + 0.1·pos`` (k = row index within
    session, pos = 0..4). With ``burst=True`` the sample columns are
    5-element arrays (the watch reports 5-sample bursts) and output row
    ``pos`` takes element ``pos`` of each array — the reference achieves
    this implicitly via pandas list-broadcast at ``acc_reformat.py:127``.
    Here: sessionize (lag+cumsum), ``row_number`` for k, ``posexplode``
    for the fan-out — all built-ins, no Python.
    """
    from pyspark.sql import Window

    sess = sessionize(aligned, partition_cols, ts_col, gap_seconds)
    w = Window.partitionBy(*partition_cols, "session_id").orderBy(ts_col)
    with_k = sess.withColumn("_k", F.row_number().over(w) - 1).withColumn(
        "_session_start", F.first(ts_col).over(w)
    )
    exploded = with_k.select(
        *partition_cols,
        "session_id",
        *sample_cols,
        F.posexplode(F.sequence(F.lit(0), F.lit(4))).alias("_pos", "_sub"),
        (
            F.unix_micros("_session_start")
            - 400_000
            + F.col("_k") * 500_000
        ).alias("_base_us"),
    )
    value_cols = [
        (F.element_at(F.col(c), F.col("_pos") + 1) if burst else F.col(c)).alias(c)
        for c in sample_cols
    ]
    return exploded.select(
        *partition_cols,
        "session_id",
        *value_cols,
        F.timestamp_micros(
            (F.col("_base_us") + F.col("_pos") * 100_000).cast("long")
        ).alias(ts_col),
    )


def enrich_acc(
    wide: DataFrame,
    ts_col: str = "date_time",
    bin_seconds: int = 300,
) -> DataFrame:
    """F5 enrichment (``acc_reformat.py:74-83``): second-of-day, 300-s
    bin, g-force magnitude — the reference's per-row Python loop as three
    codegen'd expressions."""
    return (
        wide.withColumn("seconds", second_of_day(ts_col))
        .withColumn("bin", F.floor(F.col("seconds") / bin_seconds).cast("long"))
        .withColumn("g_force", g_force("acx", "acy", "acz"))
    )


def align_axes_greedy(
    ac: DataFrame,
    partition_cols: list[str],
    ts_col: str = "date_time",
    kind_col: str = "kind",
    value_col: str = "data",
    tolerance_s: float = 0.5,
    match_range: int = 6,
    replicate_xz_bug: bool = True,
) -> DataFrame:
    """Plan B: exact greedy parity via ``applyInPandas`` (J1).

    Re-implements the reference's sequential alignment semantics
    (``match_acc``/``find_match``/``xyz_match``,
    ``acc_reformat.py:136-215``) per group: walk the three sorted
    streams; when the heads don't pairwise match within tolerance,
    search a growing window of upcoming rows for the triple minimizing
    total skipped samples and drop the skipped prefix. Written fresh
    from the semantic spec (SURVEY.md §2.4 J1) — vectorized numpy inner
    search instead of the reference's row-loop DataFrame cartesian.

    Groups are (subject, day) shaped via ``partition_cols``: state never
    crosses a group, so parallelism = number of groups.
    """
    import pandas as pd

    # axis value type follows the input payload (scalar stream or
    # 5-sample burst arrays)
    vtype = ac.schema[value_col].dataType.simpleString()
    out_fields = ", ".join(f"`{c}` string" for c in partition_cols)
    schema = (
        (out_fields + ", " if out_fields else "")
        + f"`{ts_col}` timestamp, acx {vtype}, acy {vtype}, acz {vtype}"
    )

    def _match(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        keys = {c: pdf[c].iloc[0] for c in partition_cols}
        streams = {}
        for axis in ("acx", "acy", "acz"):
            sub = pdf[pdf[kind_col] == axis].sort_values(ts_col)
            # integer microseconds end-to-end: float-seconds round-trips
            # introduce sub-µs noise that Arrow refuses to truncate
            streams[axis] = (
                sub[ts_col].to_numpy("datetime64[us]").astype("int64"),
                sub[value_col].to_numpy(),
            )
        tx, vx = streams["acx"]
        ty, vy = streams["acy"]
        tz, vz = streams["acz"]
        tolerance_us = int(tolerance_s * 1_000_000)

        def match3(a: int, b: int, c: int) -> bool:
            d1 = abs(a - b)
            d2 = abs(b - c)
            d3 = d2 if replicate_xz_bug else abs(a - c)
            return max(d1, d2, d3) <= tolerance_us

        ix = iy = iz = 0
        rows = []
        n = match_range
        while (
            ix < len(tx) - n and iy < len(ty) - n and iz < len(tz) - n
        ):
            if not match3(tx[ix], ty[iy], tz[iz]):
                found = None
                m = n
                while found is None:
                    cand = []
                    for i in range(min(m, len(tx) - ix)):
                        for j in range(min(m, len(ty) - iy)):
                            for k in range(min(m, len(tz) - iz)):
                                if match3(tx[ix + i], ty[iy + j], tz[iz + k]):
                                    cand.append((i + j + k, i, j, k))
                    if cand:
                        found = min(cand)
                    else:
                        m += 2
                _, di, dj, dk = found
                ix, iy, iz = ix + di, iy + dj, iz + dk
            rows.append((tx[ix], vx[ix], vy[iy], vz[iz]))
            ix, iy, iz = ix + 1, iy + 1, iz + 1
        out = pd.DataFrame(
            rows, columns=[ts_col, "acx", "acy", "acz"]
        )
        out[ts_col] = pd.to_datetime(out[ts_col], unit="us")
        for c, v in keys.items():
            out[c] = v
        return out[[*partition_cols, ts_col, "acx", "acy", "acz"]]

    return ac.groupBy(*partition_cols).applyInPandas(_match, schema)
