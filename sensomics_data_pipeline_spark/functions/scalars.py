"""Math / string / hash scalar functions (SURVEY.md §2.9).

All pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


#: Vendor-export column renames (``raw_data_reformat.py:153-162``; the
#: reference duplicates this dict in three scripts).
FEATURE_RENAME = {
    "Heart rate (bpm)": "hr",
    "Diastolic (mmHg)": "bp_dia",
    "Systolic (mmHg)": "bp_sys",
    "SaO2 (%)": "spo2",
    "Body temperature (C)": "st",
    "Pedometer": "step",
    "Total sleep": "sleep_total",
    "Deep sleep": "sleep_deep",
    "Light sleep": "sleep_light",
    "Event Markers": "Event_markers",
}


def g_force(acx: Column | str, acy: Column | str, acz: Column | str) -> Column:
    """Combined acceleration magnitude ``sqrt(x²+y²+z²)``
    (``acc_reformat.py:79`` — a per-row Python loop there; one codegen'd
    expression here)."""
    x = F.col(acx) if isinstance(acx, str) else acx
    y = F.col(acy) if isinstance(acy, str) else acy
    z = F.col(acz) if isinstance(acz, str) else acz
    return F.sqrt(x * x + y * y + z * z)


def portable_hash64(col: Column | str, seed: Column | str | int | None = None) -> Column:
    """Deterministic 60-bit hash that is reproducible in any engine.

    ``bigint(hex(md5(x)[:15]))`` — 15 hex digits = 60 bits, fits a signed
    64-bit int. Used for MinHash / SimHash / fingerprinting so results
    are verifiable against an independent SQL engine (DuckDB computes
    the identical value with ``('0x' || substr(md5(x),1,15))::BIGINT``).
    ``seed`` (int or column) derives independent hash functions:
    ``h_i(x) = H(i || ':' || x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        s = F.lit(seed) if isinstance(seed, int) else (
            F.col(seed) if isinstance(seed, str) else seed
        )
        c = F.concat(s.cast("string"), F.lit(":"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
