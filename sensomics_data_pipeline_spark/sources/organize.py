"""Organize-stage filename semantics (SURVEY.md §2 S1/S10 companions):
subject-ID / stem / date inference from raw upload file names, as pure
column expressions feeding the partitioned sink.

Reference behavior being re-expressed (not copied):
- ``/root/reference/organize_raw_files.sh:77-103``: per-file directory
  key = the ``(\\w{2}-){5}\\w{2}_\\d{4}(-\\d{2}){2}`` substring (a
  MAC-like device id + date) grep'd out of the file name.
- ``/root/reference/organize_raw_files.py:23-41``
  (``auto_stem_detect``): the common name stem = file stem minus its
  trailing 11-char ``_YYYY-MM-DD`` suffix; unique across the directory
  or the caller must disambiguate.
- ``/root/reference/organize_raw_files.py:42-44`` (``make_dirs``):
  per-file date = first ``\\d{4}-\\d{2}-\\d{2}`` match.

The reference moves files into per-key directories with mkdir/mv; the
Spark-native equivalent derives the same keys as columns and lets
``partitionBy(subject_id, date)`` produce the identical layout as a
sink property — one distributed write instead of a driver-side file
loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: MAC-like device identifier: six dash-separated word-char pairs.
SUBJECT_ID_PATTERN = r"(?:\w{2}-){5}\w{2}"
#: Identifier + date, the organize stage's directory key.
SUBJECT_ID_DATE_PATTERN = SUBJECT_ID_PATTERN + r"_\d{4}(?:-\d{2}){2}"
DATE_PATTERN = r"\d{4}-\d{2}-\d{2}"


def _safe_decode(c: Column) -> Column:
    """Percent-decode a path, falling back to the raw string when it is
    not valid percent-encoding (e.g. a literal ``%`` in a raw filename
    like ``SaO2_98%_2024-03-01.json`` from a non-binaryFile listing) —
    an invalid escape must yield a usable key, not fail the whole job
    with CANNOT_DECODE_URL."""
    return F.coalesce(F.try_url_decode(c), c)


def file_stem(path: Column | str) -> Column:
    """File name without directories or the final extension."""
    c = F.col(path) if isinstance(path, str) else path
    base = F.element_at(F.split(_safe_decode(c), "/"), -1)
    return F.regexp_replace(base, r"\.[^.]*$", "")


def subject_id(path: Column | str) -> Column:
    """The device/subject identifier embedded in an upload file name
    ('' when absent, matching the reference's empty grep)."""
    c = F.col(path) if isinstance(path, str) else path
    return F.regexp_extract(_safe_decode(c), SUBJECT_ID_PATTERN, 0)


def subject_id_date(path: Column | str) -> Column:
    """The organize stage's full directory key: ``<id>_<date>``."""
    c = F.col(path) if isinstance(path, str) else path
    return F.regexp_extract(_safe_decode(c), SUBJECT_ID_DATE_PATTERN, 0)


def file_date(path: Column | str) -> Column:
    """First ``YYYY-MM-DD`` in the file name, as a DATE (null if none)."""
    c = F.col(path) if isinstance(path, str) else path
    return F.to_date(
        F.nullif(F.regexp_extract(_safe_decode(c), DATE_PATTERN, 0), F.lit(""))
    )


def with_organize_keys(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Attach the organize-stage partition keys (subject_id, date) to a
    file listing (e.g. ``binaryFile`` scan or ``read_zip_members``
    output) — pass ``partition_cols=["subject_id", "date"]`` to the
    sink for the reference's directory layout."""
    return df.withColumn("subject_id", subject_id(path_col)).withColumn(
        "date", file_date(path_col)
    )


def auto_stem_detect(df: DataFrame, path_col: str = "path") -> list[str]:
    """Distributed ``auto_stem_detect``: distinct file stems minus the
    trailing 11-char ``_YYYY-MM-DD`` suffix. Returns the sorted unique
    stems — length 1 means unambiguous (the reference prompts the user
    otherwise; callers decide). One tiny distinct-agg job; never a
    driver-side glob."""
    stems = (
        df.select(file_stem(path_col).alias("_stem"))
        .select(
            F.substring(
                "_stem", F.lit(1), F.greatest(F.length("_stem") - 11, F.lit(0))
            ).alias("s")
        )
        .distinct()
    )
    return sorted(r["s"] for r in stems.collect())
