"""Fixed StructType schemas for every table the engine touches.

The reference infers schemas dynamically (``pd.read_json`` at
``/root/reference/raw_data_reformat.py:28``; CSV inference at
``/root/reference/activity_categorize.py:50-66``). In the new engine
every production read passes an explicit schema — inference is a full
extra pass over 100 TB and non-deterministic under dirty data.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Sensor-pipeline schemas (SURVEY.md §1)
# ---------------------------------------------------------------------------

#: Raw watch JSON record (FIXTURES.md F1). ``data`` is polymorphic in the
#: source (scalar / 1-5 element list / nested); we read it as
#: array<double> and normalize to scalar rows at unpivot time — the
#: nested ``multi measure`` payload ``[hr, spo2, [bp_sys, bp_dia], st]``
#: cannot be a clean array<double>, so raw ingest keeps a string form and
#: parses with from_json per-kind (see sources/readers.py).
RAW_JSON_SCHEMA = T.StructType(
    [
        T.StructField("time", T.LongType(), False),  # epoch milliseconds
        T.StructField("kind", T.StringType(), False),
        T.StructField("data", T.StringType(), True),  # JSON-encoded payload
    ]
)

#: Long/EAV measurement table (FIXTURES.md F3) — the central abstraction.
MEASUREMENTS_SCHEMA = T.StructType(
    [
        T.StructField("jname", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("data", T.DoubleType(), True),
        T.StructField("date_time", T.TimestampType(), False),
        T.StructField("date", T.DateType(), True),
        T.StructField("time", T.StringType(), True),
    ]
)

#: Raw accelerometer extract (FIXTURES.md F4): 5-sample burst per row.
AC_RAW_SCHEMA = T.StructType(
    [
        T.StructField("jname", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # acx | acy | acz
        T.StructField("data", T.ArrayType(T.DoubleType()), True),
        T.StructField("date_time", T.TimestampType(), False),
    ]
)

#: Aligned wide accelerometer table (FIXTURES.md F5).
AC_REFORMATTED_SCHEMA = T.StructType(
    [
        T.StructField("acx", T.DoubleType(), True),
        T.StructField("acy", T.DoubleType(), True),
        T.StructField("acz", T.DoubleType(), True),
        T.StructField("date_time", T.TimestampType(), False),
        T.StructField("seconds", T.DoubleType(), True),
        T.StructField("bin", T.LongType(), True),
        T.StructField("g_force", T.DoubleType(), True),
    ]
)

#: Interval table (sleep / active / rest periods).
INTERVAL_SCHEMA = T.StructType(
    [
        T.StructField("start_time", T.TimestampType(), False),
        T.StructField("end_time", T.TimestampType(), False),
    ]
)

#: Categorized interval table (FIXTURES.md F6).
CATEGORIZED_INTERVAL_SCHEMA = T.StructType(
    [
        T.StructField("start_time", T.TimestampType(), False),
        T.StructField("end_time", T.TimestampType(), False),
        T.StructField("category", T.StringType(), False),
    ]
)

#: Include/exclude interval list (flatline filter output,
#: ``/root/reference/filtering_data.py:98-110``).
INCLUDE_INTERVAL_SCHEMA = T.StructType(
    [
        T.StructField("start_time", T.TimestampType(), False),
        T.StructField("end_time", T.TimestampType(), False),
        T.StructField("include", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver synthetic tables (TESTDATA.md) — explicit schemas for reads
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
