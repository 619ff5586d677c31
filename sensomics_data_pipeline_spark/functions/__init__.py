from sensomics_data_pipeline_spark.functions.timeops import (  # noqa: F401
    adjust_clock_skew,
    epoch_ms_to_timestamp,
    second_of_day,
    to_minutes,
    tumbling_window_start,
    with_date_time_columns,
)
from sensomics_data_pipeline_spark.functions.scalars import (  # noqa: F401
    g_force,
    portable_hash64,
)
