from .relational import (
    CMP_OPS,
    aggregate,
    bucket_by_quantiles,
    bucket_by_quantiles_grouped,
    cumulative_offsets,
    filter_rows,
    global_row_number,
    grouping_agg,
    join_skew_salted,
    join_tables,
    limit,
    ntile_distributed,
    order_by,
    project,
    rank_small_result,
    set_op,
    top_k_per_group,
)
from .asof import asof_join, resample_ffill
from .cdc import apply_changes, merge_upsert, scd2_history, snapshot_diff
from .profile import profile_table
from .range_join import time_band_join
from .sessionize import session_stats, sessionize

__all__ = [
    "time_band_join",
    "CMP_OPS",
    "aggregate",
    "filter_rows",
    "grouping_agg",
    "join_skew_salted",
    "join_tables",
    "limit",
    "order_by",
    "project",
    "set_op",
    "top_k_per_group",
    "global_row_number",
    "ntile_distributed",
    "bucket_by_quantiles",
    "bucket_by_quantiles_grouped",
    "rank_small_result",
    "cumulative_offsets",
    "asof_join",
    "profile_table",
    "resample_ffill",
    "snapshot_diff",
    "merge_upsert",
    "apply_changes",
    "scd2_history",
    "sessionize",
    "session_stats",
]
