"""Declared-query plans: the engine's DuckDB-oracle-checked query surface.

Importing this package populates the registry; modules self-register via
the :func:`registry.register` decorator. Registry order == driver
correctness-pass order, so ordering is deliberate:

1. ``reference_queries`` (q01-q10) — the SURVEY §2o core — registers
   FIRST so those rows are never lost to a driver budget cut.
2. The round-1 driver pass truncated after 50 rows; the 50 names that
   already earned a green CORRECTNESS_r01 row are rotated to the BACK of
   the registry so the 60 previously-rowless queries get driver rows
   before any budget runs out.
"""

from . import reference_queries  # noqa: F401  (q01-q10 first)
from . import analytics  # noqa: F401
from . import analytics_ext  # noqa: F401
from . import analytics_wave3  # noqa: F401
from . import analytics_wave4  # noqa: F401
from . import llm_ops  # noqa: F401
from .registry import REGISTRY, oracle_sql, queries, register  # noqa: F401

# Names with a green row in CORRECTNESS_r01.json (driver budget covered
# exactly these 50). Rotating them to the back gives every other query
# first claim on the next round's correctness budget; they remain fully
# covered by the local pytest oracle-parity suite either way.
_R01_ROWED = [
    "j01_broadcast_join", "j02_sortmerge_join", "j03_semi_join",
    "j04_anti_join", "j05_star_join", "j08_tpch_q3_shape", "j06_asof_join",
    "j07_range_join", "a01_pricing_summary", "a02_rollup", "a03_cube",
    "a04_count_distinct", "a05_approx_count_distinct", "a06_having",
    "a07_percentiles", "a09_pivot", "a08_grouping_sets", "w01_topk_per_group",
    "w02_running_total", "w03_lag_delta", "w05_moving_avg", "w04_rank_share",
    "s01_global_topk", "u01_union_distinct", "u02_intersect", "u03_except",
    "u04_except_all", "f01_string_funcs", "f02_date_funcs", "f03_math_funcs",
    "f04_case_expr", "f06_array_funcs", "f08_from_json", "f07_map_funcs",
    "f09_explode", "f10_regexp_funcs", "w06_distribution_ranks",
    "a10_conditional_agg", "q11_scalar_subquery", "q12_exists_subquery",
    "q13_not_in_subquery", "cdc01_merge_upsert", "sa01_bernoulli_sample",
    "sa02_stratified_sample", "j09_full_outer_join", "j10_tpch_q18_shape",
    "a13_tpch_q6_revenue", "a14_approx_quantile",
    # f05 / j12 were rowed but hash-mismatched on oracle result TYPES
    # (values verified identical); their oracles are fixed this round, so
    # they stay near the front to re-earn a green row.
]

for _name in _R01_ROWED:
    if _name in REGISTRY:
        REGISTRY[_name] = REGISTRY.pop(_name)  # move to end, keep spec

__all__ = ["REGISTRY", "queries", "oracle_sql", "register"]
