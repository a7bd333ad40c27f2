from ting_data_etl_spark.operators.relational import (  # noqa: F401
    bottom_k_per_group,
    densify_months,
    pivot_years,
    set_difference,
    top_k_per_group,
)
