from retail_datawarehouse_spark.plans.explain import (
    broadcast_join_count,
    formatted_plan,
    has_shuffle,
    pushed_filters,
    shuffle_count,
    wholestage_codegen_count,
)

__all__ = [
    "broadcast_join_count",
    "formatted_plan",
    "has_shuffle",
    "pushed_filters",
    "shuffle_count",
    "wholestage_codegen_count",
]
