from .agg import grouped_count, grouped_sum  # noqa: F401
