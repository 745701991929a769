from .introspect import (  # noqa: F401
    advise,
    assert_no_cartesian,
    broadcast_join_count,
    formatted_plan,
    has_pushed_filters,
    lineage_report,
    shuffle_count,
)
