from .introspect import formatted_plan, assert_no_cartesian, has_pushed_filters, broadcast_join_count  # noqa: F401
