from .explain import assert_plan_contains, physical_plan  # noqa: F401
