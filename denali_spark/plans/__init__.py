from denali_spark.plans.audit import (
    assert_broadcasts,
    assert_jvm_only,
    assert_scan_efficient,
    audit,
    plan_text,
)

__all__ = [
    "assert_broadcasts",
    "assert_jvm_only",
    "assert_scan_efficient",
    "audit",
    "plan_text",
]
