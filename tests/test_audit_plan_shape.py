"""Plan-shape pins for the two hot audit transforms (VERDICT r7 task 8):
the zero-shuffle / single-parse plan assertions that caught real
regressions elsewhere (text_chunk_windows ≤1 Exchange,
p1_variant_projection single parse_json, ANN probe-join codes-only),
extended to the MappingPlan-driven flagship queries.

A JSON document pipeline's classic plan regression is the optimizer
duplicating the `from_json` parse into every consumer branch (the r4
CollapseProject re-evaluation trap) — at 100 TB that doubles/quadruples
the dominant CPU cost of the scan stage. These pins go red on any
refactor that reintroduces a re-parse."""


# the shared helper raises maxToStringFields around the render (r9
# advice): Spark truncates long expression lists at the default 25 with
# '... N more fields', so a wider projection could silently hide
# from_json occurrences and make the substring counts lie — fixed once
# in storage.physical_plan for every plan-shape test.
from etl_pipeline_from_mongo_json_to_postgre_spark.storage import (
    physical_plan as _physical_plan,
)


def test_audit_status_pivot_parses_each_branch_once(spark, sf_dir):
    """Two document branches (orders docs, lineitem docs) -> exactly two
    from_json evaluations in the WHOLE physical plan; the pivot + count
    above them must not re-parse."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
        transform_queries as tq,
    )

    plan = _physical_plan(tq.audit_status_pivot(spark, sf_dir))
    n = plan.count("from_json")
    assert n == 2, (
        f"expected exactly one from_json per document branch (2), got {n}"
        f" — a consumer re-parsed the documents:\n{plan}")


def test_audit_report_assembly_join_arms_share_one_parse(spark, sf_dir):
    """Both outer-join arms derive from ONE materialized (object,
    collection, day) pre-aggregate, so the final physical plan must
    contain ZERO from_json — the parse happened once, in the
    materialization pass, not once per arm."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
        transform_queries as tq,
    )

    plan = _physical_plan(tq.audit_report_assembly(spark, sf_dir))
    n = plan.count("from_json")
    assert n == 0, (
        f"expected the outer-join arms to reuse the materialized "
        f"pre-aggregate (0 from_json in the final plan), got {n}:\n{plan}")
