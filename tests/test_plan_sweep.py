"""Registry-wide plan hygiene: EVERY registered query's physical plan
is checked for the two scale-killers — cartesian products and
row-at-a-time Python UDFs. Declared pandas-UDF queries are exempt from
the Python check (they are Arrow-batched by design); the deliberate
broadcast NLJ baselines (brute-force similarity) are exempt from
nothing — BroadcastNestedLoopJoin is not CartesianProduct."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from parallel_dbms_spark.plans import formatted_plan, unpartitioned_windows
from parallel_dbms_spark.queries import REGISTRY

# Streaming queries execute on .fn() (they run the stream to a batch);
# plan inspection happens on batch queries only.
BATCH_QUERIES = sorted(
    n for n, s in REGISTRY.items() if "streaming" not in s.tags
)


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_cartesian_and_no_row_python(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    bad_windows = unpartitioned_windows(plan)
    assert not bad_windows, (
        f"{name} has a single-partition window:\n" + "\n".join(bad_windows)
    )
    if "pandas_udf" not in spec.tags:
        assert "BatchEvalPython" not in plan, f"{name} has a row-wise Python UDF"
        # Arrow-batched stages are fine WHERE DECLARED — a query that
        # needs one carries the pandas_udf tag. An undeclared one means
        # a built-in-expressible step silently left codegen.
        assert "ArrowEvalPython" not in plan, (
            f"{name} has an undeclared Arrow-UDF stage; express it with "
            "built-ins or tag the query pandas_udf"
        )
