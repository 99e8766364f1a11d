"""The pre-flight for the driver's t2 gate: every oracle-backed query
must value-match its SQL on the smoke corpus; rows-only queries must at
least execute and keep a stable schema.
"""

from __future__ import annotations

import pytest

from etl_project_spark.plans.registry import all_specs
from tests.conftest import SF_ORACLE
from tests.oracle import compare, run_oracle

SPECS = all_specs()
ORACLE_BACKED = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


#: Queries where an empty result at the smoke SF is the CORRECT answer
#: (each must carry a comment justifying why empty is meaningful).
#: Everything else must return rows — a 0-row "match" is vacuous and
#: hides broken predicates (round-1 lesson: '%BRASS%' matched nothing).
EXPECTED_EMPTY: set[str] = {
    # T7 limit-0: zero rows IS the operator's contract (schema-only probe)
    "q_limit0_schema_only",
}


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_oracle_parity(spark, name):
    spec = SPECS[name]
    sdf = spec.builder(spark, SF_ORACLE)
    odf = run_oracle(spec.oracle, SF_ORACLE)
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems[:5])
    if name not in EXPECTED_EMPTY:
        assert len(odf) > 0, (
            f"{name}: oracle returned 0 rows — the comparison is vacuous; "
            "fix the predicate or add to EXPECTED_EMPTY with justification"
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_executes(spark, name):
    df = SPECS[name].builder(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0


def test_driver_contract_shapes():
    import __spark_entry__ as mod

    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20
