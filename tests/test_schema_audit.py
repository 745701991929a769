"""Registry-wide output-schema audit (VERDICT r4 task 2).

Root cause of every r4 driver-hash FAIL: a raw DECIMAL output column.
The driver's canon renders ``Decimal('49341.00')`` float-style
(``49341.0``) while Spark's str keeps scale, so ANY trailing-zero
decimal value flips the value hash — and whether a given query hits a
trailing-zero value is data luck (two r4 DECIMAL emitters passed only
because their few rows happened to carry none). The only robust
contract is: registry queries never emit DECIMAL at all — money and
weights go out as BIGINT integer units (``*_cents``, ``*_e2``) or
rounded doubles (the q1/unpivot discipline, operators/relational.py).

This audit resolves every registry query's schema (plan-only, no
execution) and fails on any DecimalType anywhere in the output,
including nested inside arrays/maps/structs.
"""

import pytest
from pyspark.sql import types as T

from github_issues_lakehouse_spark import queries as Q

from .conftest import SF_DIR

QUERIES = Q.queries()


def _decimal_paths(dtype, path):
    if isinstance(dtype, T.DecimalType):
        yield path
    elif isinstance(dtype, T.ArrayType):
        yield from _decimal_paths(dtype.elementType, path + "[]")
    elif isinstance(dtype, T.MapType):
        yield from _decimal_paths(dtype.keyType, path + ".key")
        yield from _decimal_paths(dtype.valueType, path + ".value")
    elif isinstance(dtype, T.StructType):
        for f in dtype.fields:
            yield from _decimal_paths(f.dataType, f"{path}.{f.name}")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_decimal_output_columns(name, spark):
    schema = QUERIES[name](spark, SF_DIR).schema
    bad = [p for f in schema.fields for p in _decimal_paths(f.dataType, f.name)]
    assert not bad, (
        f"{name} emits DECIMAL output column(s) {bad} — the r4 "
        "driver-canon trailing-zero class. Emit BIGINT integer units "
        "or round(cast(double), n) instead."
    )
