"""Registry-wide output-contract lint.

The external driver canonicalizes query results through pandas, which
cannot hash list/dict cells: round 5's ``array_set_ops`` returned
``ArrayType`` columns and was recorded as ``err`` (TypeError: unhashable
type 'list') even though the values were correct. The fix stringified the
arrays (``array_join``); this lint keeps the whole class closed — no
registry query may emit ArrayType / MapType / StructType output columns.

Plan-build only (schema resolution, no job execution beyond whatever a
query's builder does eagerly), so the sweep over all ~290 entries stays
cheap at sf0.001.
"""

import pytest
from pyspark.sql import types as T

from iniz_exporters_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_no_query_outputs_complex_types(spark):
    offenders = {}
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, SF)
        bad = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}, (
        "queries with pandas-unhashable (complex-typed) output columns — the "
        f"driver canonicalizer will record them as err: {offenders}"
    )


def test_no_query_outputs_duplicate_column_names(spark):
    """Duplicate output names break the sorted-by-name canonicalization."""
    offenders = {}
    for name, spec in REGISTRY.items():
        cols = spec.fn(spark, SF).columns
        dupes = sorted({c for c in cols if cols.count(c) > 1})
        if dupes:
            offenders[name] = dupes
    assert offenders == {}, f"duplicate output column names: {offenders}"
