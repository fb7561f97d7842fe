"""Error contracts: wrong inputs fail fast with actionable messages.

A 100 TB job that limps along on a missing table or a half-typed path burns
cluster-hours before anyone notices; these pin the failure mode instead.
"""

import pytest
from pyspark.errors import AnalysisException


def test_catalog_missing_sf_dir_raises_path_not_found(spark):
    from iniz_exporters_spark.catalog import Catalog

    cat = Catalog(spark, "/root/testdata/sf-does-not-exist")
    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        cat.table("lineitem").count()


def test_catalog_trailing_slash_ok(spark):
    from iniz_exporters_spark.catalog import Catalog

    cat = Catalog(spark, "/root/testdata/sf0.001/")
    assert cat.table("region").count() == 5


def test_load_tables_bad_tables_dir(spark):
    from iniz_exporters_spark.cli import LOCATION_TABLES, load_tables

    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        tables = load_tables(
            spark, LOCATION_TABLES, "db", tables_dir="/nonexistent-dir",
            jdbc_url=None, user=None, password=None, props_path=None,
        )
        tables["location"].count()


def test_missing_runtime_properties_raises(spark):
    """No credentials anywhere (flags or properties file) must fail at
    config-read time, not with a dangling JDBC connect."""
    from iniz_exporters_spark.cli import load_tables

    with pytest.raises(FileNotFoundError):
        load_tables(
            spark, ("location",), "nosuchdb", tables_dir=None,
            jdbc_url="jdbc:mysql://localhost/nosuchdb",
            user=None, password=None,
            props_path="/nonexistent/openmrs-runtime.properties",
        )


def test_unknown_query_name():
    from iniz_exporters_spark.queries import REGISTRY

    assert "no_such_query" not in REGISTRY


def test_hash_split_overfull_fractions_rejected(spark):
    """Fractions summing past 1 would silently starve later labels —
    must fail loudly at call time."""
    from iniz_exporters_spark.operators.sampling import hash_split

    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="fractions"):
        hash_split(df, "k", {"a": 0.8, "b": 0.4})


def test_apply_changes_missing_op_column(spark):
    """A changelog without the op column is a caller bug — surfaced as the
    standard unresolved-column analysis error, not a wrong result."""
    from pyspark.errors import AnalysisException

    from iniz_exporters_spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame([(1, "b", 1)], ["k", "v", "seq"])
    with pytest.raises(AnalysisException):
        apply_changes(base, changes, ["k"]).collect()


def test_kmeans_fewer_rows_than_k(spark):
    from iniz_exporters_spark.operators.clustering import kmeans_lloyd

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], ["vec_id", "embedding"]
    )
    with pytest.raises(RuntimeError, match="fewer than k"):
        kmeans_lloyd(df, k=5)


# --- narrowed except-site contracts (VERDICT r9 #6) -----------------------
# Each former blanket ``except Exception`` in session.py/catalog.py now
# absorbs ONLY Spark-side failures (AnalysisException / Py4JJavaError);
# these pin both halves: the absorbed type degrades gracefully, and a
# repo-side programming error (NameError/TypeError) escapes.


class _BoomFrame:
    """Duck-typed DataFrame stub whose probed method raises on demand."""

    def __init__(self, exc):
        self._exc = exc

    def inputFiles(self):
        raise self._exc

    @property
    def _jdf(self):
        raise self._exc


def test_scan_split_estimate_absorbs_analysis_exception_only():
    from pyspark.errors import AnalysisException

    from iniz_exporters_spark.session import _estimated_scan_splits

    # streaming-style refusal: absorbed, estimate just unavailable
    assert _estimated_scan_splits(_BoomFrame(AnalysisException("no files")), 8) is None
    # repo-side bug: must escape
    with pytest.raises(NameError):
        _estimated_scan_splits(_BoomFrame(NameError("typo")), 8)


def test_is_bare_scan_absorbs_spark_side_only():
    from pyspark.errors import AnalysisException

    from iniz_exporters_spark.session import _is_bare_scan

    class _JdfBoom:
        def __init__(self, exc):
            self._exc = exc

        @property
        def _jdf(self):
            raise self._exc

    assert _is_bare_scan(_JdfBoom(AnalysisException("jvm"))) is False
    with pytest.raises(TypeError):
        _is_bare_scan(_JdfBoom(TypeError("repo bug")))


def test_tune_for_session_absorbs_immutable_key_only(spark, monkeypatch):
    from iniz_exporters_spark.session import tune_for_session

    calls = []

    class _Conf:
        def set(self, k, v):
            calls.append(k)
            raise AnalysisException("CANNOT_MODIFY_CONFIG")

    monkeypatch.setattr(type(spark), "conf", property(lambda self: _Conf()))
    # every key attempted, none fatal
    assert tune_for_session(spark) is spark
    assert len(calls) == 5  # incl. the r15 AQE minPartitionSize floor

    class _ConfBug:
        def set(self, k, v):
            raise TypeError("repo bug")

    monkeypatch.setattr(type(spark), "conf", property(lambda self: _ConfBug()))
    with pytest.raises(TypeError):
        tune_for_session(spark)


def test_catalog_read_retry_absorbs_analysis_exception_only(spark, monkeypatch):
    """The nanos-fallback retry in Catalog._read_parquet triggers on
    AnalysisException (schema-conversion refusal) and retries once; a
    repo-side bug inside the read path escapes immediately."""
    from iniz_exporters_spark.catalog import Catalog

    cat = Catalog(spark, "/root/testdata/sf0.001")
    attempts = []

    class _Read:
        def parquet(self, path):
            attempts.append(path)
            if len(attempts) == 1:
                raise AnalysisException("Illegal Parquet type")
            return spark.createDataFrame([(1,)], "x int")

    monkeypatch.setattr(type(spark), "read", property(lambda self: _Read()))
    df = cat._read_parquet("region")
    assert df.columns == ["x"] and len(attempts) == 2

    attempts.clear()

    class _ReadBug:
        def parquet(self, path):
            raise NameError("typo in read path")

    monkeypatch.setattr(type(spark), "read", property(lambda self: _ReadBug()))
    cat2 = Catalog(spark, "/root/testdata/sf0.001")
    with pytest.raises(NameError):
        cat2._read_parquet("region")
