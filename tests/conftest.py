import os
import sys

import pytest

# Repo root from this file's location — relocation-safe (ADVICE r13 #2).
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run slow-marked tests (historical bruteforce replicas and "
        "multi-scale sweeps) in addition to the fast default path",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: historical-round bruteforce replicas and multi-scale "
        "sweeps — code frozen since their round. SKIPPED by default so "
        "the driver's unfiltered `pytest tests/` gate completes within "
        "its time budget (VERDICT r14 #1: the 935-test full suite ran "
        "37:48 on an idle box and timed the r14 driver gate out). Run "
        "them with --runslow (or -m slow); the FULL suite "
        "(--runslow) stays mandatory at round close (VERDICT r12 #7).",
    )


def pytest_collection_modifyitems(config, items):
    # Default = fast path: the driver's gate invokes bare
    # `pytest tests/ -x -q`, so the default collection must fit its
    # time budget on a slow box (VERDICT r14 #1). An explicit
    # `-m slow` / `-m "slow or not slow"` selection also bypasses the
    # skip (the -m filter already did the selecting).
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow-marked: run with --runslow (round-close full suite)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def spark():
    from iniz_exporters_spark.session import get_spark

    spark = get_spark("iniz-exporters-spark-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
