"""Maintainability contract for the queries/ package (r9 split).

The 30k-line monolith was split into _base + p01..p09 with registration
order preserved. These pins keep the discipline: no chunk grows back
into a monolith, no top-level name is defined in two chunks (the import
headers resolve names to their first definer), and the package __init__
re-exports the full chunk surface so the historical import path
``from iniz_exporters_spark.queries import X`` keeps working for every X.
"""

import ast
import glob
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "iniz_exporters_spark",
    "queries",
)

MAX_CHUNK_LINES = 8000


def _chunk_files():
    return sorted(glob.glob(os.path.join(PKG, "p*.py")))


def test_chunks_exist_and_stay_under_size_budget():
    files = _chunk_files()
    assert len(files) >= 2
    oversized = {
        os.path.basename(f): n
        for f in files
        if (n := sum(1 for _ in open(f))) > MAX_CHUNK_LINES
    }
    assert oversized == {}, (
        f"chunk(s) over {MAX_CHUNK_LINES} lines — split before adding "
        f"more queries: {oversized}"
    )


def _top_level_defs(path):
    out = set()
    for st in ast.parse(open(path).read()).body:
        if isinstance(st, (ast.FunctionDef, ast.ClassDef)):
            out.add(st.name)
        elif isinstance(st, ast.Assign):
            for t in st.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        out.add(n.id)
    return out


def test_no_top_level_name_defined_in_two_chunks():
    seen = {}
    dupes = []
    for f in _chunk_files():
        base = os.path.basename(f)
        for n in _top_level_defs(f):
            if n in seen:
                dupes.append((n, seen[n], base))
            seen[n] = base
    assert dupes == [], f"cross-chunk duplicate top-level defs: {dupes}"


def test_package_reexports_every_chunk_name():
    import iniz_exporters_spark.queries as Q

    missing = []
    for f in _chunk_files():
        for n in _top_level_defs(f):
            if not hasattr(Q, n):
                missing.append((os.path.basename(f), n))
    assert missing == [], f"names not re-exported by __init__: {missing}"


def test_registration_order_matches_chunk_order():
    """REGISTRY iteration order must equal the concatenation of chunk
    files' @register order — the driver-window ledger depends on it."""
    from iniz_exporters_spark.queries import REGISTRY

    expected = []
    for f in _chunk_files():
        for st in ast.parse(open(f).read()).body:
            if isinstance(st, ast.FunctionDef):
                for d in st.decorator_list:
                    if (
                        isinstance(d, ast.Call)
                        and getattr(d.func, "id", "") == "register"
                        and d.args
                        and isinstance(d.args[0], ast.Constant)
                    ):
                        expected.append(d.args[0].value)
    assert list(REGISTRY) == expected
