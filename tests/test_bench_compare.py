"""tools/bench_compare.py: the shift-normalization rule as code.

A delta is SIGNAL only if it exceeds the query's recorded spread AND
survives dividing by the machine-shift estimate — the LOW MEDIAN of
per-query time ratios (r10 revision: back-to-back same-code runs drifted
+13% with flat canaries, so the canary is a cross-check, not the
normalizer). These tests pin the gates with synthetic artifacts — no
Spark involved.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_compare(tmp_path, old, new):
    a, b = tmp_path / "old.json", tmp_path / "new.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    out = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(a), str(b)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def _artifact(queries, canary_post=None, spread=None):
    d = {"queries": queries, "sf": 0.1}
    if canary_post is not None:
        d["canary"] = {
            "pre": {"jvm_range_sec": 9.9, "parquet_scan_sec": 9.9},
            "post": {
                "jvm_range_sec": canary_post,
                "parquet_scan_sec": canary_post,
            },
        }
    if spread is not None:
        d["spread_pct"] = spread
    return d


_FIVE = ["q_a", "q_b", "q_c", "q_d", "q_e"]


def test_uniform_machine_shift_reads_as_noise(tmp_path):
    """Every query +50% and the canary also +50%: median shift absorbs it,
    nothing is SIGNAL — this is exactly the r8 +24% situation."""
    old = _artifact({q: 1.0 + i for i, q in enumerate(_FIVE)},
                    canary_post=0.2, spread={q: 10.0 for q in _FIVE})
    new = _artifact({q: (1.0 + i) * 1.5 for i, q in enumerate(_FIVE)},
                    canary_post=0.3, spread={q: 10.0 for q in _FIVE})
    out = run_compare(tmp_path, old, new)
    assert "machine ratio new/old: 1.500" in out
    assert "SIGNAL" not in out
    assert out.count("noise/machine") == 5


def test_real_regression_survives_normalization(tmp_path):
    """One query +100% among four flat ones on an unchanged machine
    (canary flat): only the regressed one is SIGNAL."""
    old = _artifact({q: 1.0 for q in _FIVE}, canary_post=0.2,
                    spread={q: 10.0 for q in _FIVE})
    new_q = {q: 1.01 for q in _FIVE}
    new_q["q_a"] = 2.0
    new = _artifact(new_q, canary_post=0.2,
                    spread={q: 10.0 for q in _FIVE})
    out = run_compare(tmp_path, old, new)
    lines = {l.split()[0]: l for l in out.splitlines() if l.startswith("q_")}
    assert "SIGNAL" in lines["q_a"]
    for q in _FIVE[1:]:
        assert "noise/machine" in lines[q]


def test_delta_within_spread_is_noise_even_with_flat_canary(tmp_path):
    old = _artifact({"q_a": 1.0}, canary_post=0.2, spread={"q_a": 40.0})
    new = _artifact({"q_a": 1.3}, canary_post=0.2, spread={"q_a": 40.0})
    out = run_compare(tmp_path, old, new)
    assert "SIGNAL" not in out


def test_pre_canary_artifacts_use_median_shift_only(tmp_path):
    """r1-r8 artifacts have no canary: with enough shared queries the tool
    says the median shift is the only normalizer; with too few it says raw
    is all there is."""
    old = _artifact({q: 1.0 for q in _FIVE})
    new = _artifact({q: 1.5 for q in _FIVE}, canary_post=0.2)
    out = run_compare(tmp_path, old, new)
    assert "median shift is the only normalizer" in out
    out2 = run_compare(
        tmp_path, _artifact({"q_a": 1.0}), _artifact({"q_a": 1.5})
    )
    assert "raw is all there is" in out2


def test_driver_and_self_artifact_shapes_load(tmp_path):
    """The two committed artifact shapes (driver round file with "parsed",
    self-run file with "headline") both load."""
    driver = {"n": 9, "parsed": _artifact({"q_a": 1.0}, canary_post=0.2)}
    selfrun = {
        "headline": _artifact({"q_a": 1.1}, canary_post=0.2),
        "spread_pct": {"q_a": 5.0},
    }
    a, b = tmp_path / "d.json", tmp_path / "s.json"
    a.write_text(json.dumps(driver))
    b.write_text(json.dumps(selfrun))
    out = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(a), str(b)],
        capture_output=True, text=True, cwd=REPO, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "shared queries: 1" in out.stdout


def test_tied_deltas_with_mixed_spread_availability_dont_crash(tmp_path):
    """Pinned regression (r9 review): two queries tying on delta while
    only one has a recorded spread used to TypeError under tuple sort
    (float vs None). Under the r10 median-shift rule a UNIFORM +50% with a
    flat canary is exactly the ambiguous pattern (load the canary missed,
    or a global regression) the tool cannot adjudicate alone — since the
    r13 discard rule that contradiction DISCARDS the window outright."""
    old = _artifact({q: 1.0 for q in _FIVE}, canary_post=0.2,
                    spread={"q_a": 5.0})
    new = _artifact({q: 1.5 for q in _FIVE}, canary_post=0.2)
    out = run_compare(tmp_path, old, new)
    assert "SIGNAL" not in out
    assert "DISCARD" in out


def test_contaminated_window_is_discarded_not_normalized(tmp_path):
    """The r12 contaminated end-of-round window, as code (VERDICT r12 #2):
    canary machine ratio 0.85 (faster!) while the query median reads 1.195
    (slower) — host-level contention the guest's loadavg cannot see. The
    tool must refuse to normalize: DISCARD banner, no shift-normalized
    total, no SIGNAL verdicts, every row stamped DISCARDED-WINDOW."""
    old = _artifact({q: 1.0 + i for i, q in enumerate(_FIVE)},
                    canary_post=0.40, spread={q: 10.0 for q in _FIVE})
    new = _artifact(
        {q: (1.0 + i) * 1.195 for i, q in enumerate(_FIVE)},
        canary_post=0.34,  # 0.34/0.40 = the r12 canary ratio 0.85
        spread={q: 10.0 for q in _FIVE},
    )
    out = run_compare(tmp_path, old, new)
    assert "DISCARD: canary and query-median machine-shift estimators" in out
    assert "shift-normalized total delta" not in out
    assert "SIGNAL" not in out
    assert out.count("DISCARDED-WINDOW") == 5


def test_agreeing_estimators_still_normalize(tmp_path):
    """Discard is for CONTRADICTING estimators only: canary and median
    agreeing on a uniform +50% must still produce the normalized table
    (the r8 machine-shift situation, unchanged by the discard rule)."""
    old = _artifact({q: 1.0 for q in _FIVE}, canary_post=0.2,
                    spread={q: 10.0 for q in _FIVE})
    new = _artifact({q: 1.5 for q in _FIVE}, canary_post=0.3,
                    spread={q: 10.0 for q in _FIVE})
    out = run_compare(tmp_path, old, new)
    assert "DISCARD" not in out
    assert "shift-normalized total delta" in out


def test_small_overlap_compares_raw_only(tmp_path):
    """One shared query: the median shift would be that query's own ratio
    (norm delta identically 0 — a 10x regression would read as noise), so
    the tool must fall back to raw-only and flag the regression."""
    old = _artifact({"q_a": 1.0}, canary_post=0.2, spread={"q_a": 10.0})
    new = _artifact({"q_a": 10.0}, canary_post=0.2, spread={"q_a": 10.0})
    out = run_compare(tmp_path, old, new)
    assert "machine shift NOT estimable" in out
    assert "SIGNAL" in out


def test_flat_median_with_noisy_canary_is_not_discarded(tmp_path):
    """Materiality gate (first real use of the discard rule, r13 close):
    a FLAT query median (1.02) with the sub-second canary swinging -25%
    on its own noise must NOT discard — normalizing by ~1.0 changes no
    verdict, so the window stands with a NOTE."""
    old = _artifact({q: 1.0 for q in _FIVE}, canary_post=0.40,
                    spread={q: 10.0 for q in _FIVE})
    new = _artifact({q: 1.02 for q in _FIVE}, canary_post=0.30,
                    spread={q: 10.0 for q in _FIVE})
    out = run_compare(tmp_path, old, new)
    assert "DISCARD" not in out
    assert "NOTE: canary disagrees with the (flat) query median" in out
    assert "shift-normalized total delta" in out
