"""Registry-growth cap (VERDICT r9 #4).

The driver hash-checks 50 registry names per round, so unchecked
registrations are verification debt.  The standing rule: at any commit,

    registry size − cumulative driver-checked − current window ≤ 49

i.e. never more than ONE window of un-seated debt.  "Driver-checked"
counts every name with a green (hash_match / rows-only pass) row in any
committed CORRECTNESS_r*.json; the current window counts because it is
guaranteed a row next driver run.  New registrations beyond the cap must
wait a round (or displace something from the queue deliberately).
"""

import glob
import importlib.util
import json
import os

# Repo root derived from this file's location (ADVICE r13 #2 made the
# policy re-derivation relocation-safe; the SPEC load and the ledger
# glob below follow the same rule so the whole file works from any
# checkout path).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPEC = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
)
ENTRY = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(ENTRY)

CAP = 49


def _driver_checked() -> set:
    checked: set = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(path)).items():
            if isinstance(row, dict) and not row.get("hash_match"):
                continue  # err / mismatch row: never verified
            checked.add(name)
    return checked


def test_unseated_debt_at_most_one_window():
    from iniz_exporters_spark.queries import REGISTRY

    checked = _driver_checked()
    window = set(ENTRY._WINDOW) | {"q1_pricing_summary"}
    debt = [n for n in REGISTRY if n not in checked and n not in window]
    assert len(debt) <= CAP, (
        f"{len(debt)} registry names are neither driver-checked nor in the "
        f"current window (cap {CAP}): first 10 = {debt[:10]}. Seat them in a "
        "window or defer the registrations."
    )


def test_window_is_exactly_the_oldest_unchecked():
    """The rotation contract: the live window is the 49 oldest unchecked
    names in registration order (plus q1 at slot 0).  Once fewer than 49
    remain, the window is exactly the remainder (in order) and may carry
    extra already-green names in its tail."""
    from iniz_exporters_spark.queries import REGISTRY

    checked = _driver_checked()
    queue = [n for n in REGISTRY if n not in checked]
    expected = queue[:CAP]
    live = [n for n in ENTRY._WINDOW if n not in checked][: len(expected)]
    if not live and expected:
        # The common round-open state (ADVICE r10 #1): the driver just
        # committed CORRECTNESS_r{N}, so every current-window name is now
        # checked.  That is not a contract breach — it is the rotation
        # falling due.  Say so explicitly instead of printing a baffling
        # []-vs-queue diff.
        raise AssertionError(
            "[EXIT:ROTATION_DUE] every name in the live window is now "
            "driver-checked (a new CORRECTNESS_r*.json landed). Rotate "
            f"_WINDOW to the next {len(expected)} oldest-unchecked names, "
            f"starting: {expected[:5]} ... (distinct marker per VERDICT "
            "r11 #8: this is the expected round-open state, not a "
            "contract breach — CI can grep the [EXIT:...] tag)."
        )
    assert live == expected, (
        "window does not match the oldest-unchecked queue:\n"
        f"  expected head: {expected[:5]} ... ({len(expected)})\n"
        f"  live head:     {live[:5]} ... ({len(live)})"
    )


def test_reseat_tail_follows_spare_slot_policy():
    """POST-DRAIN SPARE-SLOT POLICY (VERDICT r10 #2 / r11 #3), pinned by
    an INDEPENDENT re-derivation from the committed artifacts:

    spare slots = 49 − |live window|, occupied by
      1. plan-changed names (``_PLAN_CHANGED``, change order) whose
         latest green row predates the plan edit, then
      2. every other driver-checked name, oldest-green-first (latest
         green CORRECTNESS round asc, registration order asc),
    truncated to the spare-slot count.  This makes the first-50 tail
    derivable from CORRECTNESS_r*.json + the explicit plan-changed
    ledger alone, and guarantees stale rows are re-verified as windows
    drain (VERDICT r11 #5)."""
    from iniz_exporters_spark.queries import REGISTRY

    latest: dict = {}
    # Resolve artifacts relative to the entry module, mirroring the
    # production fix in _latest_green_rounds() (ADVICE r12/r13): on a
    # relocated checkout a hardcoded path would compare an empty ledger.
    here = os.path.dirname(os.path.abspath(ENTRY.__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for name, row in json.load(open(path)).items():
            if not isinstance(row, dict) or not row.get("hash_match"):
                continue  # malformed / err / mismatch: never verified
            latest[name] = max(latest.get(name, 0), rnd)
    live_window = [n for n in ENTRY._WINDOW if n in REGISTRY]
    spare = 49 - len(live_window)
    jumped = [
        n
        for n in ENTRY._PLAN_CHANGED
        if n in latest and n in REGISTRY and n not in live_window
    ]
    order = {n: i for i, n in enumerate(REGISTRY)}
    stale_first = sorted(
        (
            n
            for n in latest
            if n in REGISTRY and n not in jumped and n not in live_window
        ),
        key=lambda n: (latest[n], order[n]),
    )
    expected = (jumped + stale_first)[: max(spare, 0)]
    assert ENTRY._reseat_names() == expected

    # Window and re-seat tail must never overlap (ADVICE r12): a window
    # name always holds/acquires a green row, so a duplicate would
    # double-count a first-50 slot.
    assert not set(live_window) & set(expected)

    # The re-seat tail occupies the first-50 slice right after the window.
    head = list(ENTRY.queries())[: 1 + len(live_window) + len(expected)]
    assert head == ["q1_pricing_summary"] + live_window + expected

    # Policy floor: while ≥15 spare slots exist, ≥15 re-verified old
    # names reach the driver (VERDICT r11 #5's done-bar).
    if spare >= 15:
        assert len(expected) >= 15
