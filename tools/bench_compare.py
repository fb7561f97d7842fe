"""Shift-normalized comparison of two bench artifacts.

Implements the round-over-round rule from PERFORMANCE.md (VERDICT r8 #2,
revised r10): a per-query delta is SIGNAL only if (a) it exceeds the
recorded spread for that query, (b) it survives normalizing by the
MACHINE-SHIFT estimate between the two runs, and (c) raw and normalized
deltas agree in direction.

Machine-shift estimate: the LOW MEDIAN of per-query time ratios
(new/old) across the shared set. Rationale (r10 measurement): two
back-to-back same-code bench processes differed 51.3 s vs 58.0 s (+13%,
uniformly) while the canary probes stayed flat — the sub-second canaries
do not track sustained background load, but the median of 31 per-query
ratios does, because most queries are unchanged between rounds and the
median is robust to the handful that genuinely moved. The canary ratio is
still printed as a cross-check; when it disagrees with the median shift
by more than 0.10 the tool DISCARDS the window (VERDICT r12 #2): it
refuses to print any normalized number, stamps every row
DISCARDED-WINDOW, and tells the caller to re-run idle — that pattern is
either heavy load the canary missed or a GLOBAL regression, and only a
plan read or an idle re-run distinguishes the two (a uniform true
regression is invisible to median normalization BY CONSTRUCTION; a
normalized table from a contaminated window is fiction either way).

Usage:
    python tools/bench_compare.py OLD.json NEW.json

Accepts any mix of:
  * driver round artifacts (BENCH_r{N}.json: {"parsed": {...}, ...}),
  * committed self-run references (BENCH_SELF_r{N}.json:
    {"headline": {...}, "spread_pct": {...}, ...}),
  * raw bench.py final lines ({"queries": {...}, "canary": {...}}).

Canary basis: the POST canary (fully JIT-hot session; the pre probe still
carries tiering — see PERFORMANCE.md round-9 session 5). The jvm and scan
probes are averaged into one machine-speed ratio.
"""

from __future__ import annotations

import json
import sys


# Empirical cross-process noise floor (percent): calibrated r10 from two
# back-to-back same-code bench runs — median-normalized per-query
# residuals hit 30% worst / 16% at p90. Deltas under this are not
# distinguishable from process-level noise regardless of recorded spread.
CROSS_RUN_FLOOR_PCT = 18.0

# Minimum shared-query overlap for the median to act as a machine-shift
# estimator; below this the tool compares RAW-ONLY (shift = 1.0) and says
# so, instead of letting a tiny overlap's own ratios cancel themselves.
MIN_SHARED_FOR_SHIFT = 5

# Window-discard rule (VERDICT r12 #2, derived from the three contaminated
# r12 end-of-round windows: 48.31 → 49.31 → 55.27 s with zero in-guest
# load while canary read 0.85 and query-median 1.195): when the two
# machine-shift estimators disagree by more than this, the window is
# contaminated by host-level load the guest cannot see — REFUSE to
# normalize (a normalized table from such a pair is fiction) and tell the
# caller to re-run idle.
ESTIMATOR_DISAGREE_DISCARD = 0.10

# ...but only when normalization would actually DO something. First real
# use (r13 close) hit the other shape: median 1.019 (flat — dividing by
# it changes no verdict) with the sub-second canary swinging −25% on its
# own JIT/page-cache noise. Discarding there throws away a clean flat
# window over an inert normalizer, so the rule adds a materiality gate:
# the window is discarded only when the median shift itself is large
# enough that normalizing by it would move verdicts. The r12
# contaminated pair (median 1.195) stays discarded.
MEDIAN_SHIFT_MATERIAL = 0.05


def load(path: str) -> dict:
    raw = json.load(open(path))
    if "headline" in raw:  # BENCH_SELF artifact
        out = dict(raw["headline"])
        out["spread_pct"] = raw.get("spread_pct", {})
        out.setdefault("role", raw.get("role", "self-idle"))
        return out
    if "parsed" in raw:  # driver round artifact
        out = dict(raw["parsed"] or {})
        out.setdefault("role", "driver")
        return out
    return raw  # raw final line (carries its own "role" from r10 on)


def canary_post(d: dict) -> float | None:
    c = d.get("canary")
    if not c or "post" not in c:
        return None
    p = c["post"]
    vals = [v for v in (p.get("jvm_range_sec"), p.get("parquet_scan_sec")) if v]
    return sum(vals) / len(vals) if vals else None


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    qo, qn = old.get("queries") or {}, new.get("queries") or {}
    shared = [k for k in qo if k in qn]
    if not shared:
        sys.exit("no shared queries between the two artifacts")

    co, cn = canary_post(old), canary_post(new)
    canary_ratio = (cn / co) if (co and cn) else None
    spread = {**old.get("spread_pct", {}), **new.get("spread_pct", {})}

    # machine-shift estimate: low median of per-query ratios (robust to
    # the few queries that genuinely changed; see module docstring).
    # The median is only a machine estimator when MOST shared queries are
    # unchanged — below MIN_SHARED_FOR_SHIFT the shift would just be some
    # query's own ratio (one shared query ⇒ its norm delta is identically
    # 0 and a 10× regression reads as noise), so fall back to raw-only.
    ratios = sorted(qn[k] / max(qo[k], 1e-9) for k in shared)
    ratio = (
        ratios[(len(ratios) - 1) // 2]
        if len(shared) >= MIN_SHARED_FOR_SHIFT
        else 1.0
    )

    total_o = sum(qo[k] for k in shared)
    total_n = sum(qn[k] for k in shared)
    # Role stamp (VERDICT r9 #7): say which kind of artifact each side is,
    # so a driver-vs-self comparison is visibly apples-to-oranges. The
    # role records WHERE the artifact was written (driver = committed
    # default path), not the machine's load — so print each side's
    # recorded loadavg too; same-role rows can still differ wildly there.
    def _load1(d):
        c = d.get("canary") or {}
        return c.get("loadavg_1m", "?")

    ro, rn = old.get("role", "unknown"), new.get("role", "unknown")
    print(f"roles: old={ro} (load {_load1(old)})  new={rn} (load {_load1(new)})"
          + ("  [WARNING: mixed roles — load profiles differ]"
             if ro != rn and "unknown" not in (ro, rn) else ""))
    print(f"shared queries: {len(shared)}")
    print(f"total: {total_o:.2f}s -> {total_n:.2f}s "
          f"({(total_n - total_o) / total_o:+.1%} raw)")

    # Discard check BEFORE any normalized number is printed: contradicting
    # estimators mean neither normalization can be trusted. Only meaningful
    # when a median shift was actually estimated — in raw-only mode
    # ``ratio`` is the 1.0 placeholder and comparing the canary against it
    # would fabricate a disagreement (ADVICE r10).
    discard = (
        len(shared) >= MIN_SHARED_FOR_SHIFT
        and canary_ratio is not None
        and abs(canary_ratio - ratio) > ESTIMATOR_DISAGREE_DISCARD
        and abs(ratio - 1.0) > MEDIAN_SHIFT_MATERIAL
    )
    if len(shared) >= MIN_SHARED_FOR_SHIFT:
        print(f"median-of-ratios machine shift new/old: {ratio:.3f} "
              f"(over {len(shared)} shared queries)")
        if not discard:
            print(f"shift-normalized total delta: "
                  f"{(total_n / ratio - total_o) / total_o:+.1%}")
    else:
        print(f"only {len(shared)} shared queries (<{MIN_SHARED_FOR_SHIFT}):"
              " machine shift NOT estimable — RAW deltas only")
    if canary_ratio:
        print(f"canary(post) machine ratio new/old: {canary_ratio:.3f} "
              f"({co:.3f}s -> {cn:.3f}s)")
        if discard:
            print("DISCARD: canary and query-median machine-shift "
                  f"estimators disagree by {abs(canary_ratio - ratio):.2f} "
                  f"(> {ESTIMATOR_DISAGREE_DISCARD:.2f}) — the window is "
                  "contaminated by host-level load the guest cannot see "
                  "(the r12 signature: three monotonically slower windows "
                  "at zero in-guest loadavg). REFUSING to normalize; raw "
                  "deltas below are for the record only. Re-run idle and "
                  "do not commit a normalized table from this pair.")
        elif (
            len(shared) >= MIN_SHARED_FOR_SHIFT
            and abs(canary_ratio - ratio) > ESTIMATOR_DISAGREE_DISCARD
        ):
            print("NOTE: canary disagrees with the (flat) query median by "
                  f"{abs(canary_ratio - ratio):.2f}, but the median shift "
                  f"{ratio:.3f} is immaterial — normalizing by it changes "
                  "no verdict, so the window stands; the canary swing is "
                  "its own sub-second JIT/page-cache noise.")
    else:
        print("canary: absent in at least one artifact (pre-r9) — "
              + ("median shift is the only normalizer here"
                 if len(shared) >= MIN_SHARED_FOR_SHIFT
                 else "and no median shift either; raw is all there is"))

    rows = []
    for k in shared:
        raw_d = (qn[k] - qo[k]) / max(qo[k], 1e-9)
        norm_d = ((qn[k] / ratio) - qo[k]) / max(qo[k], 1e-9)
        # recorded spread is WITHIN-process (same JVM); two same-code
        # bench PROCESSES showed median-normalized residuals up to 30%
        # (p90 16%) from JIT/GC/load — the floor keeps cross-run verdicts
        # honest where the within-run spread is optimistically tight
        sp = spread.get(k)
        gate = max(sp if sp is not None else 25.0, CROSS_RUN_FLOOR_PCT)
        signal = (
            not discard
            and abs(raw_d) * 100 > gate
            and abs(norm_d) * 100 > gate
            and (norm_d > 0) == (raw_d > 0)
        )
        rows.append((raw_d, norm_d, sp, signal, k))
    # explicit key: sp may be None and None<float TypeErrors under tuple
    # comparison when raw deltas tie
    rows.sort(key=lambda r: r[0], reverse=True)
    print(f"{'query':30s} {'raw':>8s} {'norm':>8s} {'spread%':>8s}  verdict")
    for raw_d, norm_d, sp, signal, k in rows:
        sps = f"{sp:.1f}" if sp is not None else "n/a"
        if discard:
            verdict = "DISCARDED-WINDOW"
            print(f"{k:30s} {raw_d:+8.1%} {'n/a':>8s} {sps:>8s}  {verdict}")
            continue
        verdict = "SIGNAL" if signal else "noise/machine"
        print(f"{k:30s} {raw_d:+8.1%} {norm_d:+8.1%} {sps:>8s}  {verdict}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        # output piped into head/less that closed early — not an error.
        # Point stdout at devnull so the interpreter's exit-time flush of
        # the dead pipe doesn't raise a second time (stderr noise, exit
        # code 120, broken `&&` chains).
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
