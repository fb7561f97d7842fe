"""Canary-normalized comparison of two bench artifacts.

Implements the round-over-round rule from PERFORMANCE.md / VERDICT r8 #2:
a per-query delta is SIGNAL only if (a) it exceeds the recorded spread for
that query and (b) it survives normalizing by the canary ratio between the
two runs — a uniform shift that tracks the canary is the machine, not the
code.

Usage:
    python tools/bench_compare.py OLD.json NEW.json

Accepts any mix of:
  * driver round artifacts (BENCH_r{N}.json: {"parsed": {...}, ...}),
  * committed self-run references (BENCH_SELF_r{N}.json:
    {"headline": {...}, "spread_pct": {...}, ...}),
  * raw bench.py final lines ({"queries": {...}, "canary": {...}}).

Canary basis: the POST canary (fully JIT-hot session; the pre probe still
carries tiering — see PERFORMANCE.md round-9 session 5). The jvm and scan
probes are averaged into one machine-speed ratio. Artifacts that predate
the canary (r1-r8) compare without normalization and say so.
"""

from __future__ import annotations

import json
import sys


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
    ratio = (cn / co) if (co and cn) else None
    spread = {**old.get("spread_pct", {}), **new.get("spread_pct", {})}

    total_o = sum(qo[k] for k in shared)
    total_n = sum(qn[k] for k in shared)
    # Role stamp (VERDICT r9 #7): say which kind of artifact each side is,
    # so a driver-vs-self comparison is visibly apples-to-oranges.
    ro, rn = old.get("role", "unknown"), new.get("role", "unknown")
    print(f"roles: old={ro}  new={rn}"
          + ("  [WARNING: mixed roles — load profiles differ]"
             if ro != rn and "unknown" not in (ro, rn) else ""))
    print(f"shared queries: {len(shared)}")
    print(f"total: {total_o:.2f}s -> {total_n:.2f}s "
          f"({(total_n - total_o) / total_o:+.1%} raw)")
    if ratio:
        print(f"canary(post) machine ratio new/old: {ratio:.3f} "
              f"({co:.3f}s -> {cn:.3f}s)")
        print(f"canary-normalized total delta: "
              f"{(total_n / ratio - total_o) / total_o:+.1%}")
    else:
        print("canary: absent in at least one artifact (pre-r9?) — "
              "raw deltas only, machine drift NOT separable")

    rows = []
    for k in shared:
        raw_d = (qn[k] - qo[k]) / max(qo[k], 1e-9)
        norm_d = ((qn[k] / ratio) - qo[k]) / max(qo[k], 1e-9) if ratio else None
        sp = spread.get(k)
        signal = (
            abs(raw_d) * 100 > (sp if sp is not None else 25.0)
            and (norm_d is None or abs(norm_d) * 100 > (sp if sp is not None else 25.0))
            and (norm_d is None or (norm_d > 0) == (raw_d > 0))
        )
        rows.append((raw_d, norm_d, sp, signal, k))
    # explicit key: norm_d/sp may be None and None<float TypeErrors under
    # tuple comparison when raw deltas tie
    rows.sort(key=lambda r: r[0], reverse=True)
    print(f"{'query':30s} {'raw':>8s} {'norm':>8s} {'spread%':>8s}  verdict")
    for raw_d, norm_d, sp, signal, k in rows:
        nd = f"{norm_d:+.1%}" if norm_d is not None else "n/a"
        sps = f"{sp:.1f}" if sp is not None else "n/a"
        verdict = "SIGNAL" if signal else "noise/machine"
        print(f"{k:30s} {raw_d:+8.1%} {nd:>8s} {sps:>8s}  {verdict}")


if __name__ == "__main__":
    main()
