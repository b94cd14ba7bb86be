"""Registry-wide perf budget (round-6 item 3, VERDICT r5): diff the
per-entry wall-ms recorded by driver_gate.py between two
CORRECTNESS_LOCAL artifacts and flag regressions.

The 2x baseline bound only covers the 9 bench headliners; this guards
the other ~470 entries round-over-round. A flagged entry is not
automatically wrong — three benign sources produce phantom regressions
(all observed and diagnosed in round 6):
  1. machine drift — a co-tenant slows EVERY entry uniformly;
     normalized out via the median ratio below;
  2. JVM warm-up attributed to the first entry — fixed in driver_gate
     (it warms before the timed loop);
  3. FIXTURE REGENERATION between runs — the driver rewrites
     /root/testdata each round, and data-dependent entries (the dedup
     family especially: shingle joins scale with duplicate structure,
     not row count) legitimately cost differently on new content.
     Compare artifact dates against the fixture mtimes before chasing.
A >1.5x jump that survives a re-run ON THE SAME FIXTURES is a plan
regression to chase.

Usage:
    python scripts/perf_budget.py OLD.json NEW.json [--threshold=1.5]
    python scripts/perf_budget.py --top NEW.json        # slowest 25
Exit code 1 if any entry regressed past the threshold (after the
min-ms floor: entries under 500 ms in BOTH runs are noise, skipped).
"""

from __future__ import annotations

import json
import sys

MIN_MS = 500.0  # below this in both runs, jitter dominates


def load(path: str) -> dict[str, float]:
    d = json.load(open(path))
    return {
        k: float(v["ms"])
        for k, v in d.items()
        if isinstance(v, dict) and v.get("ms") is not None
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a.startswith("--threshold="):
            thr = float(a.split("=", 1)[1])
        elif a == "--threshold" and i + 1 < len(argv):
            thr = float(argv[i + 1])
            args = [x for x in args if x != argv[i + 1]]
    if "--top" in sys.argv:
        t = load(args[0])
        for k in sorted(t, key=t.get, reverse=True)[:25]:
            print(f"{t[k]:>10.0f} ms  {k}")
        return 0
    old, new = load(args[0]), load(args[1])
    # Normalize away machine-level drift: gate runs share a box with
    # other work, and a co-tenant makes EVERY entry slower by the same
    # factor (measured: a run where 168 entries all landed at 1.50-1.57x).
    # The median per-entry ratio estimates that global factor; only
    # entries regressing RELATIVE to it are plan regressions.
    ratios = sorted(
        new[k] / max(old[k], 1.0)
        for k in new
        if k in old and (old[k] >= MIN_MS or new[k] >= MIN_MS)
    )
    global_drift = ratios[len(ratios) // 2] if ratios else 1.0
    if global_drift <= 0:
        global_drift = 1.0  # degenerate timings; don't divide by zero
    print(f"global drift (median ratio): {global_drift:.2f}x — normalized out")
    flagged = []
    for k in sorted(new):
        if k not in old:
            print(f"  new    {k}: {new[k]:.0f} ms (no prior)")
            continue
        if old[k] < MIN_MS and new[k] < MIN_MS:
            continue
        r = new[k] / max(old[k], 1.0) / global_drift
        if r > thr:
            flagged.append((r, k))
    for k in sorted(set(old) - set(new)):
        print(f"  gone   {k}")
    for r, k in sorted(flagged, reverse=True):
        print(f"  REGR   {k}: {old[k]:.0f} -> {new[k]:.0f} ms ({r:.2f}x drift-adjusted)")
    tot_o = sum(old.values()) / 1000
    tot_n = sum(new.values()) / 1000
    print(
        f"total: {tot_o:.0f}s -> {tot_n:.0f}s "
        f"({tot_n / max(tot_o, 0.001):.2f}x), {len(flagged)} regressed > {thr}x"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
