"""Oracle self-stability detector (round-7 flake class).

Measured: DuckDB 1.0.0 places a NULL window ORDER-BY key at a RANDOM
position inside the partition order when the window's input arrives
from a parallel/unordered operator (hash DISTINCT over a parquet scan
— 20 distinct per-partition orderings over 300 runs of the same
query). Any oracle whose window ORDER BY key can be NULL is therefore
a probabilistic gate flake: it can disagree with the (deterministic)
engine on SOME runs only — q_growth_accounting flipped retained →
resurrected in ~1/4 nullts sweeps before its round-7 fix.

This script detects the whole class WITHOUT Spark: every registered
oracle is executed N times per fixture variant against DuckDB and the
canonicalized results are hash-compared across runs. A non-self-
deterministic oracle is a bug regardless of what the engine does.

Usage:
    python scripts/oracle_stability.py [--runs=10] [--variants=v1,v2]
                                       [--out=FILE]
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tests.oracle_harness import canon, duck_connect  # noqa: E402


def result_hash(name: str, pdf) -> str:
    c = canon(name, "oracle", pdf)
    return hashlib.md5(
        c.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def main() -> int:
    runs = 10
    variants = ["nullts", "allnull", "dupkeys", "zerovar"]
    out = None
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--variants="):
            variants = a.split("=", 1)[1].split(",")
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]

    import __spark_entry__ as E

    oracles = E.oracle_sql()
    unstable: dict[str, dict] = {}
    for v in variants:
        # a variant containing '/' is taken as a literal fixture dir
        # (e.g. /root/testdata/sf0.01 — NULLs in value/props can feed
        # nullable window keys at the REAL gate too)
        sf_dir = v if "/" in v else str(REPO / "fixtures_adv" / v)
        con = duck_connect(sf_dir)
        for name, sql in sorted(oracles.items()):
            hashes = set()
            err = None
            for _ in range(runs):
                try:
                    hashes.add(result_hash(name, con.execute(sql).df()))
                except Exception as e:  # noqa: BLE001
                    err = f"{type(e).__name__}: {e}"
                    break
            if err is not None:
                # errors are the sweep's jurisdiction (xfail contracts);
                # stability only judges queries that RUN
                continue
            if len(hashes) > 1:
                unstable.setdefault(name, {})[v] = len(hashes)
                print(f"  UNSTABLE [{v}] {name}: {len(hashes)} distinct "
                      f"results over {runs} runs", flush=True)
        con.close()
        print(f"[{v}] done", flush=True)

    result = {"runs": runs, "variants": variants, "unstable": unstable}
    if out:
        Path(out).write_text(json.dumps(result, indent=1))
        print(f"wrote {out}")
    if unstable:
        print(f"{len(unstable)} UNSTABLE oracles: {sorted(unstable)}")
        return 1
    print(f"all {len(oracles)} oracles self-deterministic over {runs} runs "
          f"x {len(variants)} variants")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
