"""Generate adversarial fixture variants (round-6 item 1, VERDICT r5).

Each variant mirrors the 10-table layout of /root/testdata/sf* with the
same schemas but degenerate content, so the full registry + DuckDB
oracle comparator can run unchanged against it:

  empty    — every table present, zero rows (schema-only parquet)
  single   — exactly one row per table, FK-consistent
  allnull  — keys valid, every nullable non-key column NULL
  zerovar  — value columns constant (zero variance); one all-zero
             embedding among constant vectors (norm-0 division bait)
  unicode  — emoji / CJK / RTL / combining marks / empty & whitespace
             strings / huge tokens / embedded newlines in text columns
  dupkeys  — duplicated primary keys beyond the known
             (l_orderkey, l_linenumber) case, on every table

Deterministic (fixed seed, fixed literals). Output is written under
fixtures_adv/<variant>/ inside the repo — /root/testdata is read-only.

Usage: python scripts/gen_adversarial.py [outdir]
"""

from __future__ import annotations

import math
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

US = pa.timestamp("us")

SCHEMAS: dict[str, pa.Schema] = {
    "region": pa.schema(
        [("r_regionkey", pa.int32()), ("r_name", pa.string())]
    ),
    "nation": pa.schema(
        [
            ("n_nationkey", pa.int32()),
            ("n_name", pa.string()),
            ("n_regionkey", pa.int32()),
        ]
    ),
    "customer": pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("c_nationkey", pa.int32()),
            ("c_acctbal", pa.float64()),
            ("c_mktsegment", pa.string()),
        ]
    ),
    "supplier": pa.schema(
        [
            ("s_suppkey", pa.int64()),
            ("s_name", pa.string()),
            ("s_nationkey", pa.int32()),
            ("s_acctbal", pa.float64()),
        ]
    ),
    "part": pa.schema(
        [
            ("p_partkey", pa.int64()),
            ("p_name", pa.string()),
            ("p_brand", pa.string()),
            ("p_type", pa.string()),
            ("p_size", pa.int32()),
            ("p_retailprice", pa.float64()),
        ]
    ),
    "orders": pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", US),
            ("o_orderpriority", pa.string()),
        ]
    ),
    "lineitem": pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", US),
        ]
    ),
    "events": pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", US),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    ),
    "documents": pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    ),
    "embeddings": pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    ),
}

DIM = 64  # embedding dim — the fixture-family contract (oracles
# hardcode 64: range(1,65) unnests, [0.0]*64 defaults), so variants
# must honor it; a shorter dim would manufacture false failures
TS0 = 1_600_000_000_000_000  # 2020-09-13 12:26:40 UTC in us


def _ts(us_offset: int) -> int:
    return TS0 + us_offset


def _tbl(name: str, cols: dict[str, list]) -> pa.Table:
    schema = SCHEMAS[name]
    arrays = [pa.array(cols[f.name], type=f.type) for f in schema]
    return pa.Table.from_arrays(arrays, schema=schema)


def variant_empty() -> dict[str, pa.Table]:
    return {
        name: _tbl(name, {f.name: [] for f in schema})
        for name, schema in SCHEMAS.items()
    }


def variant_single() -> dict[str, pa.Table]:
    return {
        "region": _tbl("region", {"r_regionkey": [0], "r_name": ["AMERICA"]}),
        "nation": _tbl(
            "nation",
            {"n_nationkey": [0], "n_name": ["UNITED STATES"], "n_regionkey": [0]},
        ),
        "customer": _tbl(
            "customer",
            {
                "c_custkey": [1],
                "c_name": ["Customer#1"],
                "c_nationkey": [0],
                "c_acctbal": [100.5],
                "c_mktsegment": ["BUILDING"],
            },
        ),
        "supplier": _tbl(
            "supplier",
            {
                "s_suppkey": [1],
                "s_name": ["Supplier#1"],
                "s_nationkey": [0],
                "s_acctbal": [50.25],
            },
        ),
        "part": _tbl(
            "part",
            {
                "p_partkey": [1],
                "p_name": ["green solid copper"],
                "p_brand": ["Brand#11"],
                "p_type": ["SMALL PLATED"],
                "p_size": [7],
                "p_retailprice": [900.01],
            },
        ),
        "orders": _tbl(
            "orders",
            {
                "o_orderkey": [1],
                "o_custkey": [1],
                "o_orderstatus": ["F"],
                "o_totalprice": [1234.56],
                "o_orderdate": [_ts(0)],
                "o_orderpriority": ["1-URGENT"],
            },
        ),
        "lineitem": _tbl(
            "lineitem",
            {
                "l_orderkey": [1],
                "l_partkey": [1],
                "l_suppkey": [1],
                "l_linenumber": [1],
                "l_quantity": [17.0],
                "l_extendedprice": [15306.17],
                "l_discount": [0.04],
                "l_tax": [0.02],
                "l_returnflag": ["N"],
                "l_linestatus": ["O"],
                "l_shipdate": [_ts(86_400_000_000)],
            },
        ),
        "events": _tbl(
            "events",
            {
                "event_id": [1],
                "ts": [_ts(3_600_000_000)],
                "user_id": [1],
                "event_type": ["click"],
                "value": [2.5],
                "props": ['{"page": "home"}'],
            },
        ),
        "documents": _tbl(
            "documents",
            {
                "doc_id": [0],
                "text": ["the quick brown fox jumps over the lazy dog"],
                "lang": ["en"],
                "source": ["web"],
                "n_chars": [43],
            },
        ),
        "embeddings": _tbl(
            "embeddings",
            {
                "vec_id": [0],
                "embedding": [[0.1 * (i + 1) for i in range(DIM)]],
                "label": [0],
            },
        ),
    }


def variant_allnull() -> dict[str, pa.Table]:
    """Keys valid (FK-consistent), every nullable non-key column NULL.

    8 rows per fact-ish table so grouping still has something to group.
    """
    n = 8
    return {
        "region": _tbl(
            "region", {"r_regionkey": [0, 1], "r_name": [None, None]}
        ),
        "nation": _tbl(
            "nation",
            {
                "n_nationkey": [0, 1],
                "n_name": [None, None],
                "n_regionkey": [0, 1],
            },
        ),
        "customer": _tbl(
            "customer",
            {
                "c_custkey": list(range(1, n + 1)),
                "c_name": [None] * n,
                "c_nationkey": [i % 2 for i in range(n)],
                "c_acctbal": [None] * n,
                "c_mktsegment": [None] * n,
            },
        ),
        "supplier": _tbl(
            "supplier",
            {
                "s_suppkey": [1, 2],
                "s_name": [None, None],
                "s_nationkey": [0, 1],
                "s_acctbal": [None, None],
            },
        ),
        "part": _tbl(
            "part",
            {
                "p_partkey": [1, 2],
                "p_name": [None, None],
                "p_brand": [None, None],
                "p_type": [None, None],
                "p_size": [None, None],
                "p_retailprice": [None, None],
            },
        ),
        "orders": _tbl(
            "orders",
            {
                "o_orderkey": list(range(1, n + 1)),
                "o_custkey": [(i % n) + 1 for i in range(n)],
                "o_orderstatus": [None] * n,
                "o_totalprice": [None] * n,
                "o_orderdate": [None] * n,
                "o_orderpriority": [None] * n,
            },
        ),
        "lineitem": _tbl(
            "lineitem",
            {
                "l_orderkey": [(i // 2) + 1 for i in range(n)],
                "l_partkey": [(i % 2) + 1 for i in range(n)],
                "l_suppkey": [(i % 2) + 1 for i in range(n)],
                "l_linenumber": [(i % 2) + 1 for i in range(n)],
                "l_quantity": [None] * n,
                "l_extendedprice": [None] * n,
                "l_discount": [None] * n,
                "l_tax": [None] * n,
                "l_returnflag": [None] * n,
                "l_linestatus": [None] * n,
                "l_shipdate": [None] * n,
            },
        ),
        "events": _tbl(
            "events",
            {
                "event_id": list(range(1, n + 1)),
                "ts": [None] * n,
                "user_id": [i % 3 for i in range(n)],
                "event_type": [None] * n,
                "value": [None] * n,
                "props": [None] * n,
            },
        ),
        "documents": _tbl(
            "documents",
            {
                "doc_id": list(range(n)),
                "text": [None] * n,
                "lang": [None] * n,
                "source": [None] * n,
                "n_chars": [None] * n,
            },
        ),
        "embeddings": _tbl(
            "embeddings",
            {
                "vec_id": list(range(n)),
                "embedding": [None] * n,
                "label": [None] * n,
            },
        ),
    }


def variant_zerovar() -> dict[str, pa.Table]:
    """Constant value columns (zero variance) — stddev/corr/slope
    denominators hit zero; identical text collapses every dedup; one
    all-zero embedding baits norm-0 division."""
    n = 12
    const_vec = [1.0] + [0.0] * (DIM - 1)
    vecs = [list(const_vec) for _ in range(n)]
    vecs[n - 1] = [0.0] * DIM  # the norm-0 bait
    return {
        "region": _tbl(
            "region", {"r_regionkey": [0, 1], "r_name": ["SAME", "SAME"]}
        ),
        "nation": _tbl(
            "nation",
            {
                "n_nationkey": [0, 1],
                "n_name": ["SAME", "SAME"],
                "n_regionkey": [0, 1],
            },
        ),
        "customer": _tbl(
            "customer",
            {
                "c_custkey": list(range(1, n + 1)),
                "c_name": ["Customer#X"] * n,
                "c_nationkey": [0] * n,
                "c_acctbal": [100.0] * n,
                "c_mktsegment": ["BUILDING"] * n,
            },
        ),
        "supplier": _tbl(
            "supplier",
            {
                "s_suppkey": [1, 2],
                "s_name": ["Supplier#X"] * 2,
                "s_nationkey": [0, 0],
                "s_acctbal": [50.0, 50.0],
            },
        ),
        "part": _tbl(
            "part",
            {
                "p_partkey": [1, 2],
                "p_name": ["same part"] * 2,
                "p_brand": ["Brand#11"] * 2,
                "p_type": ["SMALL PLATED"] * 2,
                "p_size": [5, 5],
                "p_retailprice": [10.0, 10.0],
            },
        ),
        "orders": _tbl(
            "orders",
            {
                "o_orderkey": list(range(1, n + 1)),
                "o_custkey": [(i % n) + 1 for i in range(n)],
                "o_orderstatus": ["F"] * n,
                "o_totalprice": [500.0] * n,
                "o_orderdate": [_ts(0)] * n,
                "o_orderpriority": ["1-URGENT"] * n,
            },
        ),
        "lineitem": _tbl(
            "lineitem",
            {
                "l_orderkey": [(i // 2) + 1 for i in range(n)],
                "l_partkey": [(i % 2) + 1 for i in range(n)],
                "l_suppkey": [(i % 2) + 1 for i in range(n)],
                "l_linenumber": [(i % 2) + 1 for i in range(n)],
                "l_quantity": [10.0] * n,
                "l_extendedprice": [100.0] * n,
                "l_discount": [0.05] * n,
                "l_tax": [0.02] * n,
                "l_returnflag": ["N"] * n,
                "l_linestatus": ["O"] * n,
                "l_shipdate": [_ts(86_400_000_000)] * n,
            },
        ),
        "events": _tbl(
            "events",
            {
                "event_id": list(range(1, n + 1)),
                "ts": [_ts(0)] * n,  # ALL SAME TIMESTAMP: zero gaps
                "user_id": [1] * n,
                "event_type": ["click"] * n,
                "value": [3.0] * n,
                "props": ['{"k": 1}'] * n,
            },
        ),
        "documents": _tbl(
            "documents",
            {
                "doc_id": list(range(n)),
                "text": ["identical text in every row"] * n,
                "lang": ["en"] * n,
                "source": ["web"] * n,
                "n_chars": [27] * n,
            },
        ),
        "embeddings": _tbl(
            "embeddings",
            {
                "vec_id": list(range(n)),
                "embedding": vecs,
                "label": [0] * n,
            },
        ),
    }


_UNICODE_TEXTS = [
    "café naïve résumé",  # latin-1 accents
    "\U0001f600\U0001f680\U0001f409 emoji only \U0001f389",  # astral-plane emoji
    "日本語のテキストです",  # CJK, no spaces
    "مرحبا بالعالم",  # RTL arabic
    "ééé combining acute",  # combining marks
    "",  # empty string
    "   \t  \n ",  # whitespace-only with newline/tab
    "a" * 5000,  # one 5000-char token
    "line1\nline2\r\nline3\ttabbed",  # embedded newlines/CRLF/tabs
    "null\x00byte?",  # literal NUL inside a string
    "mixed \U0001f600 ascii 日本 and space",
    "ßß SHARP-S casefold trap İ dotted-I",
]


def variant_unicode() -> dict[str, pa.Table]:
    n = len(_UNICODE_TEXTS)
    rng = random.Random(6)
    base = variant_zerovar()  # dims don't matter here; reuse shapes
    out = dict(base)
    out["documents"] = _tbl(
        "documents",
        {
            "doc_id": list(range(n)),
            "text": list(_UNICODE_TEXTS),
            "lang": ["en", "und", "ja", "ar", "en", "", "en", "xx", "en",
                     "en", "mixed", "de"],
            "source": ["web", "\U0001f4da books", "web", "web", "crawl",
                       "web", "web", "web", "crawl", "web", "web", "web"],
            "n_chars": [len(t) for t in _UNICODE_TEXTS],
        },
    )
    out["events"] = _tbl(
        "events",
        {
            "event_id": list(range(1, n + 1)),
            "ts": [_ts(i * 60_000_000) for i in range(n)],
            "user_id": [i % 3 for i in range(n)],
            "event_type": ["click", "view", "購入", "click", "view",
                           "", "click", "view", "click", "view", "click",
                           "view"],
            "value": [round(rng.uniform(0, 10), 2) for _ in range(n)],
            "props": [
                '{"q": "café"}',
                '{"emoji": "\U0001f600"}',
                '{"jp": "日本"}',
                "not json at all",
                '{"nested": {"a": [1,2]}}',
                "",
                "{}",
                '{"n": null}',
                '{"big": 12345678901234567890}',
                '{"s": "line\\nbreak"}',
                '{"mix": "ß"}',
                "[1,2,3]",
            ],
        },
    )
    # customer/part names also get unicode (string funcs touch them)
    cust = base["customer"].to_pydict()
    ncust = len(cust["c_custkey"])
    cust["c_name"] = [(_UNICODE_TEXTS[i % n] or "blank")[:64] for i in range(ncust)]
    out["customer"] = _tbl("customer", cust)
    return out


def variant_dupkeys() -> dict[str, pa.Table]:
    """Duplicate primary keys on every table (each key appears twice
    with DIFFERENT non-key values, so keep-first/keep-any policies and
    join fan-out get exercised and any uniqueness assumption breaks)."""
    n = 6  # distinct keys; every one duplicated → 2n rows
    def dup(vals):
        return [v for v in vals for _ in (0, 1)]

    ts_a = [_ts(i * 3_600_000_000) for i in range(n)]
    return {
        "region": _tbl(
            "region",
            {"r_regionkey": dup([0, 1]), "r_name": ["A", "A2", "B", "B2"]},
        ),
        "nation": _tbl(
            "nation",
            {
                "n_nationkey": dup([0, 1]),
                "n_name": ["N0", "N0dup", "N1", "N1dup"],
                "n_regionkey": dup([0, 1]),
            },
        ),
        "customer": _tbl(
            "customer",
            {
                "c_custkey": dup(range(1, n + 1)),
                "c_name": [f"Customer#{i}{s}" for i in range(1, n + 1) for s in ("", "dup")],
                "c_nationkey": dup([i % 2 for i in range(n)]),
                "c_acctbal": [float(10 * i + j) for i in range(1, n + 1) for j in (0, 1)],
                "c_mktsegment": dup(["BUILDING", "AUTOMOBILE", "MACHINERY"] * 2),
            },
        ),
        "supplier": _tbl(
            "supplier",
            {
                "s_suppkey": dup([1, 2]),
                "s_name": ["S1", "S1dup", "S2", "S2dup"],
                "s_nationkey": dup([0, 1]),
                "s_acctbal": [5.0, 6.0, 7.0, 8.0],
            },
        ),
        "part": _tbl(
            "part",
            {
                "p_partkey": dup([1, 2]),
                "p_name": ["p one", "p one dup", "p two", "p two dup"],
                "p_brand": dup(["Brand#11", "Brand#22"]),
                "p_type": dup(["SMALL PLATED", "LARGE BRUSHED"]),
                "p_size": [3, 4, 5, 6],
                "p_retailprice": [10.0, 11.0, 12.0, 13.0],
            },
        ),
        "orders": _tbl(
            "orders",
            {
                "o_orderkey": dup(range(1, n + 1)),
                "o_custkey": dup([(i % n) + 1 for i in range(n)]),
                "o_orderstatus": dup(["F", "O", "P"] * 2),
                "o_totalprice": [float(100 * i + j) for i in range(1, n + 1) for j in (0, 7)],
                "o_orderdate": dup(ts_a),
                "o_orderpriority": dup(["1-URGENT", "3-MEDIUM"] * 3),
            },
        ),
        "lineitem": _tbl(
            "lineitem",
            {
                # (l_orderkey, l_linenumber) duplicated — the compound
                # key dup beyond the known single case
                "l_orderkey": dup([(i // 2) + 1 for i in range(n)]),
                "l_partkey": dup([(i % 2) + 1 for i in range(n)]),
                "l_suppkey": dup([(i % 2) + 1 for i in range(n)]),
                "l_linenumber": dup([(i % 2) + 1 for i in range(n)]),
                "l_quantity": [float(i + 1 + j) for i in range(n) for j in (0, 20)],
                "l_extendedprice": [float(50 * (i + 1) + j) for i in range(n) for j in (0, 3)],
                "l_discount": dup([0.01 * (i % 5) for i in range(n)]),
                "l_tax": dup([0.02] * n),
                "l_returnflag": dup(["N", "R", "A"] * 2),
                "l_linestatus": dup(["O", "F"] * 3),
                "l_shipdate": dup(ts_a),
            },
        ),
        "events": _tbl(
            "events",
            {
                "event_id": dup(range(1, n + 1)),
                "ts": dup(ts_a),
                "user_id": dup([i % 3 for i in range(n)]),
                "event_type": dup(["click", "view", "purchase"] * 2),
                "value": [float(i + j) for i in range(n) for j in (0, 100)],
                "props": dup(['{"k": %d}' % i for i in range(n)]),
            },
        ),
        "documents": _tbl(
            "documents",
            {
                "doc_id": dup(range(n)),
                "text": [f"document {i} body {s}" for i in range(n) for s in ("alpha", "beta")],
                "lang": dup(["en", "fr", "de"] * 2),
                "source": dup(["web", "books"] * 3),
                "n_chars": dup([20 + i for i in range(n)]),
            },
        ),
        "embeddings": _tbl(
            "embeddings",
            {
                "vec_id": dup(range(n)),
                "embedding": [
                    [float(i + 1) / (k + 1) for k in range(DIM)]
                    for i in range(n)
                    for _ in (0, 1)
                ],
                "label": dup([i % 2 for i in range(n)]),
            },
        ),
    }


def variant_nullts() -> dict[str, pa.Table]:
    """NULL event-time with NON-NULL event_type (round-7, ADVICE r6).

    The allnull variant masks streaming NULL-ts divergence because
    event_type is also NULL there (no 'click'/'purchase' rows survive
    either side's type filter). Here events mixes:
      - NULL-ts clicks AND purchases (rows a batch oracle keeps but the
        engine's pre-stateful `ts IS NOT NULL` drop removes),
      - valid-ts clicks/purchases that DO pair within 30 min,
      - valid-ts views (watermark advancement fuel).
    Any engine/oracle asymmetry in NULL-event-time handling diverges on
    this fixture; everything else reuses the well-formed zerovar shapes.
    """
    out = variant_zerovar()
    n = 24
    types = []
    tss: list[int | None] = []
    users = []
    for i in range(n):
        if i % 4 == 0:
            # NULL ts, real type — the bait rows (both join sides)
            types.append("click" if i % 8 == 0 else "purchase")
            tss.append(None)
        elif i % 4 == 1:
            types.append("click")
            tss.append(_ts(i * 60_000_000))  # i minutes in
        elif i % 4 == 2:
            types.append("purchase")
            tss.append(_ts((i - 1) * 60_000_000 + 30_000_000))  # 30s after
        else:
            types.append("view")
            tss.append(_ts(i * 3_600_000_000))  # hours out: watermark fuel
        users.append(i % 3)
    out["events"] = _tbl(
        "events",
        {
            "event_id": list(range(1, n + 1)),
            "ts": tss,
            "user_id": users,
            "event_type": types,
            "value": [float(i) for i in range(n)],
            "props": ['{"k": 1}'] * n,
        },
    )
    return out


def variant_extremes() -> dict[str, pa.Table]:
    """Boundary-value fixture (round-7 follow-on): magnitudes and
    boundaries real testdata never reaches, chosen to be DECISIVE for
    engine bugs while staying stable under the driver comparator's
    float round(9):

      - int64 ids at/above 2^53 (9007199254740993 is the first odd
        integer a float64 cannot represent) — any engine path that
        round-trips a key through float64 diverges by whole units;
      - money at a 1e6 grid edge with exact cents and a refund
        (negative) row. NOT 1e13: the first aggressive sweep showed
        correct double stddev over 1e13-scale values diverges by
        1 ULP (~5e-4 absolute) between engines from summation order
        alone — above the comparator's round(9) — so float-aggregated
        columns stay ≤ 1e6 (stddev ULP ~1e-10) and variance-feeding
        columns ≤ 1e3 (var ULP ~1e-10). The int64-overflow bug class
        the 1e13 run exposed is pinned by tests/test_overflow_r7.py
        with synthetic magnitudes instead;
      - timestamps at epoch 0, PRE-epoch (1950), far future (2250,
        inside pandas' ns range), a µs-adjacent pair (t, t+1µs), the
        2020→2021 year boundary and leap day — bait for unix-seconds
        truncation, `ts > 0` assumptions, and negative-µs floor-div;
      - a large-mean/small-spread value group (mean 1e3, spread
        0.25) plus same-sign tiny values (1e-6 grid);
      - a refund row (negative extendedprice), discount 0.99/0.0,
        tax 0.5, quantity 1e6 — sign/range assumptions;
      - documents: 200k-char doc, one 100k-char single token, a
        30k-token repeated-bigram doc, punctuation-only, digits-only
        — tokenizer/shingle/chunk-window and BM25 length extremes;
      - embeddings with 1e10 dynamic range (1e-8..1e4 components,
        same-sign): float32 accumulation loses the small terms at
        ~1e-7 relative, well above round(9) on O(1e4) outputs, while
        double agrees; 12 vectors so PQ's k=16 refusal contract holds.
    """
    # --- events: 32 rows -------------------------------------------------
    BIG = 9_007_199_254_740_993  # 2^53 + 1
    ev_ids = []
    tss = []
    users = []
    types = []
    vals = []
    props = []
    deep = "".join('{"a":' for _ in range(20)) + "1" + "}" * 20
    longv = '{"s": "' + "x" * 10_000 + '"}'
    for i in range(32):
        ev_ids.append(BIG + i if i % 3 == 0 else i + 1)
        users.append(BIG if i % 4 == 0 else (BIG + 1 if i % 4 == 1 else i % 3))
        if i == 0:
            tss.append(0)  # 1970-01-01T00:00:00 exactly (epoch zero)
        elif i == 1:
            tss.append(-616_000_000_000_000)  # 1950-06-23, pre-epoch
        elif i == 2:
            tss.append(8_835_955_200_000_000)  # 2250-01-04, far future
        elif i == 3:
            tss.append(1_609_459_199_999_999)  # 2020-12-31T23:59:59.999999
        elif i == 4:
            tss.append(1_609_459_200_000_000)  # 2021-01-01T00:00:00
        elif i == 5:
            tss.append(1_583_020_799_000_000)  # 2020-02-29T23:59:59 leap day
        elif i == 6:
            tss.append(_ts(7_000_000))
        elif i == 7:
            tss.append(_ts(7_000_001))  # µs-adjacent to row 6
        else:
            tss.append(_ts(i * 60_000_000))  # minute grid: sessions pair up
        types.append(["click", "purchase", "view", "click"][i % 4])
        if i < 8:
            vals.append(1_000.0 + i * 0.25)  # large-ish mean, small spread
        elif i < 12:
            vals.append(1e-6 * (i - 7))  # tiny same-sign
        elif i < 16:
            vals.append(999.999999)  # 3+6 digit double-exactish
        else:
            vals.append(float(i))
        props.append(deep if i == 0 else (longv if i == 1 else
                     '{"n": 4611686018427387904}' if i == 2 else
                     '{"k": %d}' % i))
    # --- documents: 8 rows ------------------------------------------------
    doc_texts = [
        ("the quick brown fox jumps over the lazy dog. " * 4445).rstrip(),  # ~200k chars
        "w" * 100_000,  # one giant token
        ("spam ham " * 15_000).rstrip(),  # 30k tokens, 2 distinct
        "!!! ??? ... ,,, ;;; ::: --- ***",  # punctuation only
        "0123456789 " * 40,  # digits only
        "normal short document about parking data",
        "another ordinary document body with words",
        "Z",  # single char
    ]
    n_doc = len(doc_texts)
    # --- embeddings: 12 vectors, 1e10 dynamic range, same-sign -----------
    vecs = []
    for v in range(12):
        if v == 0:
            vec = [1e4 if k == 0 else 1e-8 for k in range(DIM)]  # spike
        elif v == 1:
            vec = [1e-8] * DIM  # uniformly tiny (norm 8e-8, nonzero)
        elif v == 2:
            vec = [1e4] * DIM  # uniformly large
        else:
            vec = [1e-8 + (1e4 - 1e-8) * ((k * (v + 2)) % DIM) / DIM
                   for k in range(DIM)]
        vecs.append(vec)
    n_ord = 8
    return {
        "region": _tbl(
            "region", {"r_regionkey": [0, 1], "r_name": ["R" * 64, "r"]}
        ),
        "nation": _tbl(
            "nation",
            {
                "n_nationkey": [0, 1],
                "n_name": ["N" * 64, "n"],
                "n_regionkey": [0, 1],
            },
        ),
        "customer": _tbl(
            "customer",
            {
                "c_custkey": [BIG, BIG + 1, BIG + 2, BIG + 3, 1, 2, 3, 4],
                "c_name": [f"Customer#{i}" for i in range(8)],
                "c_nationkey": [i % 2 for i in range(8)],
                # negative balances and a 1e6 grid edge — kept ≤ 1e6 so
                # CORRECT double stddev/var over the column stays inside
                # the comparator's round(9) (1-ULP at 1e13 is 5e-4 and
                # false-fails; measured on the first aggressive sweep)
                "c_acctbal": [-999_999.99, 999_999.99,
                              0.0, -0.01, 0.01, 54_321.0, -54_321.0, 123.45],
                "c_mktsegment": ["BUILDING", "AUTOMOBILE"] * 4,
            },
        ),
        "supplier": _tbl(
            "supplier",
            {
                "s_suppkey": [BIG, 1],
                "s_name": ["S-big", "S-small"],
                "s_nationkey": [0, 1],
                "s_acctbal": [-999_999.99, 999_999.99],
            },
        ),
        "part": _tbl(
            "part",
            {
                "p_partkey": [BIG, 1],
                "p_name": ["part " + "x" * 120, "p"],
                "p_brand": ["Brand#11", "Brand#22"],
                "p_type": ["SMALL PLATED", "LARGE BRUSHED"],
                "p_size": [2_147_483_647, 0],  # int32 max / zero
                "p_retailprice": [999_999.99, 0.01],
            },
        ),
        "orders": _tbl(
            "orders",
            {
                "o_orderkey": [BIG + i if i % 2 == 0 else i + 1
                               for i in range(n_ord)],
                "o_custkey": [BIG, BIG + 1, BIG + 2, BIG + 3, 1, 2, 3, 4],
                "o_orderstatus": ["F", "O", "P", "F", "O", "P", "F", "O"],
                "o_totalprice": [999_999.99, 0.01, -12_345.67,
                                 999_999.98, 500.0, 500.0, 0.0, 42.42],
                "o_orderdate": [0, -616_000_000_000_000,
                                8_835_955_200_000_000,
                                1_609_459_199_999_999, _ts(0), _ts(0),
                                _ts(86_400_000_000), _ts(172_800_000_000)],
                "o_orderpriority": ["1-URGENT", "5-LOW"] * 4,
            },
        ),
        "lineitem": _tbl(
            "lineitem",
            {
                "l_orderkey": [(BIG + (i // 2)) if (i // 2) % 2 == 0
                               else (i // 2) + 1 for i in range(16)],
                "l_partkey": [BIG if i % 2 == 0 else 1 for i in range(16)],
                "l_suppkey": [BIG if i % 3 == 0 else 1 for i in range(16)],
                "l_linenumber": [(i % 2) + 1 for i in range(16)],
                "l_quantity": [1e3 if i == 0 else float(i + 1)
                               for i in range(16)],
                # one refund (negative), one zero, one 1e6 grid edge
                "l_extendedprice": [-12_345.67 if i == 1 else
                                    0.0 if i == 2 else
                                    999_999.99 if i == 3 else
                                    float(100 * (i + 1)) + 0.99
                                    for i in range(16)],
                "l_discount": [0.99 if i == 0 else 0.0 if i == 1 else
                               0.05 for i in range(16)],
                "l_tax": [0.5 if i == 0 else 0.02 for i in range(16)],
                "l_returnflag": [["N", "R", "A"][i % 3] for i in range(16)],
                "l_linestatus": [["O", "F"][i % 2] for i in range(16)],
                "l_shipdate": [0 if i == 0 else
                               -616_000_000_000_000 if i == 1 else
                               8_835_955_200_000_000 if i == 2 else
                               _ts(i * 86_400_000_000) for i in range(16)],
            },
        ),
        "events": _tbl(
            "events",
            {
                "event_id": ev_ids,
                "ts": tss,
                "user_id": users,
                "event_type": types,
                "value": vals,
                "props": props,
            },
        ),
        "documents": _tbl(
            "documents",
            {
                "doc_id": [BIG + i if i % 2 == 0 else i for i in range(n_doc)],
                "text": doc_texts,
                "lang": ["en"] * n_doc,
                "source": ["web", "books"] * (n_doc // 2),
                "n_chars": [len(t) for t in doc_texts],
            },
        ),
        "embeddings": _tbl(
            "embeddings",
            {
                # vec_id 0 stays: it is the conventional query anchor
                # (q_knn_cosine, j_ivf_knn); the rest alternate 2^53+
                # and small ids
                "vec_id": [0 if v == 0 else
                           (BIG + v if v % 2 == 0 else v)
                           for v in range(12)],
                "embedding": vecs,
                "label": [v % 3 for v in range(12)],
            },
        ),
    }


def variant_geoskew() -> dict[str, pa.Table]:
    """Spatial hot-cell fixture (round-9, verdict watch item 2).

    The geo family derives (lat, lon) deterministically from event_id,
    so a repeated event_id IS a repeated point: here ≥90% of events
    share event_id=7777777 — every one of them lands in the same
    eps-fine-cell, the downtown-skew regime where the density
    self-join's per-cell pair mass grows as h² and no bucketing can
    help. geo_density_core must DEGRADE here (round 11: cell-level
    count-based estimate for hot-ring points past GEO_DENSITY_HOT_CAP,
    exact elsewhere, loud n_approx_pts/degraded columns) and stay
    GREEN against its mirrored oracle; every other geo entry (hotspot
    census, zone argmin, PIP fold, ring kNN with its bounded 4-query
    probe set, trip segments) must stay green too — their plans never
    pair points against points. 4000 events keeps the sweep fast while
    putting 3600 points in one cell, 1.8× the cap.

    The duplicated hot id carries a CONSTANT payload (event_type,
    value): this fixture's adversary is spatial skew, and keyed-dedup
    entries (s_dedup_watermark) have a deterministic answer only when
    a duplicated key's payload is a function of the key — the
    first-seen survivor of heterogeneous payloads is micro-batch-order
    dependent, which is the dupkeys fixture's DELIBERATELY structured
    territory (arrival == value order there), not this one's (the
    first full-registry sweep caught exactly that: one survivor-value
    divergence on the hot id). The 10% spread rows have unique ids and
    keep full payload variety. Timestamps and users stay well-formed
    so the non-geo event entries exercise real aggregation paths; the
    other nine tables reuse the well-formed zerovar shapes.
    """
    out = variant_zerovar()
    n = 4000
    hot = 7777777
    rng = random.Random(99)
    ids, types, values = [], [], []
    for i in range(n):
        if i % 10 == 9:
            ids.append(1_000 + i * 37)  # 10% spread across the box
            types.append(("click", "purchase", "view")[i % 3])
            values.append(round(rng.uniform(1.0, 9.0), 2))
        else:
            ids.append(hot)  # 90% in ONE derived point
            types.append("click")
            values.append(5.0)
    out["events"] = _tbl(
        "events",
        {
            "event_id": ids,
            "ts": [_ts(i * 60_000_000) for i in range(n)],
            "user_id": [i % 50 for i in range(n)],
            "event_type": types,
            "value": values,
            "props": ['{"k": 1}'] * n,
        },
    )
    return out


def variant_vecskew() -> dict[str, pa.Table]:
    """LSH hot-bucket fixture (round-10, verdict item 6) — the vector
    analog of geoskew's hot cell.

    95% of the embeddings (380 of 400) are byte-identical copies of
    one non-axis 64-dim direction, so EVERY hyperplane sign bit agrees
    and all of them land in a single LSH bucket in every band — the
    degenerate regime where per-bucket pair work is O(h²) no matter
    how many planes exist. The banded self-join must stay correct here
    (one 380-row bucket is one Arrow-batch matmul — fine at this n;
    the max_bucket cap + dropped-bucket warning for the at-scale
    version is unit-pinned in tests/test_vecskew_r10.py), MinHash/LSH
    dedup sees the same single-bucket collapse through the identical
    documents, and the ANN index entries get one list holding 95% of
    the corpus (probe ranking must still recover the exact top-k:
    ties at sim=1.0 break on vec_id on both engines). The 5% spread
    rows keep k-means/PQ training non-degenerate (400 ≥ k=16). The
    other nine tables reuse the well-formed zerovar shapes."""
    out = variant_zerovar()
    n = 400
    hot = [math.cos(j * 0.7) + 1.5 for j in range(DIM)]  # non-axis, norm >> 0
    rng = random.Random(1234)
    vecs = []
    for i in range(n):
        if i % 20 == 19:
            vecs.append([rng.uniform(-1.0, 1.0) for _ in range(DIM)])
        else:
            vecs.append(list(hot))
    out["embeddings"] = _tbl(
        "embeddings",
        {
            "vec_id": list(range(n)),  # vec_id 0 = hot: the query anchor
            "embedding": vecs,
            "label": [i % 3 for i in range(n)],
        },
    )
    return out


VARIANTS = {
    "empty": variant_empty,
    "single": variant_single,
    "allnull": variant_allnull,
    "zerovar": variant_zerovar,
    "unicode": variant_unicode,
    "dupkeys": variant_dupkeys,
    "nullts": variant_nullts,
    "extremes": variant_extremes,
    "geoskew": variant_geoskew,
    "vecskew": variant_vecskew,
}


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures_adv",
    )
    for vname, fn in VARIANTS.items():
        vdir = os.path.join(outdir, vname)
        os.makedirs(vdir, exist_ok=True)
        tables = fn()
        assert set(tables) == set(SCHEMAS), (vname, set(SCHEMAS) - set(tables))
        for tname, tbl in tables.items():
            assert tbl.schema.equals(SCHEMAS[tname]), (vname, tname)
            pq.write_table(tbl, os.path.join(vdir, f"{tname}.parquet"))
        print(f"wrote {vdir}: " + ", ".join(
            f"{t}={tables[t].num_rows}" for t in sorted(tables)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
