"""Independent-derivation sweep, round 7 part 2: the h_* scalar
surface — the other family SURVEY §17 excluded from re-derivation.
Each test recomputes the entry's expected output from raw parquet
with the Python standard library ONLY (hashlib, urllib.parse, base64,
decimal, textbook Luhn/Levenshtein) — no engine code, no oracle SQL —
and compares against the engine's collected result at sf0.001.
"""

from __future__ import annotations

import base64
import hashlib
import urllib.parse
from decimal import Decimal, ROUND_HALF_EVEN, ROUND_HALF_UP

import pyarrow.parquet as pq
import pytest

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

SF = "/root/testdata/sf0.001"


def run(spark, name: str):
    all_queries()
    return REGISTRY[name].fn(spark, SF).toPandas()


def cols(table: str, names: list[str]) -> list[tuple]:
    t = pq.read_table(f"{SF}/{table}.parquet", columns=names)
    return list(zip(*(t.column(n).to_pylist() for n in names)))


def luhn_sum(s: str) -> int:
    """Textbook Luhn: from the RIGHT, double every second digit,
    subtract 9 when the double exceeds 9, sum everything."""
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total


def levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestLuhn:
    def test_textbook_luhn_over_keys(self, spark):
        got = run(spark, "h_luhn_check").iloc[0]
        keys = [k for (k,) in cols("orders", ["o_orderkey"]) if k < 4000]
        sums = [luhn_sum(str(k).zfill(12)) for k in set(keys)]
        # entry scans orders rows (keys are unique in orders)
        assert int(got["n_keys"]) == len(keys)
        assert int(got["n_valid"]) == sum(1 for s in sums if s % 10 == 0)
        assert int(got["total_luhn_sum"]) == sum(sums)


class TestHashDigest:
    def test_hashlib_parity(self, spark):
        got = run(spark, "h_hash_digest")
        names = dict(cols("customer", ["c_custkey", "c_name"]))
        assert len(got) == len(names)
        for row in got.itertuples():
            nm = names[int(row.c_custkey)]
            assert row.sha == hashlib.sha256(nm.encode()).hexdigest()
            assert row.md5h == hashlib.md5(nm.encode()).hexdigest()
        assert bool(got.iloc[0]["xx_ok"]) is True


class TestFuzzyMatch:
    def test_levenshtein_argmin(self, spark):
        got = run(spark, "h_fuzzy_match").set_index("probe_key")
        master = cols("customer", ["c_custkey", "c_name"])
        probes = [
            (k, nm[:-1] + "X") for k, nm in master if k % 75 == 0
        ]
        assert len(got) == len(probes)
        for pk, pname in probes:
            dists = [(levenshtein(pname, nm), k) for k, nm in master]
            best = min(d for d, _ in dists)
            at_best = [k for d, k in dists if d == best]
            row = got.loc[pk]
            assert int(row["best_dist"]) == best
            assert int(row["best_custkey"]) == min(at_best)
            assert int(row["n_at_best"]) == len(at_best)


class TestIPv4:
    def test_roundtrip_and_subnets(self, spark):
        got = run(spark, "h_ipv4_funcs").iloc[0]
        users = {u for (u,) in cols("events", ["user_id"])
                 if u is not None and u < 200}
        ips = [(u * 2654435761) % 2**32 for u in users]
        # stdlib dotted-quad formatting + reparse
        import ipaddress

        for ip in ips:
            dotted = str(ipaddress.IPv4Address(ip))
            assert int(ipaddress.IPv4Address(dotted)) == ip
        assert int(got["n_ips"]) == len(ips)
        assert bool(got["roundtrip_ok"]) is True
        assert int(got["n_slash16"]) == len({ip >> 16 for ip in ips})
        assert int(got["max_last_octet"]) == max(ip & 0xFF for ip in ips)


class TestUrlFuncs:
    def test_urllib_parity(self, spark):
        got = run(spark, "h_url_funcs")
        import re

        def slug(s):
            return re.sub(r"[^A-Za-z0-9.-]", "x", s)

        groups: dict[tuple, list] = {}
        for did, lang, source in cols(
            "documents", ["doc_id", "lang", "source"]
        ):
            url = (
                f"https://{slug(source or '')}.example.com/docs/{did}"
                f"?lang={slug(lang or '')}&v=2"
            )
            p = urllib.parse.urlparse(url)
            q = urllib.parse.parse_qs(p.query)
            key = (p.hostname, q["lang"][0] if "lang" in q else "")
            groups.setdefault(key, []).append(p.path)
        assert len(got) == len(groups)
        for row in got.itertuples():
            key = (row.host, row.qlang if row.qlang is not None else "")
            assert key in groups, key
            assert int(row.n) == len(groups[key])
            assert row.first_path == min(groups[key])


class TestBinaryEncoding:
    def test_base64_hex_parity(self, spark):
        got = run(spark, "h_binary_encoding").iloc[0]
        names = [nm for (nm,) in cols("customer", ["c_name"])]
        b64 = [base64.b64encode(nm.encode()).decode() for nm in names]
        hx = [nm.encode().hex() for nm in names]
        assert int(got["n_rows"]) == len(names)
        assert int(got["n_distinct_b64"]) == len(set(b64))
        assert int(got["n_distinct_hex"]) == len(set(hx))
        assert int(got["total_b64_chars"]) == sum(len(s) for s in b64)
        assert int(got["total_hex_chars"]) == sum(len(s) for s in hx)


class TestRoundingModes:
    def test_decimal_half_up_vs_half_even(self, spark):
        got = run(spark, "h_rounding_modes").iloc[0]
        prices = [
            p for k, p in cols("orders", ["o_orderkey", "o_totalprice"])
            if k < 4000
        ]

        def deci(x, mode):
            return int(
                Decimal(repr(x * 10)).to_integral_value(mode)
            )

        hu = [deci(p, ROUND_HALF_UP) for p in prices]
        he = [deci(p, ROUND_HALF_EVEN) for p in prices]
        assert int(got["n_rows"]) == len(prices)
        assert int(got["sum_half_up"]) == sum(hu)
        assert int(got["sum_banker"]) == sum(he)
        assert int(got["n_mode_disagreements"]) == sum(
            1 for a, b in zip(hu, he) if a != b
        )
