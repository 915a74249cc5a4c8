"""Lint declared oracles against the comparator contract (COVERAGE.md).

Round 2 lost two driver rows (`A15_agg_extras`, `A17_conditional_aggs`) to
aggregate constructs whose return types vary across DuckDB versions even
though the logical values are identical. This lint makes the failing class
unrepresentable: any new oracle using one of those constructs fails CI
before it can reach the driver gate.

Constructs proven green elsewhere (plain boolean expressions, `round()` of
values far from decimal ties, decimal-cast sums) are intentionally NOT
flagged — the contract bans what failed, not what looks similar.
"""

from __future__ import annotations

import re

from hg_data_pipelines_spark.queries import ORACLES, QUERIES

# Aggregates with engine-version-dependent return types (DuckDB count_if
# has returned HUGEINT; bool_and/bool_or booleans canonicalize differently
# across driver comparator versions). Restate as
# CAST(SUM/MIN/MAX(CASE WHEN ...) AS BIGINT).
_BANNED = ("count_if(", "bool_and(", "bool_or(")

# SUM over an integer expression returns HUGEINT in DuckDB (int128 →
# object dtype on arrival); an integer-typed SUM select item must be
# wrapped in CAST(... AS BIGINT). CASE WHEN ... THEN 1 is the common
# integer-sum shape worth machine-checking.
_INT_SUM = re.compile(r"sum\s*\(\s*case\s+when", re.IGNORECASE)


class TestComparatorContract:
    def test_every_query_has_callable(self):
        for name in ORACLES:
            assert name in QUERIES, f"oracle without query: {name}"

    def test_no_version_sensitive_aggregates(self):
        offenders = {
            name: c
            for name, sql in ORACLES.items()
            for c in _BANNED
            if c in sql.lower()
        }
        assert not offenders, (
            f"comparator-unsafe aggregate constructs in oracles: {offenders} "
            "— restate as CAST(SUM/MIN/MAX(CASE WHEN ...) AS BIGINT), "
            "see COVERAGE.md 'Comparator contract'"
        )

    def test_integer_case_sums_are_cast(self):
        offenders = []
        for name, sql in ORACLES.items():
            for m in _INT_SUM.finditer(sql):
                # a CAST( opening within the 40 chars before the SUM means
                # the select item is CAST(SUM(CASE ...) AS BIGINT)
                pre = sql[max(0, m.start() - 40) : m.start()].lower()
                if "cast(" not in pre:
                    offenders.append(name)
                    break
        assert not offenders, (
            f"SUM(CASE WHEN ...) without CAST(... AS BIGINT) in: {offenders} "
            "— DuckDB returns HUGEINT for integer SUMs"
        )

    def test_ordered_string_agg_only(self):
        # string_agg output is order-sensitive; every use must carry an
        # explicit ORDER BY inside the call.
        offenders = [
            name
            for name, sql in ORACLES.items()
            if "string_agg(" in sql.lower()
            and not re.search(
                r"string_agg\s*\([^)]*order\s+by", sql, re.IGNORECASE
            )
        ]
        assert not offenders, f"unordered string_agg in oracles: {offenders}"
