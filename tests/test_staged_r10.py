"""Pre-staged registrations (__spark_entry__._STAGED — the pinned r10
seven plus the whole r11+ banked backlog, TPC-H wave included): every
staged query must already match its DuckDB oracle with the driver's own
strictness (tests/parity.compare — column-sorted, row-sorted, exact
values), so each future round's registration flip is pure plumbing with
no new verification risk.  Runs at sf0.001 (the driver_sim fast tier);
the sf0.01 sweep is run in-session before each staging commit."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con

STAGED = sorted(entrymod.staged_queries())


def test_every_staged_query_has_an_oracle():
    assert set(entrymod.staged_oracle_sql()) == set(entrymod.staged_queries())


def test_staged_names_do_not_shadow_registered():
    assert not set(entrymod.staged_queries()) & set(entrymod.queries())


@pytest.mark.parametrize("name", STAGED)
def test_staged_query_matches_oracle(spark, name):
    pdf = entrymod.staged_queries()[name](spark, SF_SMALL).toPandas()
    want = duckdb_con(SF_SMALL).execute(entrymod.staged_oracle_sql()[name]).fetchdf()
    problems = compare(pdf, want)
    assert problems == [], problems
    assert len(pdf) > 0, f"{name} returned no rows at sf0.001"
