"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are consistent."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
    # q29 is the only deliberate rows-only query (HLL estimates differ between
    # engines by design); t07/t08/s03 gained exact oracles in round 2 via
    # recursive-CTE closure / engine-portable hashing
    assert set(qs) - set(oracles) == {"q29_approx_distinct"}


def test_entry_runs_and_has_stable_schema(spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["doc_id", "cluster_key", "cluster_size", "quality"]
    rows = df.collect()
    assert len(rows) > 0


@pytest.mark.parametrize("name", ["q01_pricing_summary", "t03_lang_id", "s01_cosine_topk"])
def test_spot_queries_return_rows(spark, name):
    fn = entry_mod.queries()[name]
    assert fn(spark, SF).count() > 0
