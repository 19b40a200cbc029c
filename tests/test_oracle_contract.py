"""Full driver-contract check as ONE pytest command.

``pytest -m oracle`` runs every ``__spark_entry__.queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB at sf0.01 with the exact
comparison the driver uses (row count, sorted column names,
order-insensitive value hash) — the CI-shape version of
``tools/check_oracle.py``. Deselected from default runs (see
pytest.ini addopts) because it re-executes the whole registry
(parameterized from ``queries()``, ~10+ min); round-end evidence is
this one green run.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

pytestmark = [
    pytest.mark.oracle,
    pytest.mark.skipif(
        not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} absent"
    ),
]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    from tools.check_oracle import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _entries():
    import __spark_entry__ as ent

    return sorted(ent.queries().keys())


@pytest.mark.parametrize("name", _entries())
def test_oracle_contract(name, spark, duck):
    import __spark_entry__ as ent

    from tools.check_oracle import canon

    fn = ent.queries()[name]
    oracles = ent.oracle_sql()
    got = fn(spark, SF_DIR).toPandas()
    if name not in oracles:
        # deliberate rows-only entries (binary codec / non-SQL hash
        # family) — the driver records the weaker rows-only check
        assert len(got) >= 0
        return
    want = duck.execute(oracles[name]).fetchdf()
    n_g, cols_g, h_g = canon(got)
    n_w, cols_w, h_w = canon(want)
    assert n_g == n_w, f"{name}: rows {n_g} != oracle {n_w}"
    assert cols_g == cols_w, f"{name}: cols {cols_g} != {cols_w}"
    assert h_g == h_w, f"{name}: value hash mismatch"
