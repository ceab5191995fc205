"""Cross-engine value parity: every queries() entry with an oracle runs
on Spark AND DuckDB at sf0.001 and must match on columns, row count and
order-insensitive values — the same comparison the driver's
CORRECTNESS gate performs (tools/check_oracles.py is the CLI twin)."""

import math
from pathlib import Path

import pytest

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return repr(v)


def _rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as e

    return e


def _oracle_names():
    import __spark_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_parity(spark, duck, entrymod, name):
    if not Path(SF).exists():
        pytest.skip("testdata not available")
    sdf = entrymod.queries()[name](spark, SF)
    scols = sdf.columns
    srows = [[row[c] for c in scols] for row in sdf.collect()]
    res = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _rows_canon(scols, srows) == _rows_canon(dcols, drows)
