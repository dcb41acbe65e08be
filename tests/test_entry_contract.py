"""Mirror of the external driver gate: every queries() entry vs its
oracle_sql() through DuckDB at sf0.001 (row count + columns + sorted
value comparison). Heavier than unit tests but the single highest-value
regression guard in the repo."""

import pathlib
import sys

import duckdb
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import __spark_entry__ as E  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "events", "documents", "embeddings",
    "lineitem", "orders", "customer",  # star-schema queries
    "supplier", "nation", "region",  # Q5-shape dimension chain
    "part",  # Q16 shape
]

# The ivf_ann oracle bakes per-scale k-means centroid sets keyed by an
# exact float discriminator (scripts/gen_ivf_centroids.py), so since
# round 5 it is hash-exact at sf0.001 like every other query and needs
# no scale override.
SF_OVERRIDE: dict[str, str] = {}


def _connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def con():
    return _connect(SF_DIR)


def _norm(rows, cols):
    # ONE canonical-form definition for the whole repo: reuse the
    # sweep harness's canonicalizer (integral floats render as ints so
    # a DuckDB HUGEINT materialized as float64 compares by VALUE with
    # Spark's long/double) instead of mirroring it here and drifting.
    sys.path.insert(0, str(ROOT / "scripts"))
    from check_entry import canonical_rows

    return canonical_rows(rows, cols)


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_matches_oracle(spark, con, name):
    sf_dir = SF_OVERRIDE.get(name, SF_DIR)
    if sf_dir != SF_DIR:
        con = _connect(sf_dir)
    sdf = E.queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    cur = con.execute(E.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), "column names must match"
    assert len(srows) == len(orows), "row counts must match"
    assert _norm(srows, sdf.columns) == _norm(orows, ocols)


def test_rows_only_queries_run(spark):
    for name in set(E.queries()) - set(E.oracle_sql()):
        df = E.queries()[name](spark, SF_DIR)
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "max_score" in df.columns
