from __future__ import annotations

import duckdb
import pytest

from flink_streaming_2_10_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    session = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMALL}/{name}.parquet'"
        )
    yield con
    con.close()


def assert_df_matches_oracle(spark_df, duck_con, sql: str):
    """Order-insensitive exact comparison — the driver's contract."""
    import pandas as pd

    a = spark_df.toPandas()
    b = duck_con.sql(sql).df()
    assert sorted(a.columns) == sorted(b.columns), (a.columns, b.columns)
    assert len(a) == len(b), (len(a), len(b))

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    pd.testing.assert_frame_equal(norm(a), norm(b), check_dtype=False, check_exact=True)
