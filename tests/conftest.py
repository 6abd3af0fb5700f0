from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from bm25spark.session import get_spark

    s = get_spark("bm25spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


from bm25spark.golden import PASSAGES  # noqa: E402  (re-exported for tests)


@pytest.fixture(scope="session")
def passages_df(spark):
    return spark.createDataFrame(PASSAGES, "doc_id INT, passage STRING")
