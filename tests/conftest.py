import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from pliers_spark.session import get_spark

    s = get_spark("pliers-spark-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_path(tmp_path_factory):
    from pliers_spark.synthgen import write_pages

    p = tmp_path_factory.mktemp("pages") / "pages.parquet"
    return write_pages(str(p), n_urls=120, max_snapshots=6, seed=42)


@pytest.fixture(scope="session")
def pages(spark, pages_path):
    return spark.read.parquet(pages_path)
