from __future__ import annotations

import pytest

from crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawler_spark_tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def world():
    from crawler_spark.oracle.fixtures import build_world

    return build_world(n_docs=40, seed=42)


@pytest.fixture(scope="session")
def oracle_result(world):
    from crawler_spark.oracle.crawler import run_oracle

    return run_oracle(world)


@pytest.fixture(scope="session")
def fixture_dir(spark, world, tmp_path_factory):
    from crawler_spark.sources.fixtures_io import write_world

    d = tmp_path_factory.mktemp("world")
    write_world(spark, world, str(d))
    return str(d)


@pytest.fixture(scope="session")
def engine(spark, world, fixture_dir, tmp_path_factory):
    """The default-config engine, crawled once per session (several
    test modules assert against the same golden state)."""
    from tests.test_crawl_parity import build_engine

    return build_engine(spark, world, fixture_dir, tmp_path_factory.mktemp("eng"))
