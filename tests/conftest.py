import os
import shutil

import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

from search_engine_spark.session import apply_runtime_env  # noqa: E402

apply_runtime_env()

TEST_CPUS = os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(f"local[{TEST_CPUS}]")
        .appName("search_engine_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf():
    from search_engine_spark.corpus import generate_pages

    return generate_pages(n_docs=400, seed=42)


@pytest.fixture(scope="session")
def oracle_idx(pages_pdf):
    from search_engine_spark.oracle.bm25 import build_oracle_index

    return build_oracle_index(pages_pdf, attr_cols=("lang", "warc_ts"))


@pytest.fixture(scope="session")
def index_dir(spark, pages_pdf, tmp_path_factory):
    """One index built over the fixture corpus, shared across tests."""
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig

    d = str(tmp_path_factory.mktemp("idx") / "main")
    cfg = IndexConfig(num_shards=4, num_buckets=4, block_size=32,
                      attr_cols=("lang", "warc_ts"))
    sdf = spark.createDataFrame(pages_pdf)
    build_index(spark, sdf, d, cfg)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def search_index(spark, index_dir):
    from search_engine_spark.query import SearchIndex

    return SearchIndex(spark, index_dir)
