import pytest


@pytest.fixture(scope="session")
def spark():
    from extractor_spark.spark.session import get_spark

    spark = get_spark("extractor-spark-tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()
