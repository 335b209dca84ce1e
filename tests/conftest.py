import pytest

from warc_metadata_sidecar_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="tests", cpus=4, shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def docs100(spark):
    from warc_metadata_sidecar_spark import gen

    return gen.documents(spark, 100).cache()


@pytest.fixture(scope="session")
def media_tbl(spark):
    from warc_metadata_sidecar_spark import gen

    return gen.media(spark)
