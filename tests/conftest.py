from __future__ import annotations

import pytest

from automatic_data_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("advs-tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs(spark):
    from automatic_data_validator_spark.synth import make_documents

    return make_documents(spark, 5_000, n_media=500, seed=42, num_partitions=4).cache()


@pytest.fixture(scope="session")
def catalog(spark):
    from automatic_data_validator_spark.synth import make_media_catalog

    return make_media_catalog(spark, 500, seed=42).cache()
