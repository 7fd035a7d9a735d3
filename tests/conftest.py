import numpy as np
import pandas as pd
import pytest

from ffcl_spark import EngineConfig, get_spark
from ffcl_spark.datagen import make_points


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ffcl_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return EngineConfig(resolution=3)


def points_pdf(kind: str, n: int, seed: int = 7) -> pd.DataFrame:
    xy = make_points(kind, n, seed)
    return pd.DataFrame(
        {"id": np.arange(len(xy), dtype=np.int64), "x": xy[:, 0], "y": xy[:, 1]}
    )


@pytest.fixture(scope="session")
def blobs(spark):
    pdf = points_pdf("blobs", 400)
    return spark.createDataFrame(pdf).cache(), pdf


@pytest.fixture(scope="session")
def circles(spark):
    pdf = points_pdf("noisy_circles", 400)
    return spark.createDataFrame(pdf).cache(), pdf


@pytest.fixture(scope="session")
def grid_exact(spark):
    pdf = points_pdf("grid_exact", 225)
    return spark.createDataFrame(pdf).cache(), pdf
