import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import pytest  # noqa: E402

from cordon_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    return get_spark(
        "cordon_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        driver_memory="4g",
        arrow_batch=500,
    )


@pytest.fixture(scope="session")
def tiny_transcripts():
    from cordon_spark.datagen import generate_transcripts

    pdf, truth = generate_transcripts(n_convs=6, mean_turns=30, seed=7)
    return pdf, truth


@pytest.fixture(scope="session")
def tiny_df(spark, tiny_transcripts):
    pdf, _ = tiny_transcripts
    return spark.createDataFrame(pdf)
