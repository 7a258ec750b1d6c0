import os
from pathlib import Path

import pytest

FIXTURES = Path(__file__).parent / "fixtures"

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test sessions small


@pytest.fixture(scope="session")
def spark():
    from kenlm_spark.session import get_spark

    s = get_spark("kenlm_spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def arpa_model():
    from kenlm_spark.ngram.arpa import load_arpa

    return load_arpa(str(FIXTURES / "test.arpa"))


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
