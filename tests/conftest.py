import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from merge_machine_spark.sources.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs300(spark):
    """Deterministic synthetic documents with ground truth (cached)."""
    from merge_machine_spark.sources.synth import generate_documents

    d = generate_documents(spark, 300, seed=42).cache()
    d.count()
    return d
