from __future__ import annotations

import os
import sys

import pytest

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TESTS_DIR)
sys.path.insert(0, _REPO_ROOT)

# Spark's Python workers are separate processes: anything they unpickle by
# reference (e.g. mapInPandas closures defined in test modules) must be
# importable there too.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in [_REPO_ROOT, _TESTS_DIR, os.environ.get("PYTHONPATH")] if p
)

from wistia_video_analytics_project_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    s = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},  # static conf: build-time only
    )
    yield s
    s.stop()
