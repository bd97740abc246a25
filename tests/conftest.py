import shutil
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from horseman_article_parser_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hap-spark-tests", master="local[8]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
    })
    yield s
    s.stop()


@pytest.fixture()
def tmp_store():
    d = tempfile.mkdtemp(prefix="hap_store_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
