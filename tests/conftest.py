import shutil
import tempfile

import pytest

from outage_data_scraper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="odss-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_catalog_dir():
    d = tempfile.mkdtemp(prefix="odss-cat-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
