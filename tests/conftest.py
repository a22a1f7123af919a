from __future__ import annotations

import pytest

from cdm_to_mods_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cdm-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_table(tmp_path):
    return str(tmp_path / "table")
