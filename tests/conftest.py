from __future__ import annotations

import pytest

from annotation_service_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="asvc_tests", shuffle_partitions=8)
    yield s
