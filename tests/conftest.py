import os

import pytest

os.environ.setdefault("TZ", "UTC")

# ---------------------------------------------------------------------------
# slow-test marking (r13 verdict #2): the full suite outgrew the driver's
# pytest budget (~35 min; the gate truncated at ~70%), so the measured-slow
# tests (>= 5 s in the round-14 --durations=0 run) and four wholly-slow
# modules are tagged `slow` from tests/slow_tests.txt and deselected by the
# default `-m "not slow"` in pytest.ini. Run EVERYTHING with:
#     python -m pytest tests/ -m ""
# The list is data (one nodeid or module path per line), so re-measuring and
# re-tiering never touches test code.
# ---------------------------------------------------------------------------

_SLOW_FILE = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def _load_slow() -> tuple[set, set]:
    ids, modules = set(), set()
    try:
        with open(_SLOW_FILE) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                (modules if "::" not in line else ids).add(line)
    except OSError:
        pass
    return ids, modules


_SLOW_IDS, _SLOW_MODULES = _load_slow()


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        modpath = nodeid.split("::")[0]
        base = nodeid.split("[")[0]  # parametrized ids share the base mark
        if base in _SLOW_IDS or nodeid in _SLOW_IDS or modpath in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from fossil_spark.session import get_spark

    s = get_spark("fossil_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
