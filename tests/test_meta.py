"""Meta-tests for the test harness itself.

The quick tier (`pytest -m quick`) is name-addressed through
``conftest.QUICK_TESTS``; a renamed test silently drops out of the tier
(it happened in round 5: two stale names left the smoke tier without
model-loop or load-balancer coverage).  Pin the names to the source so a
rename fails loudly here instead.
"""
import pathlib
import re

import pytest

from tests.conftest import QUICK_FILES, QUICK_TESTS

TESTS_DIR = pathlib.Path(__file__).parent


@pytest.mark.quick
def test_quick_tier_names_exist():
    defined = set()
    for p in TESTS_DIR.glob("test_*.py"):
        defined |= set(re.findall(r"^def (test_\w+)\(", p.read_text(),
                                  flags=re.M))
    missing = QUICK_TESTS - defined
    assert not missing, (
        f"conftest.QUICK_TESTS names match no test function: "
        f"{sorted(missing)} — update QUICK_TESTS after renaming tests")


@pytest.mark.quick
def test_quick_tier_files_exist():
    present = {p.name for p in TESTS_DIR.glob("test_*.py")}
    missing = QUICK_FILES - present
    assert not missing, f"conftest.QUICK_FILES lists absent files: {missing}"
