"""Pinned grouped-template differential-fuzz seeds as permanent tests.

scripts/fuzz_grouped.py proved grouped == per-block over 200 random v2
seeds (round 14) and 100 random v1 seeds (round 15); marathon runs are a
round activity, so a handful of seeds from each dialect's generator run
in-suite forever. Each seed compiles the same random wide ruleset with
group_same_shape on and off and asserts identical candidate rows AND all
four RejectStats families — exactly run_seed's gate. Failures reproduce
exactly from the seed.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from carrot_transform_spark.atpath import DEFAULT_CONFIG, DEFAULT_DDL  # noqa: E402
from carrot_transform_spark.omop.ddl import load_schemas  # noqa: E402


@pytest.fixture(scope="module")
def omop():
    return load_schemas(DEFAULT_DDL, DEFAULT_CONFIG)


@pytest.mark.parametrize("seed", [7, 42])
def test_grouped_fuzz_pinned_v2(spark, omop, seed):
    from fuzz_grouped import gen_case, run_seed

    assert run_seed(spark, omop, seed, gen_case) is None


@pytest.mark.parametrize("seed", [7, 42])
def test_grouped_fuzz_pinned_v1(spark, omop, seed):
    from fuzz_grouped import gen_case_v1, run_seed

    assert run_seed(spark, omop, seed, gen_case_v1) is None
