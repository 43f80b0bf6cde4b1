"""Container packaging sanity (reference parity: tests/test_docker.py).

No docker daemon exists in this environment, so these are structural
checks: the Dockerfile must install the package whose entrypoint the CLI
tests exercise, copy everything the install needs, and not reference paths
that don't exist in the build context.
"""

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOCKERFILE = REPO / "Dockerfile"


@pytest.fixture(scope="module")
def dockerfile():
    return DOCKERFILE.read_text()


def test_copied_paths_exist(dockerfile):
    for m in re.finditer(r"^COPY\s+(.+?)\s+\S+$", dockerfile, re.M):
        for src in m.group(1).split():
            assert (REPO / src.rstrip("/")).exists(), f"COPY source missing: {src}"


def test_entrypoint_matches_console_script(dockerfile):
    m = re.search(r'^ENTRYPOINT \["([^"]+)"\]', dockerfile, re.M)
    assert m, "no ENTRYPOINT"
    pyproject = (REPO / "pyproject.toml").read_text()
    assert f"{m.group(1)} = " in pyproject, "entrypoint is not a declared console script"


def test_java17_runtime(dockerfile):
    # pyspark 4 needs Java 17+; the base image must provide it
    assert re.search(r"^FROM .*(temurin|openjdk).*17", dockerfile, re.M)


def test_package_data_ships_ddl_and_config():
    # the CLI's @carrot defaults resolve inside the installed package, so
    # the sdist/wheel must include them
    assert (REPO / "carrot_transform_spark" / "config").is_dir()
    pyproject = (REPO / "pyproject.toml").read_text()
    assert 'config/*.sql' in pyproject and 'config/*.json' in pyproject
