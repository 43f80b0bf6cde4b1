"""Docker image RUNTIME test (marker: ``services``) — the twin of the
reference's tests/test_docker.py: build the repo's image, run the
observe_smoking fixture ETL inside the container, and diff the outputs
against the reference goldens with the same order-insensitive compare the
host-side suite uses. Skips cleanly (with the bring-up hint) when no
docker daemon is reachable — the sandbox case; tests/test_docker_packaging.py
covers the structural contracts there.
"""

from __future__ import annotations

import shutil
import subprocess
import uuid
from pathlib import Path

import pytest

pytestmark = pytest.mark.services

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/root/reference/tests/test_data/observe_smoking")


def _docker_available() -> bool:
    if shutil.which("docker") is None:
        return False
    try:
        return (
            subprocess.run(
                ["docker", "info"], capture_output=True, timeout=30
            ).returncode
            == 0
        )
    except Exception:
        return False


@pytest.fixture(scope="module")
def image():
    if not _docker_available():
        pytest.skip("no docker daemon (start one, then: pytest -m services tests/test_docker_runtime.py)")
    name = f"carrot-transform-spark-test-{uuid.uuid4().hex[:12]}"
    build = subprocess.run(
        ["docker", "build", ".", "-t", name], cwd=REPO, capture_output=True, text=True
    )
    assert build.returncode == 0, build.stderr[-2000:]
    yield name
    subprocess.run(["docker", "rmi", "-f", name], capture_output=True)


def test_container_runs_fixture_etl(image, tmp_path):
    work = tmp_path / "run"
    work.mkdir()
    for f in DATA.iterdir():
        if f.suffix in (".csv", ".json"):
            shutil.copy(f, work / f.name)
    out = work / "out"
    out.mkdir()

    run = subprocess.run(
        [
            "docker", "run", "--rm", f"-v{work}:/run", image,
            "run", "mapstream",
            "--inputs", "/run",
            "--rules-file", "/run/mapping.json",
            "--person", "demos",
            "--output", "/run/out",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert run.returncode == 0, run.stderr[-2000:]

    from tests.carrot_compare import compare_table

    problems = []
    for table in ("person", "observation"):
        problems += compare_table(
            table,
            out / f"{table}.tsv",
            DATA / f"{table}.tsv",
            out / "person_ids.tsv",
            DATA / "person_ids.tsv",
        )
    assert not problems, "\n".join(problems)
