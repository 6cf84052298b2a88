from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
FIXTURES = Path(__file__).resolve().parent / "fixtures"
sys.path.insert(0, str(REPO))

HAS_NODE = shutil.which("node") is not None


def js_oracle(op: str, args: list):
    """Run the JS differential oracle (true JS regex/trim/URL semantics)."""
    proc = subprocess.run(
        ["node", str(Path(__file__).parent / "js_oracle.mjs")],
        input=json.dumps({"op": op, "args": args}),
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(proc.stdout)


def fixture_text(name: str) -> str:
    return (FIXTURES / name).read_text()


@pytest.fixture(scope="session")
def spark():
    from spider_spark.session import get_spark

    s = get_spark(app_name="spider-spark-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_ckpt(tmp_path):
    d = tmp_path / "ckpt"
    d.mkdir()
    return str(d)
