"""Shared pytest fixtures.

Ray is initialised ONCE per session (scope="session") and shut down at
teardown; individual tests must never call ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tests", "tools")
REFERENCE = "/root/reference"

sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


def _build_tool(name: str, sources: list[str], extra: list[str]) -> str | None:
    """Compile a reference-conformance dumper if g++ + the reference exist."""
    exe = os.path.join(TOOLS, name)
    if os.path.exists(exe):
        return exe
    if shutil.which("g++") is None or not os.path.isdir(REFERENCE):
        return None
    cmd = ["g++", "-O2", "-std=c++17", *extra, "-o", exe,
           os.path.join(TOOLS, name + ".cpp"), *sources]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    return exe


@pytest.fixture(scope="session")
def ref_stem_dumper():
    return _build_tool(
        "ref_stem_dumper",
        [f"{REFERENCE}/engine/lib/stemmer/stemmer.cpp"], [])


@pytest.fixture(scope="session")
def ref_parse_dumper():
    return _build_tool(
        "ref_parse_dumper",
        [f"{REFERENCE}/engine/parser/HtmlParser.cpp",
         f"{REFERENCE}/engine/parser/HtmlTags.cpp"], ["-pthread"])


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
