"""Packaging metadata (VERDICT r12 #4): the first thing a real user does
is ``pip install`` — pyproject.toml must exist, carry the right deps, and
expose the CLI as a console script.

The install itself is environment-dependent (this container's pip 23 +
setuptools 65 lack ``wheel`` and network access, so only the legacy
``setup.py develop`` path works here; modern environments take PEP 660),
so the suite pins what every path shares: valid PEP 621 metadata, an
entry-point target that imports and answers ``--help`` without a
SparkSession, and — when a console script IS on PATH — the installed
binary smoke."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject() -> dict:
    import tomllib

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_metadata_valid():
    meta = _pyproject()
    proj = meta["project"]
    assert proj["name"] == "pcap-converter-spark"

    import pcap_converter_spark

    assert proj["version"] == pcap_converter_spark.__version__
    deps = {d.split(">")[0].split("=")[0].strip() for d in proj["dependencies"]}
    assert {"pyspark", "numpy", "pandas", "pyarrow"} <= deps
    # duckdb is the ORACLE's engine, not the product's — an extra, never
    # a hard dependency a cluster deploy would have to drag along
    assert "duckdb" not in deps
    extras = proj["optional-dependencies"]
    assert any("duckdb" in d for d in extras["oracle"])
    assert proj["scripts"]["pcap-converter"] == "pcap_converter_spark.cli:main"
    # the shim must stay in sync: legacy environments install through it
    assert os.path.exists(os.path.join(REPO, "setup.py"))


def test_console_entry_target_answers_help():
    """Resolve the console-script target exactly as an installer would
    (module:attr) and smoke ``--help`` for the root parser and every
    subcommand — importable, no Spark session, exits 0."""
    import importlib

    target = _pyproject()["project"]["scripts"]["pcap-converter"]
    mod_name, attr = target.split(":")
    main = getattr(importlib.import_module(mod_name), attr)
    from pcap_converter_spark.cli import _SUBCOMMANDS

    for argv in (["--help"], *[[c, "--help"] for c in _SUBCOMMANDS]):
        with pytest.raises(SystemExit) as ei:
            main(argv)
        assert ei.value.code in (0, None), argv


def test_installed_console_script_smoke():
    """When the package is installed (editable or wheel), the real binary
    must answer --help; on a bare checkout there is nothing to smoke."""
    exe = shutil.which("pcap-converter")
    if exe is None:
        pytest.skip("package not installed in this environment")
    out = subprocess.run(
        [exe, "--help"], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0
    assert "pcap" in out.stdout.lower()


def test_sdist_manifest_covers_package():
    """Every package directory importable at runtime is discovered by the
    [tool.setuptools.packages.find] include — a subpackage missing an
    __init__.py would silently ship broken wheels."""
    pkg_root = os.path.join(REPO, "pcap_converter_spark")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        if any(f.endswith(".py") for f in filenames):
            assert "__init__.py" in filenames, f"{dirpath} lacks __init__.py"


def test_python_dash_m_face_still_works():
    """python -m pcap_converter_spark is the documented no-install face;
    the console script must not have replaced it."""
    out = subprocess.run(
        [sys.executable, "-m", "pcap_converter_spark", "--help"],
        capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert out.returncode == 0
    assert "usage" in out.stdout.lower()
