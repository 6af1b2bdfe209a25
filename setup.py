"""Shim for environments whose setuptools/pip predate PEP 660 editable
installs or lack the ``wheel`` package (pip's PEP 517 editable build
needs ``bdist_wheel``): ``pip install -e . --no-use-pep517`` takes the
legacy ``setup.py develop`` path through this file. All metadata lives
in pyproject.toml (PEP 621) — setuptools >= 61 reads it from here."""
from setuptools import setup

setup()
