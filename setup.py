"""Shim for wheel-less environments.

Everything lives in pyproject.toml; a normal environment installs with
``pip install -e .`` (build isolation fetches setuptools+wheel). In an
offline/hermetic environment without the ``wheel`` package, pip refuses
both the PEP 660 editable build (``invalid command 'bdist_wheel'``) and
``--no-use-pep517`` ("not possible ... without setuptools and wheel
installed") — the path that works there is the legacy develop command
this shim enables (same as MIGRATION.md "Install"):

    python setup.py develop --no-deps
"""

from setuptools import setup

setup()
