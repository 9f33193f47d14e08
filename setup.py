"""Shim for wheel-less environments.

Everything lives in pyproject.toml; a normal environment installs with
``pip install -e .`` (build isolation fetches setuptools+wheel). In an
offline/hermetic environment without the ``wheel`` package, PEP 660
editable builds fail with ``invalid command 'bdist_wheel'`` — this shim
enables the legacy path:

    pip install -e . --no-build-isolation --no-use-pep517
"""

from setuptools import setup

setup()
