"""Thin setuptools shim: metadata lives in pyproject.toml.

Exists so `python setup.py develop` works in environments without the
`wheel` package (PEP 660 editable installs need bdist_wheel; pip's
--no-use-pep517 fallback also refuses without wheel). Wherever wheel
is available, the standard `pip install -e .` path works instead.
"""

from setuptools import setup

setup()
