"""Legacy shim: metadata lives in pyproject.toml.

In an offline environment without the ``wheel`` package (where pip's
PEP-660 editable build can't run), install with::

    python setup.py develop --user

Anywhere normal, prefer ``pip install -e .``.
"""

from setuptools import setup

setup()
