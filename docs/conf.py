"""Sphinx configuration for stonkgs_tpu.

Mirrors the reference's doc build (``/root/reference/docs/source/conf.py``,
``tox.ini:96-106`` builds with ``-W``). Built in CI (the ``docs`` job in
``.github/workflows/tests.yml``); this sandbox has no sphinx install.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "stonkgs_tpu"
copyright = "2026, stonkgs_tpu developers"
author = "stonkgs_tpu developers"

try:
    from stonkgs_tpu.version import VERSION as release
except Exception:  # pragma: no cover - version import is best-effort
    release = "0.0.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

autodoc_member_order = "bysource"
autodoc_typehints = "description"

# heavyweight/optional imports that CI may not provide for autodoc
autodoc_mock_imports = ["torch", "optuna", "mlflow"]

templates_path = []
exclude_patterns = ["_build"]

html_theme = "alabaster"
