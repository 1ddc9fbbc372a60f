"""Import machinery for the reference package at ``/root/reference/src``.

The parity tests in ``test_reference_parity.py`` instantiate the reference's
OWN torch classes (``stonkgs.models.stonkgs_model`` etc.) and compare them
against this framework — retiring the shared-misreading risk of testing only
against the hand-written ``torch_golden.py`` mirror.

Importing the reference package verbatim is not possible in this environment:

* ``stonkgs.constants`` has import-time side effects — ``pystow.ensure``
  downloads the BioBERT vocab (no network egress here) and ``os.makedirs``
  creates directories outside the repo (``/root/data`` etc., which this
  build must not touch) — and needs deps that are not installed (pystow,
  python-dotenv).
* ``stonkgs.models.kg_baseline_model`` / ``*_finetuning`` import mlflow and
  pytorch_lightning, which are not installed.

So this module installs *stub* modules for ``stonkgs`` (a namespace package
pointing at the reference source so submodules load unmodified),
``stonkgs.constants`` (same constant names, paths redirected into a temp
fixture dir), ``mlflow`` and ``pytorch_lightning`` (inert no-ops) — then
imports the real reference model code byte-for-byte.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

REF_SRC = "/root/reference/src"


def _noop(*args, **kwargs):
    return None


class _NoopContext:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return _NoopContext()


def _install_noop_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__getattr__ = lambda attr: _NoopContext()  # PEP 562
    sys.modules[name] = mod
    return mod


def _install_third_party_stubs() -> None:
    if "mlflow" not in sys.modules:
        m = _install_noop_module("mlflow")
        pt = _install_noop_module("mlflow.pytorch")
        m.pytorch = pt
    if "pytorch_lightning" not in sys.modules:
        import torch

        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = torch.nn.Module  # only used as a base class
        pl.Trainer = _NoopContext
        pl.seed_everything = _noop
        pl.__getattr__ = lambda attr: _NoopContext()
        sys.modules["pytorch_lightning"] = pl


def install_reference_package(constants: dict) -> None:
    """Install the ``stonkgs`` namespace + a constants stub, once.

    ``constants`` maps constant names (``NLP_MODEL_TYPE``,
    ``EMBEDDINGS_PATH``, ...) to values; any other name resolves to a path
    under ``constants['_fixture_root']`` so imports never fail.
    """
    _install_third_party_stubs()

    root = constants.get("_fixture_root", "/tmp/stonkgs_ref_fixtures")

    if "stonkgs" not in sys.modules:
        pkg = types.ModuleType("stonkgs")
        pkg.__path__ = [os.path.join(REF_SRC, "stonkgs")]
        pkg.__package__ = "stonkgs"
        sys.modules["stonkgs"] = pkg

        for sub in ("models", "data", "api"):
            sm = types.ModuleType(f"stonkgs.{sub}")
            sm.__path__ = [os.path.join(REF_SRC, "stonkgs", sub)]
            sm.__package__ = f"stonkgs.{sub}"
            sys.modules[f"stonkgs.{sub}"] = sm

    cmod = types.ModuleType("stonkgs.constants")
    for key, value in constants.items():
        setattr(cmod, key, value)
    cmod.__getattr__ = lambda name: os.path.join(root, name.lower())
    sys.modules["stonkgs.constants"] = cmod


def load_reference_module(name: str):
    """Import (or re-import) a reference module, e.g.
    ``stonkgs.models.stonkgs_model``."""
    assert "stonkgs.constants" in sys.modules, (
        "call install_reference_package() first"
    )
    if name in sys.modules:
        return sys.modules[name]
    return importlib.import_module(name)
