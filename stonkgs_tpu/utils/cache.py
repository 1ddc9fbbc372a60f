"""pystow-style artifact cache.

The reference uses ``pystow.module("stonkgs").ensure(url=...)`` for all
Zenodo/HF artifact downloads (``api/api.py:27,86-101``); this is the same
contract without the dependency: files land under
``$STONKGS_TPU_HOME/cache/<submodule>/<filename>`` and are only fetched
when missing.  Pre-populated caches work fully offline.
"""

from __future__ import annotations

import logging
import os
import urllib.request
from pathlib import Path

from stonkgs_tpu.constants import HOME

logger = logging.getLogger(__name__)

CACHE_DIR = Path(os.getenv("STONKGS_TPU_CACHE", HOME / "cache"))


def cache_path(url: str, submodule: str = "") -> Path:
    """Path under the pystow-style cache root, creating parents."""
    name = url.rsplit("/", 1)[-1]
    return CACHE_DIR / submodule / name if submodule else CACHE_DIR / name


def ensure(url: str, submodule: str = "", force: bool = False) -> Path:
    """Return the local path of ``url``, downloading it if needed."""
    path = cache_path(url, submodule)
    if path.exists() and not force:
        return path
    path.parent.mkdir(parents=True, exist_ok=True)
    logger.info("downloading %s -> %s", url, path)
    tmp = path.with_suffix(path.suffix + ".part")
    try:
        urllib.request.urlretrieve(url, tmp)  # noqa: S310
    except Exception as e:  # no network / bad URL
        if tmp.exists():
            tmp.unlink()
        raise RuntimeError(
            f"could not download {url}; place the file manually at {path} "
            f"(offline environments)") from e
    tmp.rename(path)
    return path
