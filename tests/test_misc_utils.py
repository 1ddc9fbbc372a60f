"""Misc utilities: protein-sequence joiner, profiling, cache, version."""

import numpy as np
import pandas as pd
import pytest


def test_add_protein_sequences_with_resume(tmp_path):
    from stonkgs_tpu.data.protein_sequences import (
        add_protein_sequences_per_task, dict_lookup,
    )

    df = pd.DataFrame({
        "source_id": ["1", "2", "3", "4"],
        "target_id": ["2", "3", "9", "1"],
        "evidence": [f"e{i}" for i in range(4)],
    })
    inp = tmp_path / "in.tsv"
    out = tmp_path / "out.tsv"
    df.to_csv(inp, sep="\t", index=False)
    seqs = {"1": "MKT", "2": "AAG", "3": "PLV", "4": "QQW"}  # 9 missing
    n = add_protein_sequences_per_task(
        str(inp), str(out), lookup=dict_lookup(seqs), chunk_size=2)
    assert n == 3  # the row with entrez 9 dropped
    result = pd.read_csv(out, sep="\t")
    assert list(result["source_prot"]) == ["MKT", "AAG", "QQW"]

    # resume: rerun is a no-op (already complete)
    n2 = add_protein_sequences_per_task(
        str(inp), str(out), lookup=dict_lookup(seqs), chunk_size=2)
    assert n2 == 3


def test_step_timer():
    import jax.numpy as jnp

    from stonkgs_tpu.utils.profiling import StepTimer

    t = StepTimer(window=3)
    for _ in range(5):
        t.start()
        t.stop(jnp.ones(()))
    assert len(t._times) == 3
    assert t.mean > 0 and t.p50 > 0
    assert t.throughput(10) > 0


def test_cache_offline_error(tmp_path, monkeypatch):
    monkeypatch.setenv("STONKGS_TPU_CACHE", str(tmp_path))
    import importlib

    import stonkgs_tpu.utils.cache as cache

    importlib.reload(cache)
    # pre-populated file is returned without network
    target = cache.cache_path("http://x.invalid/files/thing.tsv")
    target.parent.mkdir(parents=True, exist_ok=True)
    target.write_text("data")
    assert cache.ensure("http://x.invalid/files/thing.tsv").read_text() == "data"
    # missing + unreachable -> informative error
    with pytest.raises(RuntimeError, match="place the file manually"):
        cache.ensure("http://x.invalid/files/missing.tsv")


def test_version():
    from stonkgs_tpu.version import get_version

    assert isinstance(get_version(), str)
    assert isinstance(get_version(with_git_hash=True), str)
