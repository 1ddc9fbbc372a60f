"""The verify-parity tool run against a synthetic checkpoint on disk."""

import json

import numpy as np
import pytest
import torch

from stonkgs_tpu.data.artifacts import KGArtifacts, save_kg_artifacts
from stonkgs_tpu.utils.parity import verify_parity

from torch_golden import GoldenSTonKGs

TINY = dict(
    vocab_size=128, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=64, type_vocab_size=2,
)
KG_VOCAB, RW_LEN, TEXT_LEN = 120, 15, 32


def test_verify_parity_passes_on_golden(tmp_path):
    golden = GoldenSTonKGs(TINY, KG_VOCAB, TEXT_LEN, num_labels=3)
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    torch.save(golden.reference_state_dict(), model_dir / "pytorch_model.bin")
    (model_dir / "config.json").write_text(json.dumps({**TINY, "num_labels": 3}))
    rng = np.random.default_rng(0)
    names = [f"node{i}" for i in range(KG_VOCAB)]
    art = KGArtifacts(
        names=names, name_to_idx={n: i for i, n in enumerate(names)},
        vectors=golden.kg_vectors,
        walk_indices=rng.integers(0, KG_VOCAB, (KG_VOCAB, RW_LEN), dtype=np.int32),
        rw_len=RW_LEN,
    )
    save_kg_artifacts(art, tmp_path / "emb.tsv", tmp_path / "walks.tsv")

    report = verify_parity(
        str(model_dir), str(tmp_path / "emb.tsv"), str(tmp_path / "walks.tsv"),
        n_rows=4,
    )
    # fp32 both sides; tolerance covers reduction-order noise
    assert report.max_dev < 5e-4, report.summary()
    assert report.max_dev_logits is not None
    assert "pooled" in report.summary()


def test_verify_parity_cli(tmp_path):
    from click.testing import CliRunner

    from stonkgs_tpu.cli import main

    golden = GoldenSTonKGs(TINY, KG_VOCAB, TEXT_LEN, num_labels=3)
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    torch.save(golden.reference_state_dict(), model_dir / "pytorch_model.bin")
    (model_dir / "config.json").write_text(json.dumps({**TINY, "num_labels": 3}))
    rng = np.random.default_rng(0)
    names = [f"node{i}" for i in range(KG_VOCAB)]
    art = KGArtifacts(
        names=names, name_to_idx={n: i for i, n in enumerate(names)},
        vectors=golden.kg_vectors,
        walk_indices=rng.integers(0, KG_VOCAB, (KG_VOCAB, RW_LEN), dtype=np.int32),
        rw_len=RW_LEN)
    save_kg_artifacts(art, tmp_path / "emb.tsv", tmp_path / "walks.tsv")
    result = CliRunner().invoke(main, [
        "verify-parity",
        "--model_path", str(model_dir),
        "--kg-embedding-path", str(tmp_path / "emb.tsv"),
        "--kg-walks-path", str(tmp_path / "walks.tsv"),
        "--n_rows", "2", "--tolerance", "1e-3",
    ])
    assert result.exit_code == 0, result.output
    assert "PASS" in result.output
