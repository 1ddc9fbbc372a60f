"""CLI drivers + packaged API tests (offline, synthetic artifacts)."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import torch

from stonkgs_tpu.data.artifacts import KGArtifacts, save_kg_artifacts

from torch_golden import GoldenSTonKGs

TINY = dict(
    vocab_size=128, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=64, type_vocab_size=2,
)
KG_VOCAB, RW_LEN, TEXT_LEN = 120, 15, 32
VOCAB = ["[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "alpha", "beta", "gamma", "activates", "inhibits"]


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Golden checkpoint + artifacts + vocab + task TSV on disk."""
    root = tmp_path_factory.mktemp("assets")
    golden = GoldenSTonKGs(TINY, KG_VOCAB, TEXT_LEN, num_labels=3)
    model_dir = root / "model"
    model_dir.mkdir()
    torch.save(golden.reference_state_dict(), model_dir / "pytorch_model.bin")
    (model_dir / "config.json").write_text(json.dumps({**TINY, "num_labels": 3}))
    rng = np.random.default_rng(0)
    names = [f"node{i}" for i in range(KG_VOCAB)]
    artifacts = KGArtifacts(
        names=names, name_to_idx={n: i for i, n in enumerate(names)},
        vectors=golden.kg_vectors,
        walk_indices=rng.integers(0, KG_VOCAB, (KG_VOCAB, RW_LEN), dtype=np.int32),
        rw_len=RW_LEN,
    )
    save_kg_artifacts(artifacts, root / "embeddings.tsv", root / "walks.tsv")
    (root / "vocab.txt").write_text("\n".join(VOCAB) + "\n")

    n = 20
    df = pd.DataFrame({
        "source": [f"node{i % KG_VOCAB}" for i in range(n)],
        "target": [f"node{(i + 3) % KG_VOCAB}" for i in range(n)],
        "evidence": ["alpha activates beta"] * (n // 2)
                    + ["gamma inhibits alpha"] * (n // 2),
        "class": ["x"] * (n // 2) + ["y"] * (n // 2),
    })
    df.to_csv(root / "task.tsv", sep="\t", index=False)
    return root


def test_cli_embed_command(assets, tmp_path):
    from click.testing import CliRunner

    from stonkgs_tpu.cli import main

    out = tmp_path / "emb.tsv"
    runner = CliRunner()
    result = runner.invoke(main, [
        "embed",
        "--input", str(assets / "task.tsv"),
        "--model_path", str(assets / "model"),
        "--kg-embedding-path", str(assets / "embeddings.tsv"),
        "--kg-walks-path", str(assets / "walks.tsv"),
        "--vocab-file", str(assets / "vocab.txt"),
        "--output", str(out),
        "--batch_size", "8",
        "--no-masking",
    ])
    assert result.exit_code == 0, result.output
    df = pd.read_csv(out, sep="\t")
    assert len(df) == 20


def test_cli_pretrain_driver(assets, tmp_path):
    """End-to-end pretraining from a preprocessed pickle with resume."""
    from stonkgs_tpu.cli.pretrain import load_preprocessed_dataset, run_pretraining
    from stonkgs_tpu.data.artifacts import load_kg_artifacts
    from stonkgs_tpu.data.preprocessing import preprocess_for_pretraining
    from stonkgs_tpu.data.wordpiece import BertTokenizer

    artifacts = load_kg_artifacts(assets / "embeddings.tsv", assets / "walks.tsv")
    tok = BertTokenizer(str(assets / "vocab.txt"))
    df = pd.read_csv(assets / "task.tsv", sep="\t")
    feats = preprocess_for_pretraining(
        df["source"].to_numpy(object), df["target"].to_numpy(object),
        df["evidence"].tolist(), artifacts, tok, seed=0)
    pkl = tmp_path / "pre.pkl"
    pd.DataFrame({k: list(v) for k, v in feats.items()}).to_pickle(pkl)

    loaded = load_preprocessed_dataset(str(pkl))
    assert loaded["input_ids"].shape[1] == 2 * (RW_LEN * 2 + 2)

    state = run_pretraining(
        str(pkl),
        kg_embedding_path=str(assets / "embeddings.tsv"),
        batch_size=4, max_steps=3, save_steps=2,
        output_dir=str(tmp_path / "run"), compute_dtype="float32",
    )
    assert int(state.step) == 3
    # resume: a new invocation starts from the saved checkpoint
    state2 = run_pretraining(
        str(pkl),
        kg_embedding_path=str(assets / "embeddings.tsv"),
        batch_size=4, max_steps=5, save_steps=2,
        output_dir=str(tmp_path / "run"), compute_dtype="float32",
    )
    assert int(state2.step) == 5


def test_api_infer_with_local_cache(assets, monkeypatch):
    """infer_species flow against the synthetic checkpoint, no network."""
    import stonkgs_tpu.api.api as api

    def fake_ensure(url, submodule="", force=False):
        name = url.rsplit("/", 1)[-1]
        mapping = {
            "random_walks_best_model.tsv": assets / "walks.tsv",
            "embeddings_best_model.tsv": assets / "embeddings.tsv",
            "vocab.txt": assets / "vocab.txt",
            "config.json": assets / "model" / "config.json",
            "pytorch_model.bin": assets / "model" / "pytorch_model.bin",
            "training_args.bin": assets / "model" / "config.json",  # dummy
        }
        return mapping[name]

    monkeypatch.setattr(api, "ensure", fake_ensure)
    api.get_species_model.cache_clear()
    rows = [
        ["node1", "node2", "alpha activates beta"],
        ["node3", "node4", "gamma inhibits alpha"],
    ]
    out = list(api.infer_species(rows))
    header, *data = out
    assert header == ("source", "target", "evidence",
                      "mouse", "rat", "human")
    assert len(data) == 2
    probs = np.asarray([row[3:] for row in data], np.float64)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)

    # DataFrame input + statement-like dict input paths
    df = pd.DataFrame(rows, columns=["source", "target", "evidence"])
    out_df = api.infer_concat(api.get_species_model(), df,
                              columns=api.SPECIES_COLUMNS, as_dataframe=True)
    assert list(out_df.columns)[:3] == ["source", "target", "evidence"]
    assert len(out_df) == 2


def test_pretrain_export_roundtrip(assets, tmp_path):
    """Pretraining export unpads sharded decoders back to true vocab sizes."""
    from stonkgs_tpu.cli.pretrain import run_pretraining
    from stonkgs_tpu.data.artifacts import load_kg_artifacts
    from stonkgs_tpu.data.preprocessing import preprocess_for_pretraining
    from stonkgs_tpu.data.wordpiece import BertTokenizer
    from stonkgs_tpu.utils.hf_loader import infer_kg_vocab_size, load_state_dict

    artifacts = load_kg_artifacts(assets / "embeddings.tsv", assets / "walks.tsv")
    tok = BertTokenizer(str(assets / "vocab.txt"))
    df = pd.read_csv(assets / "task.tsv", sep="\t")
    feats = preprocess_for_pretraining(
        df["source"].to_numpy(object), df["target"].to_numpy(object),
        df["evidence"].tolist(), artifacts, tok, seed=0)
    pkl = tmp_path / "pre.pkl"
    pd.DataFrame({k: list(v) for k, v in feats.items()}).to_pickle(pkl)

    export_dir = tmp_path / "export"
    run_pretraining(
        str(pkl), kg_embedding_path=str(assets / "embeddings.tsv"),
        batch_size=4, max_steps=2, save_steps=100,
        output_dir=str(tmp_path / "run"), compute_dtype="float32",
        n_model_shards=2, export_hf_dir=str(export_dir),
    )
    sd = load_state_dict(str(export_dir))
    # sharding pads kg vocab to a multiple of 2; export slices it back
    assert infer_kg_vocab_size(sd) == KG_VOCAB
    # without --vocab-file the driver defaults to the BioBERT vocab
    assert sd["cls.predictions.text_decoder.weight"].shape[0] == 28996


def test_transe_engine_variant(assets, tmp_path):
    """TransE engine: 256+4 layout, relation-aware preprocessing."""
    import json as _json

    import torch as _torch

    from stonkgs_tpu.api.inference import STonKGsEngine

    from torch_golden import GoldenSTonKGs

    # TransE checkpoint: max_position_embeddings 36 -> text 32 + 4 slots
    cfg36 = {**TINY, "max_position_embeddings": 36}
    golden = GoldenSTonKGs(cfg36, KG_VOCAB, 32, num_labels=2)
    mdir = tmp_path / "transe_model"
    mdir.mkdir()
    _torch.save(golden.reference_state_dict(), mdir / "pytorch_model.bin")
    (mdir / "config.json").write_text(_json.dumps({**cfg36, "num_labels": 2}))
    # TransE embeddings: nodes + relations in one table
    names = [f"node{i}" for i in range(110)] + [f"rel{i}" for i in range(10)]
    rng = np.random.default_rng(1)
    with open(tmp_path / "transe.tsv", "w") as f:
        for name, vec in zip(names, golden.kg_vectors):
            f.write(name + "\t" + "\t".join(str(float(v)) for v in vec) + "\n")

    engine = STonKGsEngine.from_pretrained(
        str(mdir), str(tmp_path / "transe.tsv"),
        vocab_file=str(assets / "vocab.txt"),
        variant="transe", compute_dtype="float32", batch_size=4,
    )
    assert engine.cfg.text_len == 32 and engine.cfg.entity_len == 4
    feats = engine.preprocess(
        ["node1", "node2"], ["node3", "node4"],
        ["alpha activates beta", "gamma"],
        relations=["rel1", "rel2"],
    )
    assert feats["input_ids"].shape == (2, 36)
    emb = engine.embed(feats)
    assert emb.shape == (2, TINY["hidden_size"])
    assert np.isfinite(emb).all()
