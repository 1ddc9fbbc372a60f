"""End-to-end API test: HF checkpoint on disk -> engine -> embeddings/logits.

Simulates the README flow (reference ``README.md`` embedding example and
``api/api.py`` infer path) without network: the torch golden model is saved
in HF checkpoint format, node2vec artifacts as TSVs, then loaded through
``STonKGsEngine.from_pretrained`` and compared against the golden forward.
"""

import json

import numpy as np
import pytest
import torch

from stonkgs_tpu.api.inference import STonKGsEngine
from stonkgs_tpu.data.artifacts import KGArtifacts, save_kg_artifacts

from torch_golden import GoldenSTonKGs

TINY = dict(
    vocab_size=128, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=64, type_vocab_size=2,
)
KG_VOCAB = 120
RW_LEN = 15          # half_length = 15*2+2 = 32
TEXT_LEN = 32

VOCAB = ["[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "alpha", "beta", "gamma", "activates", "inhibits"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    golden = GoldenSTonKGs(TINY, KG_VOCAB, TEXT_LEN, num_labels=3)

    # HF-format checkpoint directory
    model_dir = root / "model"
    model_dir.mkdir()
    torch.save(golden.reference_state_dict(), model_dir / "pytorch_model.bin")
    (model_dir / "config.json").write_text(json.dumps({**TINY, "num_labels": 3}))

    # node2vec artifacts (walks of length 15 over 120 entities)
    rng = np.random.default_rng(0)
    names = [f"node{i}" for i in range(KG_VOCAB)]
    artifacts = KGArtifacts(
        names=names,
        name_to_idx={n: i for i, n in enumerate(names)},
        vectors=golden.kg_vectors,
        walk_indices=rng.integers(0, KG_VOCAB, (KG_VOCAB, RW_LEN), dtype=np.int32),
        rw_len=RW_LEN,
    )
    save_kg_artifacts(artifacts, root / "embeddings.tsv", root / "walks.tsv")
    vocab_file = root / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")

    engine = STonKGsEngine.from_pretrained(
        str(model_dir), str(root / "embeddings.tsv"), str(root / "walks.tsv"),
        vocab_file=str(vocab_file),
        compute_dtype="float32", batch_size=4,
    )
    return golden, engine


def test_engine_config(setup):
    golden, engine = setup
    assert engine.cfg.kg_vocab_size == KG_VOCAB
    assert engine.cfg.text_len == TEXT_LEN
    assert engine.cfg.num_labels == 3


def test_embed_matches_golden(setup):
    golden, engine = setup
    n = 6  # not a multiple of batch_size=4: exercises padding
    src = np.array([f"node{i}" for i in range(n)], object)
    tgt = np.array([f"node{i + 10}" for i in range(n)], object)
    ev = ["alpha activates beta"] * 3 + ["gamma inhibits alpha"] * 3
    feats = engine.preprocess(src, tgt, ev, apply_masking=False)
    emb = engine.embed(feats)
    assert emb.shape == (n, TINY["hidden_size"])

    *_, g_pooled, _ = golden(
        feats["input_ids"], feats["attention_mask"], feats["token_type_ids"]
    )
    np.testing.assert_allclose(emb, g_pooled.numpy(), atol=5e-5, rtol=1e-3)


def test_logits_and_proba(setup):
    golden, engine = setup
    src = np.array(["node1", "node2"], object)
    tgt = np.array(["node3", "node4"], object)
    ev = ["alpha activates beta", "gamma"]
    feats = engine.preprocess(src, tgt, ev, apply_masking=False)
    logits = engine.logits(feats)
    *_, g_cls = golden(
        feats["input_ids"], feats["attention_mask"], feats["token_type_ids"]
    )
    np.testing.assert_allclose(logits, g_cls.numpy(), atol=5e-5, rtol=1e-3)
    proba = engine.predict_proba(feats)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-5)


def test_dataframe_api(setup, tmp_path):
    """README flow: preprocess_df_for_embeddings + get_stonkgs_embeddings."""
    import pandas as pd

    from stonkgs_tpu.api.embeddings import get_stonkgs_embeddings

    golden, engine = setup
    df = pd.DataFrame({
        "source": ["node0", "node5"],
        "target": ["node7", "node9"],
        "evidence": ["alpha activates beta", "beta inhibits gamma"],
    })
    feats = engine.preprocess(
        df["source"].to_numpy(object), df["target"].to_numpy(object),
        df["evidence"].tolist(), apply_masking=False,
    )
    pre_df = pd.DataFrame({k: list(v) for k, v in feats.items()})
    out = get_stonkgs_embeddings(pre_df, engine)
    assert list(out.columns) == ["embedding"]
    assert len(out) == 2
    assert len(out["embedding"][0]) == TINY["hidden_size"]


def test_embed_stream_matches_batch(setup):
    """Streaming extraction yields the same embeddings as one-shot embed."""
    golden, engine = setup
    n = 10
    rows = [(f"node{i}", f"node{(i + 2) % 20}", "alpha activates beta")
            for i in range(n)]
    chunks = list(engine.embed_stream(rows, chunk_rows=4, apply_masking=False))
    streamed = np.concatenate(chunks, axis=0)
    assert streamed.shape == (n, TINY["hidden_size"])

    src = np.array([r[0] for r in rows], object)
    tgt = np.array([r[1] for r in rows], object)
    feats = engine.preprocess(src, tgt, [r[2] for r in rows],
                              apply_masking=False)
    direct = engine.embed(feats)
    np.testing.assert_allclose(streamed, direct, atol=1e-5)


def test_unknown_node_unk_fallback(setup):
    golden, engine = setup
    src = np.array(["definitely-not-a-node"], object)
    tgt = np.array(["node1"], object)
    feats = engine.preprocess(src, tgt, ["alpha"], apply_masking=False)
    half = engine.cfg.text_len
    # source walk is all UNK ids (stonkgs_for_embeddings.py:117-128)
    assert (feats["input_ids"][0, half: half + RW_LEN] == engine.cfg.unk_id).all()
    emb = engine.embed(feats)
    assert np.isfinite(emb).all()
