"""ProtSTonKGs parity vs the torch golden fixture (tri-modality BigBird)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, BigBirdConfig, ProtSTonKGsConfig
from stonkgs_tpu.models import protstonkgs
from stonkgs_tpu.ops.losses import IGNORE_INDEX
from stonkgs_tpu.utils.hf_loader import protstonkgs_params_from_state_dict

from torch_golden import GoldenProtSTonKGs

TRUNK = dict(
    vocab_size=80, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=128, type_vocab_size=2,
    block_size=8, num_random_blocks=2, attention_type="block_sparse",
    use_bias=True,
)
LM = dict(
    vocab_size=99, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=32, type_vocab_size=2,
)
PROT = dict(
    vocab_size=30, hidden_size=48, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=96,
    max_position_embeddings=96, type_vocab_size=2,
)
KG_VOCAB = 20
KG_START, PROT_START, SEQ = 24, 32, 96   # text 24 (3x8) | kg 8 | prot 64
SPECIAL = (4, 5, 2)  # sep, mask, unk (within lm vocab)


@pytest.fixture(scope="module")
def golden():
    return GoldenProtSTonKGs(
        TRUNK, LM, PROT, KG_VOCAB, KG_START, PROT_START,
        special_ids=SPECIAL, num_labels=3,
    )


@pytest.fixture(scope="module")
def jax_model(golden):
    cfg = ProtSTonKGsConfig(
        trunk=BigBirdConfig(**TRUNK), lm=BertConfig(**LM),
        prot=BertConfig(**PROT),
        lm_vocab_size=LM["vocab_size"], kg_vocab_size=KG_VOCAB,
        prot_vocab_size=PROT["vocab_size"],
        kg_start_idx=KG_START, prot_start_idx=PROT_START, seq_len=SEQ,
        sep_id=SPECIAL[0], mask_id=SPECIAL[1], unk_id=SPECIAL[2],
        num_labels=3,
    )
    params = protstonkgs_params_from_state_dict(
        golden.reference_state_dict(), cfg)
    params["kg_backbone"] = protstonkgs.build_kg_table(
        params["lm_backbone"], cfg, golden.kg_vectors, precision="highest")
    return cfg, params


def _batch(rng, B=2):
    text = rng.integers(0, LM["vocab_size"], (B, KG_START))
    ent = rng.integers(0, KG_VOCAB, (B, PROT_START - KG_START))
    prot = rng.integers(0, PROT["vocab_size"], (B, SEQ - PROT_START))
    ids = np.concatenate([text, ent, prot], 1)
    mask = np.ones((B, SEQ), np.int64)
    mask[1, 90:] = 0
    return ids, mask


def test_kg_table(golden, jax_model):
    _, params = jax_model
    np.testing.assert_allclose(
        np.asarray(params["kg_backbone"]), golden.kg_table.numpy(), atol=2e-5)


def test_pretraining_logits_parity(golden, jax_model, rng):
    cfg, params = jax_model
    ids, mask = _batch(rng)
    g_mlm, g_elm, g_prot, g_pooled, _ = golden(ids, mask)
    mlm, elm, prot, pooled = protstonkgs.pretraining_logits(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), precision="highest")
    np.testing.assert_allclose(np.asarray(pooled), g_pooled.numpy(),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mlm), g_mlm.numpy(),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(elm), g_elm.numpy(),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(prot), g_prot.numpy(),
                               atol=5e-5, rtol=1e-3)


def test_classification_parity(golden, jax_model, rng):
    cfg, params = jax_model
    ids, mask = _batch(rng)
    *_, g_cls = golden(ids, mask)
    logits = protstonkgs.classification_logits(
        params, cfg,
        {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)},
        precision="highest")
    np.testing.assert_allclose(np.asarray(logits), g_cls.numpy(),
                               atol=5e-5, rtol=1e-3)


def test_loss_paths_agree(golden, jax_model, rng):
    cfg, params = jax_model
    B = 2
    ids, mask = _batch(rng, B)
    mlm_l = np.full((B, KG_START), IGNORE_INDEX, np.int64)
    elm_l = np.full((B, PROT_START - KG_START), IGNORE_INDEX, np.int64)
    prot_l = np.full((B, SEQ - PROT_START), IGNORE_INDEX, np.int64)
    mlm_l[:, 1:3] = rng.integers(0, LM["vocab_size"], (B, 2))
    elm_l[:, 0] = rng.integers(0, KG_VOCAB, B)
    prot_l[:, 5:9] = rng.integers(0, PROT["vocab_size"], (B, 4))
    batch = {
        "input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask),
        "masked_lm_labels": jnp.asarray(mlm_l),
        "ent_masked_lm_labels": jnp.asarray(elm_l),
        "prot_masked_lm_labels": jnp.asarray(prot_l),
    }
    dense_loss, dm = protstonkgs.pretraining_loss(
        params, cfg, batch, dense_heads=True, precision="highest")
    gather_loss, _ = protstonkgs.pretraining_loss(
        params, cfg, batch, precision="highest")
    assert abs(float(dense_loss) - float(gather_loss)) < 1e-5

    # cross-check dense loss against torch CE on golden logits
    g_mlm, g_elm, g_prot, *_ = golden(ids, mask)
    ce = torch.nn.CrossEntropyLoss()
    torch_loss = (
        ce(g_mlm.reshape(-1, LM["vocab_size"]), torch.tensor(mlm_l).reshape(-1))
        + ce(g_elm.reshape(-1, KG_VOCAB), torch.tensor(elm_l).reshape(-1))
        + ce(g_prot.reshape(-1, PROT["vocab_size"]), torch.tensor(prot_l).reshape(-1))
    ).item()
    assert abs(float(dense_loss) - torch_loss) < 1e-4


def test_load_protstonkgs_pretrained(golden, tmp_path):
    """HF-format ProtSTonKGs checkpoint loads to config + params."""
    import json

    import torch

    from stonkgs_tpu.data.artifacts import KGArtifacts, save_kg_artifacts
    from stonkgs_tpu.utils.hf_loader import load_protstonkgs_pretrained

    mdir = tmp_path / "model"
    mdir.mkdir()
    torch.save(golden.reference_state_dict(), mdir / "pytorch_model.bin")
    (mdir / "config.json").write_text(json.dumps({
        **TRUNK, "num_labels": 3}))
    rng = np.random.default_rng(0)
    names = [f"node{i}" for i in range(KG_VOCAB)]
    art = KGArtifacts(
        names=names, name_to_idx={n: i for i, n in enumerate(names)},
        vectors=golden.kg_vectors,
        walk_indices=rng.integers(0, KG_VOCAB, (KG_VOCAB, 3), dtype=np.int32),
        rw_len=3)
    save_kg_artifacts(art, tmp_path / "e.tsv", tmp_path / "w.tsv")
    cfg, params = load_protstonkgs_pretrained(
        str(mdir), str(tmp_path / "e.tsv"), str(tmp_path / "w.tsv"),
        sep_id=SPECIAL[0], mask_id=SPECIAL[1], unk_id=SPECIAL[2])
    assert cfg.kg_vocab_size == KG_VOCAB
    assert cfg.prot_vocab_size == PROT["vocab_size"]
    assert cfg.prot.hidden_size == PROT["hidden_size"]
    assert cfg.prot.num_hidden_layers == PROT["num_hidden_layers"]
    assert params["kg_backbone"].shape == (KG_VOCAB + 3, TRUNK["hidden_size"])


def test_prot_engine_end_to_end(golden, tmp_path):
    """ProtSTonKGsEngine: checkpoint + artifacts + tokenizers -> embeddings."""
    import json

    import torch

    from stonkgs_tpu.api.prot_inference import ProtSTonKGsEngine
    from stonkgs_tpu.data.artifacts import KGArtifacts, save_kg_artifacts

    mdir = tmp_path / "model"
    mdir.mkdir()
    torch.save(golden.reference_state_dict(), mdir / "pytorch_model.bin")
    (mdir / "config.json").write_text(json.dumps({**TRUNK, "num_labels": 3}))
    rng = np.random.default_rng(0)
    names = [f"node{i}" for i in range(KG_VOCAB)]
    art = KGArtifacts(
        names=names, name_to_idx={n: i for i, n in enumerate(names)},
        vectors=golden.kg_vectors,
        # rw_len chosen so 2*rw+2 == entity_len (8)
        walk_indices=rng.integers(0, KG_VOCAB, (KG_VOCAB, 3), dtype=np.int32),
        rw_len=3)
    save_kg_artifacts(art, tmp_path / "e.tsv", tmp_path / "w.tsv")
    lm_vocab = tmp_path / "lm.txt"
    lm_vocab.write_text("\n".join(
        ["[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "alpha", "beta", "binds"]) + "\n")
    prot_vocab = tmp_path / "prot.txt"
    prot_vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "A", "C", "G"]) + "\n")

    engine = ProtSTonKGsEngine.from_pretrained(
        str(mdir), str(tmp_path / "e.tsv"), str(tmp_path / "w.tsv"),
        lm_vocab_file=str(lm_vocab), prot_vocab_file=str(prot_vocab),
        sep_id=SPECIAL[0], mask_id=SPECIAL[1], unk_id=SPECIAL[2],
        compute_dtype="float32", batch_size=2,
    )
    # text 24 | kg 8 | prot 64 layout comes from the loader defaults;
    # override to the golden's layout
    import dataclasses as dc
    engine = dc.replace(
        engine, cfg=engine.cfg.replace(
            kg_start_idx=KG_START, prot_start_idx=PROT_START, seq_len=SEQ))

    rows = {
        "source": ["node1", "node2", "node3"],
        "target": ["node4", "node5", "node6"],
        "evidence": ["alpha binds beta"] * 3,
        "source_description": ["alpha"] * 3,
        "target_description": ["beta"] * 3,
        "source_prot": ["A C G"] * 3,
        "target_prot": ["G C A"] * 3,
    }
    feats = engine.preprocess(rows)
    assert feats["input_ids"].shape == (3, SEQ)
    emb = engine.embed(feats)
    assert emb.shape == (3, TRUNK["hidden_size"])
    assert np.isfinite(emb).all()
    lg = engine.logits(feats)
    assert lg.shape == (3, 3)
