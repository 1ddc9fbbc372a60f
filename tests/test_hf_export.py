"""HF checkpoint export round trip: params -> pytorch_model.bin -> params."""

import numpy as np
import pytest
import torch

import jax

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.utils.hf_export import save_pretrained, stonkgs_state_dict
from stonkgs_tpu.utils.hf_loader import (
    load_state_dict, stonkgs_params_from_state_dict,
)

TINY = BertConfig(
    vocab_size=128, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=64, max_position_embeddings=24,
)
CFG = STonKGsConfig(bert=TINY, kg_vocab_size=120, text_len=12, entity_len=12,
                    num_labels=4)


def _params():
    p = stonkgs.init_stonkgs_params(
        jax.random.PRNGKey(0), CFG, with_classifier=True)
    return p


def test_round_trip_equality(tmp_path):
    params = _params()
    out = save_pretrained(params, CFG, str(tmp_path / "ckpt"))
    sd = load_state_dict(out)
    reloaded = stonkgs_params_from_state_dict(sd, CFG)

    for path in (
        ("trunk", "embeddings", "word_embeddings"),
        ("trunk", "pooler", "kernel"),
        ("lm_backbone", "encoder", "attention", "query", "kernel"),
        ("cls", "predictions", "text_decoder", "kernel"),
        ("cls", "predictions", "entity_decoder", "kernel"),
        ("cls", "seq_relationship", "bias"),
        ("classifier", "kernel"),
    ):
        a, b = params, reloaded
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg="/".join(path))


def test_exported_checkpoint_drives_same_outputs(tmp_path, rng):
    """Engine loaded from the export produces identical logits."""
    from stonkgs_tpu.data.artifacts import make_random_artifacts, save_kg_artifacts
    from stonkgs_tpu.api.inference import STonKGsEngine

    params = _params()
    ckpt = save_pretrained(params, CFG, str(tmp_path / "ckpt"))
    art = make_random_artifacts(n_entities=120, dim=32, rw_len=5, seed=0)
    save_kg_artifacts(art, tmp_path / "emb.tsv", tmp_path / "walks.tsv")
    engine = STonKGsEngine.from_pretrained(
        ckpt, str(tmp_path / "emb.tsv"), str(tmp_path / "walks.tsv"),
        compute_dtype="float32", batch_size=4,
    )
    assert engine.cfg.kg_vocab_size == 120
    ids = np.concatenate([
        rng.integers(0, 128, (3, 12)), rng.integers(0, 120, (3, 12))], 1)
    feats = {
        "input_ids": ids,
        "attention_mask": np.ones((3, 24), np.int64),
        "token_type_ids": np.concatenate(
            [np.zeros((3, 12), np.int64), np.ones((3, 12), np.int64)], 1),
    }
    lg = engine.logits(feats)
    assert lg.shape == (3, 4)
    assert np.isfinite(lg).all()


def test_state_dict_loads_into_torch_bert(tmp_path):
    """The trunk subtree is a valid HF BertModel state dict."""
    import transformers

    params = _params()
    sd = stonkgs_state_dict(params, CFG)
    trunk_sd = {k[len("bert."):]: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items() if k.startswith("bert.")}
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=24)
    model = transformers.BertModel(hf_cfg)
    missing, unexpected = model.load_state_dict(trunk_sd, strict=False)
    assert not unexpected, unexpected
    assert not [m for m in missing if "position_ids" not in m], missing


def test_protstonkgs_export_roundtrip(tmp_path):
    """ProtSTonKGs export -> loader round trip preserves weights."""
    import jax

    from stonkgs_tpu.config import BigBirdConfig, ProtSTonKGsConfig
    from stonkgs_tpu.data.artifacts import KGArtifacts, save_kg_artifacts
    from stonkgs_tpu.models import protstonkgs
    from stonkgs_tpu.utils.hf_export import save_protstonkgs_pretrained
    from stonkgs_tpu.utils.hf_loader import load_protstonkgs_pretrained

    cfg = ProtSTonKGsConfig(
        trunk=BigBirdConfig(vocab_size=80, hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            max_position_embeddings=64, block_size=4,
                            num_random_blocks=1),
        lm=BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=16),
        prot=BertConfig(vocab_size=30, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=32,
                        max_position_embeddings=32),
        lm_vocab_size=128, kg_vocab_size=120, prot_vocab_size=30,
        kg_start_idx=12, prot_start_idx=16, seq_len=48,
        sep_id=102, mask_id=103, unk_id=100,
    )
    params = protstonkgs.init_protstonkgs_params(jax.random.PRNGKey(0), cfg)
    out = save_protstonkgs_pretrained(params, cfg, str(tmp_path / "ckpt"))

    rng = np.random.default_rng(0)
    names = [f"node{i}" for i in range(120)]
    art = KGArtifacts(names, {n: i for i, n in enumerate(names)},
                      rng.normal(size=(120, 32)).astype(np.float32),
                      rng.integers(0, 120, (120, 3), dtype=np.int32), 3)
    save_kg_artifacts(art, tmp_path / "e.tsv", tmp_path / "w.tsv")
    cfg2, params2 = load_protstonkgs_pretrained(
        out, str(tmp_path / "e.tsv"), str(tmp_path / "w.tsv"))
    assert cfg2.kg_vocab_size == 120 and cfg2.prot_vocab_size == 30
    np.testing.assert_allclose(
        np.asarray(params["prot_projection"]["kernel"]),
        np.asarray(params2["prot_projection"]["kernel"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["trunk"]["pooler"]["kernel"]),
        np.asarray(params2["trunk"]["pooler"]["kernel"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["cls"]["predictions"]["prot_decoder"]["kernel"]),
        np.asarray(params2["cls"]["predictions"]["prot_decoder"]["kernel"]),
        atol=1e-6)
