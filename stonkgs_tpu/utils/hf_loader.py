"""HuggingFace/PyTorch checkpoint ingestion.

Converts reference checkpoints — ``stonkgs/stonkgs-150k``, ``-300k``, the
Zenodo fine-tuned models (HF format: ``config.json`` + ``pytorch_model.bin``
/ ``model.safetensors``) — into this framework's parameter pytrees.

The reference stores the model as ``BertForPreTraining`` with extra modules
(``lm_backbone.*``, ``cls.predictions.{text,entity}_decoder`` etc.,
``/root/reference/src/stonkgs/models/stonkgs_model.py:99-141``).  The KG
backbone is a plain Python dict attribute, NOT part of the state dict — it
is rebuilt from the node2vec TSV at load time, exactly like the reference
(``api/api.py:107-110`` passes ``kg_embedding_dict_path``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Mapping, Optional

import numpy as np

from stonkgs_tpu.config import BertConfig, STonKGsConfig


def _np(x) -> np.ndarray:
    """torch.Tensor | np.ndarray -> fp32/int numpy array."""
    if isinstance(x, np.ndarray):
        arr = x
    else:  # torch tensor without importing torch at module scope
        arr = x.detach().cpu().float().numpy() if hasattr(x, "detach") else np.asarray(x)
    if arr.dtype in (np.float16,):
        arr = arr.astype(np.float32)
    return arr


def load_state_dict(model_dir_or_file: str) -> Dict[str, np.ndarray]:
    """Load an HF checkpoint state dict as numpy arrays.

    Accepts a directory containing ``pytorch_model.bin`` or
    ``model.safetensors``, or a direct file path.
    """
    path = model_dir_or_file
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no checkpoint file in {model_dir_or_file}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return {k: _np(v) for k, v in load_file(path).items()}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


def load_config(model_dir: str) -> dict:
    """Read an HF config.json into a STonKGsConfig."""
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# converters: torch state dict -> param pytree (numpy; jnp-ready)
# ---------------------------------------------------------------------------

def _dense(sd: Mapping, key: str) -> dict:
    p = {"kernel": _np(sd[key + ".weight"]).T}
    if key + ".bias" in sd:
        p["bias"] = _np(sd[key + ".bias"])
    return p


def _ln(sd: Mapping, key: str) -> dict:
    return {"scale": _np(sd[key + ".weight"]), "bias": _np(sd[key + ".bias"])}


def bert_params_from_state_dict(
    sd: Mapping, cfg: BertConfig, prefix: str = ""
) -> dict:
    """Convert an HF BertModel state dict subtree to a stacked param tree."""
    g = lambda k: prefix + k  # noqa: E731
    params = {
        "embeddings": {
            "word_embeddings": _np(sd[g("embeddings.word_embeddings.weight")]),
            "position_embeddings": _np(sd[g("embeddings.position_embeddings.weight")]),
            "token_type_embeddings": _np(sd[g("embeddings.token_type_embeddings.weight")]),
            "layer_norm": _ln(sd, g("embeddings.LayerNorm")),
        }
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = g(f"encoder.layer.{i}.")
        layers.append({
            "attention": {
                "query": _dense(sd, lp + "attention.self.query"),
                "key": _dense(sd, lp + "attention.self.key"),
                "value": _dense(sd, lp + "attention.self.value"),
                "output": _dense(sd, lp + "attention.output.dense"),
                "output_layer_norm": _ln(sd, lp + "attention.output.LayerNorm"),
            },
            "intermediate": _dense(sd, lp + "intermediate.dense"),
            "output": _dense(sd, lp + "output.dense"),
            "output_layer_norm": _ln(sd, lp + "output.LayerNorm"),
        })
    import jax
    params["encoder"] = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layers)
    if g("pooler.dense.weight") in sd:
        params["pooler"] = _dense(sd, g("pooler.dense"))
    return params


def elm_head_params_from_state_dict(
    sd: Mapping, prefix: str = "cls.predictions.",
    segment_names=("text", "entity"),
) -> dict:
    """ELM-head params (transform + decoders + unused biases) from torch keys."""
    g = lambda k: prefix + k  # noqa: E731
    p = {
        "transform": {
            "dense": _dense(sd, g("transform.dense")),
            "layer_norm": _ln(sd, g("transform.LayerNorm")),
        }
    }
    for name in segment_names:
        p[f"{name}_decoder"] = {"kernel": _np(sd[g(f"{name}_decoder.weight")]).T}
        bias_key = g(f"{name}_bias")
        p[f"{name}_bias"] = (
            _np(sd[bias_key]) if bias_key in sd
            else np.zeros(p[f"{name}_decoder"]["kernel"].shape[1], np.float32)
        )
    return p


def stonkgs_params_from_state_dict(
    sd: Mapping,
    cfg: STonKGsConfig,
    *,
    kg_table: Optional[np.ndarray] = None,
) -> dict:
    """Full STonKGs(ForPreTraining|ForSequenceClassification) conversion.

    Reference state-dict layout: trainable trunk under ``bert.``, frozen
    BioBERT under ``lm_backbone.``, heads under ``cls.``; classifier weights
    present only for fine-tuned checkpoints."""
    params = {
        "trunk": bert_params_from_state_dict(sd, cfg.bert, "bert."),
        "lm_backbone": bert_params_from_state_dict(sd, cfg.bert, "lm_backbone."),
        "cls": {
            "predictions": elm_head_params_from_state_dict(sd),
            "seq_relationship": _dense(sd, "cls.seq_relationship"),
        },
    }
    if kg_table is not None:
        params["kg_backbone"] = kg_table
    if "classifier.weight" in sd:
        params["classifier"] = _dense(sd, "classifier")
    return params


def protstonkgs_params_from_state_dict(
    sd: Mapping,
    cfg,  # ProtSTonKGsConfig
    *,
    kg_table: Optional[np.ndarray] = None,
) -> dict:
    """Full ProtSTonKGs conversion (reference layout: BigBird trunk under
    ``bert.``, frozen BioBERT under ``lm_backbone.``, frozen ProtBERT under
    ``prot_backbone.``, projection ``prot_to_lm_hidden_linear``, PELM head
    under ``cls.predictions``)."""
    from stonkgs_tpu.models.bigbird import bigbird_params_from_state_dict

    params = {
        "trunk": bigbird_params_from_state_dict(sd, cfg.trunk, "bert."),
        "lm_backbone": bert_params_from_state_dict(sd, cfg.lm, "lm_backbone."),
        "prot_backbone": bert_params_from_state_dict(sd, cfg.prot, "prot_backbone."),
        "prot_projection": _dense(sd, "prot_to_lm_hidden_linear"),
        "cls": {
            "predictions": elm_head_params_from_state_dict(
                sd, segment_names=("text", "entity", "prot")),
        },
    }
    if kg_table is not None:
        params["kg_backbone"] = kg_table
    if "classifier.weight" in sd:
        params["classifier"] = _dense(sd, "classifier")
    return params


def load_protstonkgs_pretrained(
    model_dir: str,
    kg_embedding_path: str,
    kg_random_walk_path: str,
    *,
    sep_id: int = 66,    # BigBird tokenizer special ids
    mask_id: int = 67,
    unk_id: int = 100,
):
    """Load a ProtSTonKGs HF checkpoint (e.g. ``stonkgs/protstonkgs``) +
    node2vec artifacts -> (cfg, params) ready for the model functions.

    Reference: ``ProtSTonKGsForPreTraining.from_default_pretrained``
    (``protstonkgs_model.py:214-218``)."""
    from stonkgs_tpu.config import BertConfig, BigBirdConfig, ProtSTonKGsConfig
    from stonkgs_tpu.data.artifacts import load_kg_artifacts
    from stonkgs_tpu.models import protstonkgs

    sd = load_state_dict(model_dir)
    hf_cfg = load_config(model_dir)
    trunk = BigBirdConfig.from_hf_dict(hf_cfg)
    kg_vocab = int(np.asarray(
        sd["cls.predictions.entity_decoder.weight"]).shape[0])
    prot_vocab = int(np.asarray(
        sd["cls.predictions.prot_decoder.weight"]).shape[0])
    lm_vocab = int(np.asarray(
        sd["cls.predictions.text_decoder.weight"]).shape[0])
    prot_hidden = int(np.asarray(
        sd["prot_to_lm_hidden_linear.weight"]).shape[1])
    n_prot_layers = max(
        int(k.split(".")[3]) + 1 for k in sd
        if k.startswith("prot_backbone.encoder.layer."))
    prot_cfg = BertConfig(
        vocab_size=prot_vocab, hidden_size=prot_hidden,
        num_hidden_layers=n_prot_layers,
        num_attention_heads=max(prot_hidden // 64, 1),
        intermediate_size=int(np.asarray(
            sd["prot_backbone.encoder.layer.0.intermediate.dense.weight"]
        ).shape[0]),
        max_position_embeddings=int(np.asarray(
            sd["prot_backbone.embeddings.position_embeddings.weight"]).shape[0]),
    )
    lm_hidden = int(np.asarray(
        sd["lm_backbone.embeddings.word_embeddings.weight"]).shape[1])
    n_lm_layers = max(
        int(k.split(".")[3]) + 1 for k in sd
        if k.startswith("lm_backbone.encoder.layer."))
    lm_cfg = BertConfig(
        vocab_size=lm_vocab,
        hidden_size=lm_hidden,
        num_hidden_layers=n_lm_layers,
        num_attention_heads=max(lm_hidden // 64, 1),
        intermediate_size=int(np.asarray(
            sd["lm_backbone.encoder.layer.0.intermediate.dense.weight"]
        ).shape[0]),
        max_position_embeddings=int(np.asarray(
            sd["lm_backbone.embeddings.position_embeddings.weight"]).shape[0]),
    )
    cfg = ProtSTonKGsConfig(
        trunk=trunk, lm=lm_cfg, prot=prot_cfg,
        lm_vocab_size=lm_vocab, kg_vocab_size=kg_vocab,
        prot_vocab_size=prot_vocab,
        sep_id=sep_id, mask_id=mask_id, unk_id=unk_id,
        num_labels=hf_cfg.get("num_labels"),
    )
    params = protstonkgs_params_from_state_dict(sd, cfg)
    artifacts = load_kg_artifacts(kg_embedding_path, kg_random_walk_path)
    params["kg_backbone"] = protstonkgs.build_kg_table(
        params["lm_backbone"], cfg, artifacts.vectors)
    return cfg, params


def infer_kg_vocab_size(sd: Mapping) -> int:
    """kg_vocab_size from the entity decoder shape (rows = kg vocab)."""
    return int(np.asarray(sd["cls.predictions.entity_decoder.weight"]).shape[0])
