"""Export parameter pytrees back to HF/PyTorch checkpoint format.

Inverse of ``utils.hf_loader``: produces a ``pytorch_model.bin`` +
``config.json`` directory that the reference implementation (and any HF
``from_pretrained``) can consume — models trained here remain
interoperable with the upstream ecosystem.
"""

from __future__ import annotations

import json
import os
from typing import Mapping

import numpy as np

from stonkgs_tpu.config import STonKGsConfig


def _t(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _dense(sd: dict, key: str, p: Mapping) -> None:
    sd[key + ".weight"] = _t(p["kernel"]).T
    if "bias" in p:
        sd[key + ".bias"] = _t(p["bias"])


def _ln(sd: dict, key: str, p: Mapping) -> None:
    sd[key + ".weight"] = _t(p["scale"])
    sd[key + ".bias"] = _t(p["bias"])


def bert_state_dict(params: Mapping, prefix: str = "") -> dict:
    """Stacked BERT param tree -> HF BertModel state dict (numpy)."""
    sd: dict = {}
    emb = params["embeddings"]
    sd[prefix + "embeddings.word_embeddings.weight"] = _t(emb["word_embeddings"])
    sd[prefix + "embeddings.position_embeddings.weight"] = _t(emb["position_embeddings"])
    sd[prefix + "embeddings.token_type_embeddings.weight"] = _t(emb["token_type_embeddings"])
    _ln(sd, prefix + "embeddings.LayerNorm", emb["layer_norm"])

    enc = params["encoder"]
    n_layers = np.asarray(
        enc["attention"]["query"]["kernel"]).shape[0]
    for i in range(n_layers):
        layer = {k: _index_layer(v, i) for k, v in enc.items()}
        pre = prefix + f"encoder.layer.{i}."
        _dense(sd, pre + "attention.self.query", layer["attention"]["query"])
        _dense(sd, pre + "attention.self.key", layer["attention"]["key"])
        _dense(sd, pre + "attention.self.value", layer["attention"]["value"])
        _dense(sd, pre + "attention.output.dense", layer["attention"]["output"])
        _ln(sd, pre + "attention.output.LayerNorm",
            layer["attention"]["output_layer_norm"])
        _dense(sd, pre + "intermediate.dense", layer["intermediate"])
        _dense(sd, pre + "output.dense", layer["output"])
        _ln(sd, pre + "output.LayerNorm", layer["output_layer_norm"])
    if "pooler" in params:
        _dense(sd, prefix + "pooler.dense", params["pooler"])
    return sd


def _index_layer(tree, i):
    import jax

    return jax.tree.map(lambda x: np.asarray(x)[i], tree)


def stonkgs_state_dict(params: Mapping, cfg: STonKGsConfig) -> dict:
    """Full STonKGs params -> reference-layout state dict.

    Includes the HF parent-class head parameters (tied ``decoder`` +
    ``bias``) expected by ``BertForPreTraining``-derived classes."""
    sd = {}
    sd.update(bert_state_dict(params["trunk"], "bert."))
    sd.update(bert_state_dict(params["lm_backbone"], "lm_backbone."))
    p = params["cls"]["predictions"]
    _dense(sd, "cls.predictions.transform.dense", p["transform"]["dense"])
    _ln(sd, "cls.predictions.transform.LayerNorm", p["transform"]["layer_norm"])
    vocab_sizes = {"text": cfg.bert.vocab_size, "entity": cfg.kg_vocab_size}
    for name in ("text", "entity"):
        if f"{name}_decoder" in p:
            # slice away any model-axis sharding padding (mesh.pad_params_for_mesh)
            v = vocab_sizes[name]
            sd[f"cls.predictions.{name}_decoder.weight"] = _t(
                p[f"{name}_decoder"]["kernel"])[:, :v].T
            sd[f"cls.predictions.{name}_bias"] = _t(p[f"{name}_bias"])[:v]
    # parent BertLMPredictionHead params (unused by forward; tied to word emb)
    sd["cls.predictions.decoder.weight"] = sd["bert.embeddings.word_embeddings.weight"]
    sd["cls.predictions.decoder.bias"] = np.zeros(cfg.bert.vocab_size, np.float32)
    sd["cls.predictions.bias"] = np.zeros(cfg.bert.vocab_size, np.float32)
    _dense(sd, "cls.seq_relationship", params["cls"]["seq_relationship"])
    if "classifier" in params:
        _dense(sd, "classifier", params["classifier"])
    return sd


def bigbird_state_dict(params: Mapping, prefix: str = "") -> dict:
    """Stacked BigBird param tree -> HF BigBirdModel state dict.

    Same layer layout as BERT; the pooler is a bare linear
    (``pooler.weight``, no ``.dense``)."""
    sd = bert_state_dict(params, prefix)
    if prefix + "pooler.dense.weight" in sd:
        sd[prefix + "pooler.weight"] = sd.pop(prefix + "pooler.dense.weight")
        sd[prefix + "pooler.bias"] = sd.pop(prefix + "pooler.dense.bias")
    return sd


def protstonkgs_state_dict(params: Mapping, cfg) -> dict:
    """Full ProtSTonKGs params -> reference-layout state dict."""
    sd = {}
    sd.update(bigbird_state_dict(params["trunk"], "bert."))
    sd.update(bert_state_dict(params["lm_backbone"], "lm_backbone."))
    sd.update(bert_state_dict(params["prot_backbone"], "prot_backbone."))
    _dense(sd, "prot_to_lm_hidden_linear", params["prot_projection"])
    p = params["cls"]["predictions"]
    _dense(sd, "cls.predictions.transform.dense", p["transform"]["dense"])
    _ln(sd, "cls.predictions.transform.LayerNorm", p["transform"]["layer_norm"])
    vocab_sizes = {"text": cfg.lm_vocab_size, "entity": cfg.kg_vocab_size,
                   "prot": cfg.prot_vocab_size}
    for name, v in vocab_sizes.items():
        sd[f"cls.predictions.{name}_decoder.weight"] = _t(
            p[f"{name}_decoder"]["kernel"])[:, :v].T
        sd[f"cls.predictions.{name}_bias"] = _t(p[f"{name}_bias"])[:v]
    if "classifier" in params:
        _dense(sd, "classifier", params["classifier"])
    return sd


def save_protstonkgs_pretrained(
    params: Mapping, cfg, output_dir: str
) -> str:
    """Write a ProtSTonKGs HF checkpoint directory."""
    import dataclasses as _dc
    import torch

    os.makedirs(output_dir, exist_ok=True)
    sd = protstonkgs_state_dict(params, cfg)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()},
               os.path.join(output_dir, "pytorch_model.bin"))
    config = {**_dc.asdict(cfg.trunk),
              "architectures": ["ProtSTonKGsForPreTraining"],
              "model_type": "big_bird",
              "lm_vocab_size": cfg.lm_vocab_size,
              "kg_vocab_size": cfg.kg_vocab_size,
              "prot_vocab_size": cfg.prot_vocab_size}
    if cfg.num_labels is not None:
        config["num_labels"] = cfg.num_labels
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return output_dir


def save_pretrained(
    params: Mapping,
    cfg: STonKGsConfig,
    output_dir: str,
    *,
    extra_config: Mapping = (),
) -> str:
    """Write pytorch_model.bin + config.json (HF checkpoint directory)."""
    import torch

    os.makedirs(output_dir, exist_ok=True)
    sd = stonkgs_state_dict(params, cfg)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()},
               os.path.join(output_dir, "pytorch_model.bin"))
    config = {
        "architectures": ["STonKGsForPreTraining"],
        "model_type": "bert",
        "vocab_size": cfg.bert.vocab_size,
        "hidden_size": cfg.bert.hidden_size,
        "num_hidden_layers": cfg.bert.num_hidden_layers,
        "num_attention_heads": cfg.bert.num_attention_heads,
        "intermediate_size": cfg.bert.intermediate_size,
        "hidden_act": cfg.bert.hidden_act,
        "hidden_dropout_prob": cfg.bert.hidden_dropout_prob,
        "attention_probs_dropout_prob": cfg.bert.attention_probs_dropout_prob,
        "max_position_embeddings": cfg.bert.max_position_embeddings,
        "type_vocab_size": cfg.bert.type_vocab_size,
        "initializer_range": cfg.bert.initializer_range,
        "layer_norm_eps": cfg.bert.layer_norm_eps,
        "kg_vocab_size": cfg.kg_vocab_size,
        **dict(extra_config),
    }
    if cfg.num_labels is not None:
        config["num_labels"] = cfg.num_labels
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return output_dir
