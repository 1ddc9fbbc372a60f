"""Checkpoint parity verification against a torch execution.

BASELINE.md requires <1e-5 max deviation from the PyTorch reference on the
published checkpoints.  This tool loads an HF-format STonKGs checkpoint
twice — through this framework's engine and through a torch composition of
HF modules that reproduces the reference forward
(``stonkgs_model.py:149-258``) — runs both on identical inputs, and reports
the deviation.  CLI: ``stonkgs-tpu verify-parity``.

Requires torch + transformers (dev dependencies).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ParityReport:
    """Per-tensor max-deviation report for reference parity checks."""
    max_dev_pooled: float
    max_dev_mlm: float
    max_dev_elm: float
    max_dev_nsp: float
    max_dev_logits: Optional[float]  # classification head, if present
    n_rows: int

    @property
    def max_dev(self) -> float:
        """Largest absolute deviation across all compared tensors."""
        vals = [self.max_dev_pooled, self.max_dev_mlm, self.max_dev_elm,
                self.max_dev_nsp]
        if self.max_dev_logits is not None:
            vals.append(self.max_dev_logits)
        return max(vals)

    def summary(self, tolerance: float = 1e-5) -> str:
        """Human-readable table of per-tensor deviations."""
        status = "PASS" if self.max_dev < tolerance else "FAIL"
        return (f"{status}: max deviation {self.max_dev:.2e} over "
                f"{self.n_rows} rows (pooled {self.max_dev_pooled:.2e}, "
                f"mlm {self.max_dev_mlm:.2e}, elm {self.max_dev_elm:.2e}, "
                f"nsp {self.max_dev_nsp:.2e}"
                + (f", cls {self.max_dev_logits:.2e}" if self.max_dev_logits
                   is not None else "") + ")")


def _torch_reference_forward(sd, hf_cfg: dict, kg_table: np.ndarray,
                             batch: Dict[str, np.ndarray]):
    """Reference-semantics forward from a raw state dict (torch)."""
    import torch
    import transformers

    cfg = transformers.BertConfig(**{
        k: v for k, v in hf_cfg.items()
        if k in transformers.BertConfig().to_dict()})

    def sub(prefix):
        return {k[len(prefix):]: torch.as_tensor(np.asarray(v))
                for k, v in sd.items() if k.startswith(prefix)}

    trunk = transformers.BertModel(cfg)
    trunk.load_state_dict(sub("bert."), strict=False)
    backbone = transformers.BertModel(cfg)
    backbone.load_state_dict(sub("lm_backbone."), strict=False)
    trunk.eval()
    backbone.eval()

    t = lambda k: torch.as_tensor(np.asarray(sd[k]))  # noqa: E731
    half = batch["input_ids"].shape[1] // 2
    ids = torch.as_tensor(batch["input_ids"])
    with torch.no_grad():
        token_emb = backbone(ids[:, :half])[0]
        ent_emb = torch.as_tensor(kg_table)[ids[:, half:]]
        out = trunk(
            inputs_embeds=torch.cat([token_emb, ent_emb], dim=1),
            attention_mask=torch.as_tensor(batch["attention_mask"]),
            token_type_ids=torch.as_tensor(batch["token_type_ids"]),
        )
        seq, pooled = out.last_hidden_state, out.pooler_output
        # BertPredictionHeadTransform: dense -> gelu -> LayerNorm
        h = torch.nn.functional.linear(
            seq, t("cls.predictions.transform.dense.weight"),
            t("cls.predictions.transform.dense.bias"))
        h = torch.nn.functional.gelu(h)
        h = torch.nn.functional.layer_norm(
            h, h.shape[-1:], t("cls.predictions.transform.LayerNorm.weight"),
            t("cls.predictions.transform.LayerNorm.bias"),
            eps=cfg.layer_norm_eps)
        mlm = h[:, :half] @ t("cls.predictions.text_decoder.weight").T
        elm = h[:, half:] @ t("cls.predictions.entity_decoder.weight").T
        nsp = pooled @ t("cls.seq_relationship.weight").T + t("cls.seq_relationship.bias")
        cls_logits = None
        if "classifier.weight" in sd:
            cls_logits = pooled @ t("classifier.weight").T + t("classifier.bias")
    return (mlm.numpy(), elm.numpy(), nsp.numpy(), pooled.numpy(),
            None if cls_logits is None else cls_logits.numpy())


def verify_parity(
    model_dir: str,
    kg_embedding_path: str,
    kg_random_walk_path: str,
    *,
    n_rows: int = 8,
    seed: int = 0,
) -> ParityReport:
    """Compare this framework vs torch on random inputs; fp32 both sides."""
    import jax.numpy as jnp

    from stonkgs_tpu.api.inference import STonKGsEngine
    from stonkgs_tpu.models import stonkgs
    from stonkgs_tpu.utils import hf_loader

    engine = STonKGsEngine.from_pretrained(
        model_dir, kg_embedding_path, kg_random_walk_path,
        compute_dtype="float32",
    )
    cfg = engine.cfg
    rng = np.random.default_rng(seed)
    half = cfg.text_len
    batch_np = {
        "input_ids": np.concatenate([
            rng.integers(0, cfg.bert.vocab_size, (n_rows, half)),
            rng.integers(0, cfg.kg_vocab_size, (n_rows, cfg.entity_len)),
        ], axis=1),
        "attention_mask": np.ones((n_rows, cfg.seq_len), np.int64),
        "token_type_ids": np.concatenate([
            np.zeros((n_rows, half), np.int64),
            np.ones((n_rows, cfg.entity_len), np.int64)], axis=1),
    }
    batch_np["attention_mask"][0, half - 5: half] = 0  # some text padding

    mlm, elm, nsp, pooled = stonkgs.pretraining_logits(
        engine.params, cfg,
        jnp.asarray(batch_np["input_ids"]),
        jnp.asarray(batch_np["attention_mask"]),
        jnp.asarray(batch_np["token_type_ids"]),
        precision="highest",
    )
    cls_logits = None
    if "classifier" in engine.params:
        cls_logits = stonkgs.classification_logits(
            engine.params, cfg, {k: jnp.asarray(v) for k, v in batch_np.items()},
            precision="highest")

    sd = hf_loader.load_state_dict(model_dir)
    hf_cfg = hf_loader.load_config(model_dir)
    kg_table = np.asarray(engine.params["kg_backbone"], np.float32)
    t_mlm, t_elm, t_nsp, t_pooled, t_cls = _torch_reference_forward(
        sd, hf_cfg, kg_table, batch_np)

    dev = lambda a, b: float(np.abs(np.asarray(a, np.float32) - b).max())  # noqa: E731
    report = ParityReport(
        max_dev_pooled=dev(pooled, t_pooled),
        max_dev_mlm=dev(mlm, t_mlm),
        max_dev_elm=dev(elm, t_elm),
        max_dev_nsp=dev(nsp, t_nsp),
        max_dev_logits=(dev(cls_logits, t_cls)
                        if cls_logits is not None and t_cls is not None else None),
        n_rows=n_rows,
    )
    logger.info(report.summary())
    return report
