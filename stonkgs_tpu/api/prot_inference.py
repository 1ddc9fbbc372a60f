"""ProtSTonKGs inference engine (tri-modality serving).

Symmetric to ``STonKGsEngine``: loads an HF-format ProtSTonKGs checkpoint
(e.g. ``stonkgs/protstonkgs``) + node2vec artifacts + the two tokenizers,
and runs batched embedding extraction / classification over
(text, KG, protein) inputs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stonkgs_tpu.config import ProtSTonKGsConfig
from stonkgs_tpu.data.artifacts import KGArtifacts
from stonkgs_tpu.models import protstonkgs

BATCH_KEYS = ("input_ids", "attention_mask")


@dataclasses.dataclass
class ProtSTonKGsEngine:
    """Batched ProtSTonKGs inference engine (tri-modality inputs)."""
    cfg: ProtSTonKGsConfig
    params: dict
    lm_tokenizer: Optional[object] = None
    prot_tokenizer: Optional[object] = None
    artifacts: Optional[KGArtifacts] = None
    compute_dtype: str = "bfloat16"
    batch_size: int = 8
    fast_trunk: bool = False   # original_full + flash (non-parity speed mode)

    def __post_init__(self):
        dtype = getattr(jnp, self.compute_dtype)
        trunk_type = "original_full" if self.fast_trunk else None
        self._pooled = jax.jit(lambda p, batch: protstonkgs.trunk_forward(
            p, self.cfg, batch["input_ids"], batch.get("attention_mask"),
            compute_dtype=dtype, trunk_attention_type=trunk_type,
            cls_only=True)[1])
        self._classify = jax.jit(partial(
            protstonkgs.classification_logits, cfg=self.cfg,
            compute_dtype=dtype))

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        kg_embedding_path: str,
        kg_random_walk_path: str,
        lm_vocab_file: Optional[str] = None,
        prot_vocab_file: Optional[str] = None,
        **kw,
    ) -> "ProtSTonKGsEngine":
        """Load an engine from an exported/ingested HF-style checkpoint dir."""
        from stonkgs_tpu.data.artifacts import load_kg_artifacts
        from stonkgs_tpu.utils.hf_loader import load_protstonkgs_pretrained

        cfg, params = load_protstonkgs_pretrained(
            model_dir, kg_embedding_path, kg_random_walk_path,
            **{k: kw.pop(k) for k in ("sep_id", "mask_id", "unk_id")
               if k in kw})
        lm_tok = prot_tok = None
        if lm_vocab_file:
            from stonkgs_tpu.data.fast_tokenizer import FastBertTokenizer

            lm_tok = FastBertTokenizer(lm_vocab_file)
        if prot_vocab_file:
            from stonkgs_tpu.data.fast_tokenizer import FastBertTokenizer

            prot_tok = FastBertTokenizer(prot_vocab_file, do_lower_case=False)
        artifacts = load_kg_artifacts(kg_embedding_path, kg_random_walk_path)
        return cls(cfg=cfg, params=params, lm_tokenizer=lm_tok,
                   prot_tokenizer=prot_tok, artifacts=artifacts, **kw)

    def preprocess(self, rows: Dict[str, Sequence]) -> Dict[str, np.ndarray]:
        """rows dict (source/target/evidence/source_description/
        target_description/source_prot/target_prot) -> model features."""
        from stonkgs_tpu.data.prot import preprocess_prot_for_pretraining

        assert self.lm_tokenizer is not None and self.prot_tokenizer is not None
        feats = preprocess_prot_for_pretraining(
            rows, self.artifacts, self.lm_tokenizer, self.prot_tokenizer,
            text_seq_length=self.cfg.text_len,
            prot_seq_length=self.cfg.prot_len,
            bigbird_sep_id=self.cfg.sep_id, bigbird_mask_id=self.cfg.mask_id,
            bigbird_unk_id=self.cfg.unk_id,
            apply_masking=False,
        )
        return {k: feats[k] for k in BATCH_KEYS}

    def embed(self, features: Dict[str, np.ndarray]) -> np.ndarray:
        """Pooled [CLS] embeddings for preprocessed features, batched."""
        from stonkgs_tpu.utils.batching import batched_apply

        return batched_apply(
            lambda chunk: self._pooled(self.params, chunk),
            features, BATCH_KEYS, self.batch_size)

    def logits(self, features: Dict[str, np.ndarray]) -> np.ndarray:
        """Classification logits (requires a loaded classifier head)."""
        assert "classifier" in self.params, "no classification head loaded"
        from stonkgs_tpu.utils.batching import batched_apply

        return batched_apply(
            lambda chunk: self._classify(self.params, batch=chunk),
            features, BATCH_KEYS, self.batch_size)
