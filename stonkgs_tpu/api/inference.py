"""High-level inference engine: load a checkpoint, embed / classify batches.

Bundles config + params + jitted functions behind one object so the
README flow (``preprocess_df_for_embeddings`` + ``get_stonkgs_embeddings``,
reference ``models/stonkgs_for_embeddings.py``) and the ``infer_*`` family
(``api/api.py:234-336``) share a single engine.

TPU-first: one pjit'd forward over padded fixed-size batches (two compiled
shapes max), instead of the reference's batch-size-1 loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.data.artifacts import KGArtifacts, load_kg_artifacts
from stonkgs_tpu.data.preprocessing import (
    preprocess_for_embeddings,
)
from stonkgs_tpu.data.wordpiece import BertTokenizer
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.utils import hf_loader

BATCH_KEYS = ("input_ids", "attention_mask", "token_type_ids")


@dataclasses.dataclass
class STonKGsEngine:
    """Loaded STonKGs model + tokenizer + KG artifacts."""

    cfg: STonKGsConfig
    params: dict
    tokenizer: Optional[BertTokenizer] = None
    artifacts: Optional[KGArtifacts] = None
    compute_dtype: str = "bfloat16"
    batch_size: int = 64
    # Length-bucketed SPEED MODE (opt-in; None = exact-parity shapes).
    # e.g. (64, 128): rows whose true text length fits a bucket run the
    # frozen backbone at that length and the trunk at bucket+entity_len
    # (entity half kept on its original position rows via position_ids).
    # The trunk result is numerically identical to the full shape (masked
    # PAD keys contribute exp(-1e9-m)=0 exactly in fp32); the only delta
    # is the frozen backbone's attend-over-PAD quirk
    # (``stonkgs_model.py:178``), which parity mode preserves at 256-wide
    # padding — quantified in PERF.md / bench_bucketed_extract.py.
    length_buckets: Optional[Tuple[int, ...]] = None

    def __post_init__(self):
        from stonkgs_tpu.ops.attention import default_infer_impl

        dtype = getattr(jnp, self.compute_dtype)
        impl = default_infer_impl()
        self._pooler = jax.jit(
            partial(stonkgs.pooler_output, cfg=self.cfg, compute_dtype=dtype,
                    attention_impl=impl)
        )
        self._classify = jax.jit(
            partial(stonkgs.classification_logits, cfg=self.cfg,
                    compute_dtype=dtype, attention_impl=impl)
        )
        self._bucket_poolers = {}
        self._bucket_classifiers = {}
        if self.length_buckets:
            buckets = tuple(sorted(set(int(b) for b in self.length_buckets)))
            if any(b <= 0 or b > self.cfg.text_len for b in buckets):
                raise ValueError(
                    f"length_buckets {buckets} must lie in "
                    f"(0, text_len={self.cfg.text_len}]")
            self.length_buckets = buckets
            for b in buckets:
                if b == self.cfg.text_len:
                    continue  # full shape = the parity functions above
                bcfg = self.cfg.replace(text_len=b)
                self._bucket_poolers[b] = jax.jit(
                    partial(stonkgs.pooler_output, cfg=bcfg,
                            compute_dtype=dtype, attention_impl=impl))
                self._bucket_classifiers[b] = jax.jit(
                    partial(stonkgs.classification_logits, cfg=bcfg,
                            compute_dtype=dtype, attention_impl=impl))

    # -- constructors -----------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        kg_embedding_path: str,
        kg_random_walk_path: Optional[str] = None,
        vocab_file: Optional[str] = None,
        num_labels: Optional[int] = None,
        variant: str = "stonkgs",
        **kw,
    ) -> "STonKGsEngine":
        """Load an HF-format reference checkpoint + node2vec artifacts.

        Mirrors ``STonKGsForSequenceClassification.from_pretrained(path,
        kg_embedding_dict_path=...)`` (reference ``api/api.py:104-112``).
        ``variant="transe"`` loads TransE embeddings (no walks file) with
        the 256+4 sequence layout."""
        sd = hf_loader.load_state_dict(model_dir)
        hf_cfg = hf_loader.load_config(model_dir)
        bert_cfg = BertConfig.from_hf_dict(hf_cfg)
        kg_vocab = hf_loader.infer_kg_vocab_size(sd)
        if variant == "transe":
            from stonkgs_tpu.data.transe import load_transe_artifacts

            artifacts = load_transe_artifacts(kg_embedding_path)
            cfg = STonKGsConfig(
                bert=bert_cfg, kg_vocab_size=kg_vocab,
                text_len=bert_cfg.max_position_embeddings - 4, entity_len=4,
                num_labels=num_labels or hf_cfg.get("num_labels"),
            )
        else:
            artifacts = load_kg_artifacts(kg_embedding_path, kg_random_walk_path)
            half = artifacts.rw_len * 2 + 2
            cfg = STonKGsConfig(
                bert=bert_cfg, kg_vocab_size=kg_vocab,
                text_len=half, entity_len=half,
                num_labels=num_labels or hf_cfg.get("num_labels"),
            )
        params = hf_loader.stonkgs_params_from_state_dict(sd, cfg)
        params["kg_backbone"] = stonkgs.build_kg_table(
            params["lm_backbone"], cfg.bert, artifacts.vectors
        )
        tokenizer = None
        if vocab_file:
            from stonkgs_tpu.data.fast_tokenizer import FastBertTokenizer
            tokenizer = FastBertTokenizer(vocab_file)
        return cls(cfg=cfg, params=params, tokenizer=tokenizer,
                   artifacts=artifacts, **kw)

    @classmethod
    def from_default_pretrained(
        cls, model_name: Optional[str] = None, **kw
    ) -> "STonKGsEngine":
        """Load a published HF-hub checkpoint (default stonkgs/stonkgs-150k)
        plus the Zenodo node2vec artifacts and BioBERT vocab.

        Reference: ``STonKGsForPreTraining.from_default_pretrained``
        (``stonkgs_model.py:143-147``) + ``api/api.py`` ensure functions."""
        from stonkgs_tpu.api.api import ensure_embeddings, ensure_vocab, ensure_walks
        from stonkgs_tpu.constants import DEFAULT_PRETRAINED_MODEL
        from stonkgs_tpu.utils.cache import ensure

        name = model_name or DEFAULT_PRETRAINED_MODEL
        sub = "hub/" + name.replace("/", "--")
        base = f"https://huggingface.co/{name}/resolve/main"
        ensure(f"{base}/config.json", sub)
        ckpt = ensure(f"{base}/pytorch_model.bin", sub)
        return cls.from_pretrained(
            str(ckpt.parent),
            kg_embedding_path=str(ensure_embeddings()),
            kg_random_walk_path=str(ensure_walks()),
            vocab_file=str(ensure_vocab()),
            **kw,
        )

    def save_pretrained(self, output_dir: str) -> str:
        """Export to an HF-format checkpoint directory (interop with the
        reference implementation)."""
        from stonkgs_tpu.utils.hf_export import save_pretrained

        return save_pretrained(self.params, self.cfg, output_dir)

    # -- preprocessing ----------------------------------------------------

    def preprocess(
        self, sources, targets, evidences,
        *, relations=None, apply_masking: bool = True, seed: int = 0,
    ) -> Dict[str, np.ndarray]:
        """rows -> model features (reference ``preprocess_df_for_embeddings``).

        For a TransE-variant engine pass ``relations`` as well."""
        assert self.tokenizer is not None and self.artifacts is not None
        from stonkgs_tpu.data.transe import TransEArtifacts

        if isinstance(self.artifacts, TransEArtifacts):
            from stonkgs_tpu.data.transe import (
                assemble_transe_part, preprocess_transe_for_finetuning,
            )

            assert relations is not None, "TransE preprocessing needs relations"
            # inference requires 1:1 row alignment — refuse silent drops
            ent_part = assemble_transe_part(
                list(sources), list(relations), list(targets),
                self.artifacts, self.cfg.sep_id)
            keep = ent_part[1]
            if not keep.all():
                bad = [i for i, k in enumerate(keep) if not k]
                raise ValueError(
                    f"rows {bad[:10]}{'...' if len(bad) > 10 else ''} contain "
                    "head/relation/tail names missing from the TransE "
                    "embeddings; filter them out before inference")
            feats = preprocess_transe_for_finetuning(
                list(sources), list(relations), list(targets),
                list(evidences), np.zeros(len(evidences), np.int64),
                self.artifacts, self.tokenizer,
                text_part_length=self.cfg.text_len, sep_id=self.cfg.sep_id,
                ent_part=ent_part,
            )
            feats.pop("labels")
            return feats
        return preprocess_for_embeddings(
            np.asarray(sources, object), np.asarray(targets, object),
            list(evidences), self.artifacts, self.tokenizer,
            sep_id=self.cfg.sep_id, unk_id=self.cfg.unk_id,
            mask_id=self.cfg.mask_id,
            apply_masking=apply_masking, seed=seed,
        )

    # -- batched forwards -------------------------------------------------

    def _batches(self, features: Dict[str, np.ndarray]):
        from stonkgs_tpu.utils.batching import iter_padded_batches

        yield from iter_padded_batches(features, BATCH_KEYS, self.batch_size)

    def _bucket_features(self, features: Dict[str, np.ndarray]):
        """Partition rows by true text length into the compiled buckets.

        Yields ``(bucket_len, row_indices, sub_features, position_ids)``
        where sub_features carry the text half truncated to bucket_len and
        position_ids keep the entity half on its original position rows
        (``[0..b-1, text_len..text_len+entity_len-1]``).  Rows longer than
        every bucket run at the full parity shape (bucket_len ==
        cfg.text_len, position_ids None)."""
        tl, el = self.cfg.text_len, self.cfg.entity_len
        am = np.asarray(features["attention_mask"])
        true_len = am[:, :tl].sum(axis=1)
        buckets = list(self.length_buckets or ())
        if not buckets or buckets[-1] < tl:
            buckets.append(tl)
        if 0 < len(am) <= self.batch_size:
            # Latency-shaped request (one padded batch either way): splitting
            # it across buckets costs a full dispatch+fetch round trip per
            # bucket — measured 69.5 ms median / 195 ms p90 at B=8 vs 37.9
            # parity (bench_serving_latency.py).  Run the WHOLE request at
            # the smallest bucket that fits its longest row instead.
            buckets = [b for b in buckets if true_len.max() <= b or b == tl]
            taken = np.zeros(len(am), bool)
            true_len = np.full(len(am), int(true_len.max()))
        else:
            taken = np.zeros(len(am), bool)
        for b in buckets:
            idx = np.nonzero(~taken & (true_len <= b))[0] if b < tl \
                else np.nonzero(~taken)[0]
            taken[idx] = True
            if len(idx) == 0:
                continue
            if b == tl:
                sub = {k: np.asarray(features[k])[idx]
                       for k in BATCH_KEYS if k in features}
                yield b, idx, sub, None
                continue
            sub = {}
            for k in BATCH_KEYS:
                if k in features:
                    v = np.asarray(features[k])[idx]
                    sub[k] = np.concatenate([v[:, :b], v[:, tl:]], axis=1)
            pos = np.concatenate(
                [np.arange(b), np.arange(tl, tl + el)]).astype(np.int32)
            yield b, idx, sub, pos

    def _dispatch(self, features: Dict[str, np.ndarray], fns, full_fn):
        """Dispatch forwards (bucketed when configured) without syncing.

        Returns ``(pending, n_rows)``; pending entries are
        ``(device_array, n_valid, dest_row_indices)`` — device work is in
        flight when this returns, so callers can overlap host work before
        fetching."""
        from stonkgs_tpu.utils.batching import iter_padded_batches

        n = len(features["input_ids"])
        pending = []
        if not self.length_buckets:
            off = 0
            for piece, valid in self._batches(features):
                out = full_fn(self.params, batch=piece)
                pending.append((out, valid, np.arange(off, off + valid)))
                off += valid
            return pending, n
        for b, idx, sub, pos in self._bucket_features(features):
            fn = full_fn if pos is None else fns[b]
            off = 0
            for piece, valid in iter_padded_batches(
                    sub, BATCH_KEYS, self.batch_size):
                if pos is not None:
                    piece = {**piece, "position_ids": jnp.asarray(pos[None])}
                out = fn(self.params, batch=piece)
                pending.append((out, valid, idx[off: off + valid]))
                off += valid
        return pending, n

    @staticmethod
    def _fetch(pending, n: int) -> np.ndarray:
        """Assemble dispatched outputs back into original row order."""
        if not pending:
            return np.zeros((n, 0), np.float32)
        width = pending[0][0].shape[-1]
        out = np.zeros((n, width), np.float32)
        for dev, valid, dest in pending:
            out[dest] = np.asarray(dev[:valid], np.float32)
        return out

    def embed(self, features: Dict[str, np.ndarray]) -> np.ndarray:
        """Pooled [CLS] embeddings, (N, hidden) float32.

        Batched replacement for ``get_stonkgs_embeddings``'s per-row loop.
        With ``length_buckets`` set, rows run at the smallest compiled
        text-length bucket that fits them (speed mode; see the field doc)."""
        if len(features["input_ids"]) == 0:
            return np.zeros((0, self.cfg.bert.hidden_size), np.float32)
        return self._fetch(*self._dispatch(
            features, self._bucket_poolers, self._pooler))

    def logits(self, features: Dict[str, np.ndarray]) -> np.ndarray:
        """Classification logits, (N, num_labels) float32."""
        assert "classifier" in self.params, "no classification head loaded"
        if len(features["input_ids"]) == 0:
            return np.zeros((0, self.cfg.num_labels or 0), np.float32)
        return self._fetch(*self._dispatch(
            features, self._bucket_classifiers, self._classify))

    def predict_proba(self, features: Dict[str, np.ndarray]) -> np.ndarray:
        """Softmax class probabilities over preprocessed features."""
        lg = self.logits(features)
        e = np.exp(lg - lg.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    # -- streaming bulk extraction (BASELINE config 4) ---------------------

    def embed_stream(
        self, rows, *, chunk_rows: int = 4096,
        apply_masking: bool = True, seed: int = 0,
    ):
        """Stream pooled embeddings over an iterable of (source, target,
        evidence) rows without materializing the whole corpus.

        Host preprocessing (C++ tokenizer + walk gathers) of chunk i+1
        overlaps the device compute of chunk i: the forward of the previous
        chunk is dispatched asynchronously and fetched only after the next
        chunk is tokenized.  Yields (N_chunk, hidden) float32 arrays."""
        import itertools

        rows = iter(rows)
        pending = None  # (pending list, n_rows) awaiting fetch

        def dispatch(chunk):
            src, tgt, ev = zip(*chunk)
            feats = self.preprocess(
                np.asarray(src, object), np.asarray(tgt, object), list(ev),
                apply_masking=apply_masking, seed=seed,
            )
            return self._dispatch(feats, self._bucket_poolers, self._pooler)

        while True:
            chunk = list(itertools.islice(rows, chunk_rows))
            if not chunk:
                break
            dispatched = dispatch(chunk)   # device work is in flight
            if pending is not None:
                yield self._fetch(*pending)
            pending = dispatched
        if pending is not None:
            yield self._fetch(*pending)
