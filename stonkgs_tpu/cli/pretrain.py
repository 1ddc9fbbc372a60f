"""Pre-training driver (reference ``models/stonkgs_pretraining.py:103-244``).

Loads the preprocessed dataset (pickle or TSV with stringified int lists),
builds the model (KG backbone from node2vec embeddings + frozen LM
backbone), and runs the pjit train loop with checkpoint auto-resume.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

FEATURE_KEYS = ("input_ids", "attention_mask", "token_type_ids",
                "masked_lm_labels", "ent_masked_lm_labels",
                "prot_masked_lm_labels", "next_sentence_labels")


def load_preprocessed_dataset(path: str) -> Dict[str, np.ndarray]:
    """Pickle/TSV of preprocessed features -> dict of (N, ...) arrays.

    Equivalent of ``_load_pre_training_data`` (``stonkgs_pretraining.py:
    37-52``), with TSV list-repair from fix_broken_pretraining_dataset."""
    import pandas as pd

    from stonkgs_tpu.data.filters import fix_stringified_lists

    if os.path.isdir(path):
        # memory-mapped feature store (data/memmap_dataset.py)
        from stonkgs_tpu.data.memmap_dataset import MemmapFeatureStore

        store = MemmapFeatureStore(path)
        return {k: store[k] for k in store.keys()}
    if path.endswith(".pkl") or path.endswith(".pickle"):
        df = pd.read_pickle(path)
    else:
        df = fix_stringified_lists(pd.read_csv(path, sep="\t"))
    out = {}
    for key in FEATURE_KEYS:
        if key not in df.columns:
            continue
        col = df[key]
        if np.isscalar(col.iloc[0]) or isinstance(col.iloc[0], (int, np.integer)):
            out[key] = col.to_numpy(np.int64)
        else:
            out[key] = np.stack([np.asarray(v, np.int64) for v in col])
    return out


def run_pretraining(
    dataset_path: str,
    *,
    variant: str = "stonkgs",
    kg_embedding_path: Optional[str] = None,
    lm_checkpoint: Optional[str] = None,
    vocab_file: Optional[str] = None,
    batch_size: int = 8,
    lr: float = 1e-4,
    max_steps: int = 200,
    gradient_accumulation_steps: int = 1,
    save_steps: int = 5000,
    save_total_limit: int = 5,
    log_steps: int = 100,
    output_dir: str = "stonkgs-pretraining",
    n_model_shards: int = 1,
    compute_dtype: str = "bfloat16",
    remat="auto",
    attention_impl: str = "auto",
    fsdp: bool = False,
    frozen_bf16: bool = True,
    export_hf_dir: Optional[str] = None,
    local_rank: int = -1,  # accepted and ignored, like the reference CLI
    num_hidden_layers: Optional[int] = None,
    seed: int = 0,
):
    """Pre-train STonKGs / TransESTonKGs from preprocessed features."""
    import jax
    import jax.numpy as jnp

    from stonkgs_tpu.config import BertConfig, STonKGsConfig
    from stonkgs_tpu.models import stonkgs
    from stonkgs_tpu.parallel.mesh import make_mesh
    from stonkgs_tpu.train.pretraining import PretrainingConfig, pretrain
    from stonkgs_tpu.utils.logging import RunLogger

    features = load_preprocessed_dataset(dataset_path)
    n = len(features["input_ids"])
    seq_len = features["input_ids"].shape[1]
    logger.info("dataset: %d examples, seq len %d (%.1f MB)",
                n, seq_len,
                sum(v.nbytes for v in features.values()) / 1e6)

    if variant == "prot":
        # the BigBird trunk supports full-layer remat only; its attention
        # impls resolve internally (flash backbone + Pallas block-sparse
        # on TPU), so --attention/--fsdp do not apply
        if attention_impl not in (None, "auto"):
            logger.warning("--attention %s is ignored for variant=prot "
                           "(the BigBird trunk selects its own kernels)",
                           attention_impl)
        if fsdp:
            logger.warning("--fsdp is ignored for variant=prot "
                           "(single-device prot training only)")
        return _run_prot_pretraining(
            features, kg_embedding_path=kg_embedding_path,
            batch_size=batch_size, lr=lr, max_steps=max_steps,
            gradient_accumulation_steps=gradient_accumulation_steps,
            save_steps=save_steps, save_total_limit=save_total_limit,
            log_steps=log_steps,
            output_dir=output_dir, compute_dtype=compute_dtype,
            remat=remat not in (False, "none"), seed=seed)

    # infer the layout from the data
    if variant == "transe":
        text_len, entity_len = seq_len - 4, 4
    else:
        text_len = entity_len = seq_len // 2

    kg_vectors = None
    if kg_embedding_path:
        import pandas as pd

        kg_vectors = pd.read_csv(
            kg_embedding_path, sep="\t", header=None, index_col=0
        ).to_numpy(np.float32)

    # the model hidden size must match the node2vec embedding dimension
    # (768 in production; inferred here so small smoke runs work too)
    hidden = int(kg_vectors.shape[1]) if kg_vectors is not None else 768
    vocab_size = 28996  # BioBERT default
    if vocab_file:
        with open(vocab_file) as f:
            vocab_size = sum(1 for _ in f)
    if hidden == 768:
        bert_cfg = BertConfig(vocab_size=vocab_size,
                              max_position_embeddings=max(seq_len, 512))
        if num_hidden_layers is not None:
            import dataclasses

            bert_cfg = dataclasses.replace(
                bert_cfg, num_hidden_layers=num_hidden_layers)
    else:
        # sub-production widths are smoke-scale runs: default the depth to
        # something a smoke run can actually train (a 12-layer 32-wide
        # trunk neither learns nor tests anything the 2-layer one doesn't)
        bert_cfg = BertConfig(
            vocab_size=vocab_size,
            hidden_size=hidden,
            num_hidden_layers=num_hidden_layers or 2,
            num_attention_heads=max(hidden // 64, 2),
            intermediate_size=hidden * 4,
            max_position_embeddings=max(seq_len, 512),
        )
    kg_vocab = int(features["input_ids"][:, text_len:].max()) + 1
    cfg = STonKGsConfig(bert=bert_cfg, kg_vocab_size=kg_vocab,
                        text_len=text_len, entity_len=entity_len)

    key = jax.random.PRNGKey(seed)
    if lm_checkpoint:
        from stonkgs_tpu.utils.hf_loader import (
            bert_params_from_state_dict, load_state_dict,
        )

        sd = load_state_dict(lm_checkpoint)
        prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
        lm_params = bert_params_from_state_dict(sd, bert_cfg, prefix)
        params = stonkgs.init_stonkgs_params(key, cfg)
        params["lm_backbone"] = lm_params
    else:
        params = stonkgs.init_stonkgs_params(key, cfg)

    if kg_vectors is not None:
        params["kg_backbone"] = stonkgs.build_kg_table(
            params["lm_backbone"], cfg.bert, kg_vectors)

    if frozen_bf16 and compute_dtype == "bfloat16":
        # frozen backbones are read-only: storing them in bf16 halves their
        # HBM footprint (fits batch 128+ on one v5e chip) with no effect on
        # the bf16 compute path
        for key in ("lm_backbone", "kg_backbone"):
            params[key] = jax.tree.map(
                lambda x: jnp.asarray(x, jnp.bfloat16)
                if x.dtype == np.float32 else x, params[key])

    mesh = None
    if n_model_shards > 1 or len(jax.devices()) > 1:
        # data axis must divide the micro batch; use the largest divisor
        # that fits the available devices
        if n_model_shards > len(jax.devices()):
            raise ValueError(
                f"--n_model_shards {n_model_shards} exceeds the "
                f"{len(jax.devices())} available devices")
        max_data = len(jax.devices()) // n_model_shards
        n_data = max(d for d in range(1, max_data + 1) if batch_size % d == 0)
        mesh = make_mesh(n_data=n_data, n_model=n_model_shards)

    from stonkgs_tpu.train.pretraining import resolve_train_impl

    remat, attention_impl = resolve_train_impl(remat, attention_impl, mesh)

    run_cfg = PretrainingConfig(
        learning_rate=lr, max_steps=max_steps,
        micro_batch_size=batch_size,
        grad_accumulation_steps=gradient_accumulation_steps,
        save_steps=save_steps, save_total_limit=save_total_limit,
        log_steps=log_steps,
        compute_dtype=compute_dtype, seed=seed, remat=remat,
        attention_impl=attention_impl, fsdp=fsdp,
    )
    with RunLogger(log_dir=output_dir, experiment="stonkgs-pretraining") as log:
        for k, v in vars(run_cfg).items():
            log.log_param(k, v)
        state = pretrain(
            cfg, params, features, run_cfg,
            mesh=mesh,
            checkpoint_dir=os.path.join(output_dir, "checkpoints"),
            log_fn=lambda step, m: log.log_metrics(m, step),
        )
    if export_hf_dir:
        from stonkgs_tpu.utils.hf_export import save_pretrained

        save_pretrained(state.params, cfg, export_hf_dir)
        logger.info("exported HF checkpoint to %s", export_hf_dir)
    return state


def _run_prot_pretraining(
    features,
    *,
    kg_embedding_path=None,
    batch_size=8,
    lr=1e-4,
    max_steps=200,
    gradient_accumulation_steps=1,
    save_steps=5000,
    save_total_limit=5,
    log_steps=100,
    output_dir="protstonkgs-pretraining",
    compute_dtype="bfloat16",
    remat=True,
    seed=0,
):
    """ProtSTonKGs pre-training driver (tri-modality features).

    Layout inferred from the label columns: the text segment spans the
    masked_lm labels, KG the ent labels, protein the prot labels."""
    import jax
    import jax.numpy as jnp

    from stonkgs_tpu.config import BertConfig, BigBirdConfig, ProtSTonKGsConfig
    from stonkgs_tpu.models import protstonkgs
    from stonkgs_tpu.parallel.mesh import make_mesh
    from stonkgs_tpu.train.pretraining import PretrainingConfig, pretrain
    from stonkgs_tpu.utils.logging import RunLogger

    text_len = features["masked_lm_labels"].shape[1]
    ent_len = features["ent_masked_lm_labels"].shape[1]
    prot_len = features["prot_masked_lm_labels"].shape[1]
    seq_len = features["input_ids"].shape[1]
    assert text_len + ent_len + prot_len == seq_len

    kg_vectors = None
    hidden = 768
    if kg_embedding_path:
        import pandas as pd

        kg_vectors = pd.read_csv(
            kg_embedding_path, sep="\t", header=None, index_col=0
        ).to_numpy(np.float32)
        hidden = int(kg_vectors.shape[1])

    ent_ids = features["input_ids"][:, text_len: text_len + ent_len]
    prot_ids = features["input_ids"][:, text_len + ent_len:]
    kg_vocab = int(ent_ids.max()) + 1
    prot_vocab = max(int(prot_ids.max()) + 1, 30)

    if hidden == 768:
        trunk = BigBirdConfig(max_position_embeddings=max(seq_len, 4096))
        lm = BertConfig()
        prot = BertConfig(vocab_size=prot_vocab, hidden_size=1024,
                          num_hidden_layers=30, num_attention_heads=16,
                          intermediate_size=4096,
                          max_position_embeddings=max(prot_len, 40000))
    else:  # smoke-scale config derived from the embedding dim
        trunk = BigBirdConfig(
            vocab_size=128, hidden_size=hidden,
            num_hidden_layers=2, num_attention_heads=max(hidden // 32, 2),
            intermediate_size=hidden * 4,
            max_position_embeddings=max(seq_len, 64),
            block_size=max(seq_len // 8, 4), num_random_blocks=1)
        lm = BertConfig(vocab_size=28996, hidden_size=hidden,
                        num_hidden_layers=2,
                        num_attention_heads=max(hidden // 32, 2),
                        intermediate_size=hidden * 4,
                        max_position_embeddings=max(text_len // 3, 8))
        prot = BertConfig(vocab_size=prot_vocab, hidden_size=hidden,
                          num_hidden_layers=2,
                          num_attention_heads=max(hidden // 32, 2),
                          intermediate_size=hidden * 4,
                          max_position_embeddings=max(prot_len, 8))
    cfg = ProtSTonKGsConfig(
        trunk=trunk, lm=lm, prot=prot,
        lm_vocab_size=lm.vocab_size, kg_vocab_size=kg_vocab,
        prot_vocab_size=prot_vocab,
        kg_start_idx=text_len, prot_start_idx=text_len + ent_len,
        seq_len=seq_len,
    )
    params = protstonkgs.init_protstonkgs_params(jax.random.PRNGKey(seed), cfg)
    if kg_vectors is not None:
        params["kg_backbone"] = protstonkgs.build_kg_table(
            params["lm_backbone"], cfg, kg_vectors)
    if compute_dtype == "bfloat16":
        # frozen backbones are read-only: bf16 storage halves ~2.3 GB of
        # HBM (same as the stonkgs path's frozen_bf16; required to fit
        # the 710M-param model + optimizer on one v5e chip)
        for key in ("lm_backbone", "prot_backbone", "kg_backbone"):
            params[key] = jax.tree.map(
                lambda x: jnp.asarray(x, jnp.bfloat16)
                if x.dtype == np.float32 else x, params[key])

    mesh = None
    if len(jax.devices()) > 1:
        max_data = len(jax.devices())
        n_data = max(d for d in range(1, max_data + 1) if batch_size % d == 0)
        mesh = make_mesh(n_data=n_data, n_model=1)

    run_cfg = PretrainingConfig(
        learning_rate=lr, max_steps=max_steps,
        micro_batch_size=batch_size,
        grad_accumulation_steps=gradient_accumulation_steps,
        save_steps=save_steps, save_total_limit=save_total_limit,
        log_steps=log_steps,
        compute_dtype=compute_dtype, seed=seed, remat=remat,
    )
    with RunLogger(log_dir=output_dir,
                   experiment="protstonkgs-pretraining") as log:
        state = pretrain(
            cfg, params, features, run_cfg, mesh=mesh,
            checkpoint_dir=os.path.join(output_dir, "checkpoints"),
            log_fn=lambda step, m: log.log_metrics(m, step),
            # custom loss_fns must carry their own remat: make_train_step
            # only threads remat/attention into the DEFAULT stonkgs loss
            loss_fn=functools.partial(protstonkgs.pretraining_loss,
                                      remat=remat),
        )
    return state
