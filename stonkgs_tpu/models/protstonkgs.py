"""ProtSTonKGs: tri-modality (text + KG + protein) BigBird, TPU-native.

Re-implementation of ``ProtSTonKGsForPreTraining`` /
``ProtSTonKGsForSequenceClassification``
(``/root/reference/src/stonkgs/models/protstonkgs_model.py:104-357``,
``protstonkgs_finetuning.py:241-372``).

Sequence layout: [text 768 | KG 256 | protein 3072] = 4096 tokens into a
BigBird trunk (block-sparse attention).  Three frozen backbones produce the
initial embeddings; only the trunk, the protein projection, and the heads
train.

Fidelity quirks replicated:
  * the text half runs through the LM backbone in 3 independent chunks of
    256 — each chunk gets positions 0..255 and no attention mask
    (``protstonkgs_model.py:253-263``),
  * the protein backbone runs without an attention mask,
  * the trunk gets NO token_type_ids (all zeros),
  * the PELM head decoders are bias-free with unused bias parameters,
  * KG-table special rows use the BigBird tokenizer's sep/mask/unk ids and
    are filled with the *LM backbone's* output for that id
    (``protstonkgs_model.py:188-192``),
  * no NSP objective (loss = MLM + ELM + ProtLM).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stonkgs_tpu.config import ProtSTonKGsConfig
from stonkgs_tpu.models import bert, bigbird
from stonkgs_tpu.models.bert import _init_dense, dense
from stonkgs_tpu.models.heads import (
    classifier_head, elm_decode_segment, elm_transform,
    init_classifier_head, init_elm_head,
)
from stonkgs_tpu.ops.losses import gather_masked_positions, masked_cross_entropy

Array = jax.Array

SEGMENTS = ("text", "entity", "prot")


def init_protstonkgs_params(
    key: Array,
    cfg: ProtSTonKGsConfig,
    *,
    with_classifier: bool = False,
    kg_table: Optional[Array] = None,
) -> dict:
    """Full ProtSTonKGs parameter tree (3 backbones + trunk + heads)."""
    k_trunk, k_lm, k_prot, k_proj, k_elm, k_cls = jax.random.split(key, 6)
    params = {
        "trunk": bigbird.init_bigbird_params(k_trunk, cfg.trunk, with_pooler=True),
        "lm_backbone": bert.init_bert_params(k_lm, cfg.lm, with_pooler=True),
        "prot_backbone": bert.init_bert_params(k_prot, cfg.prot, with_pooler=True),
        "prot_projection": _init_dense(
            k_proj, cfg.prot.hidden_size, cfg.trunk.hidden_size,
            cfg.trunk.initializer_range,
        ),
        "cls": {
            "predictions": init_elm_head(
                k_elm, cfg.trunk,
                [cfg.lm_vocab_size, cfg.kg_vocab_size, cfg.prot_vocab_size],
                SEGMENTS,
            ),
        },
        "kg_backbone": (
            kg_table if kg_table is not None
            else jnp.zeros((cfg.kg_table_size, cfg.trunk.hidden_size), jnp.float32)
        ),
    }
    if with_classifier:
        assert cfg.num_labels is not None
        params["classifier"] = init_classifier_head(k_cls, cfg.trunk, cfg.num_labels)
    return params


def build_kg_table(
    lm_params: dict,
    cfg: ProtSTonKGsConfig,
    kg_vectors: np.ndarray,
    *,
    precision=None,
) -> jnp.ndarray:
    """(N+3, H) KG table; special rows at the BigBird sep/mask/unk ids."""
    from stonkgs_tpu.models.stonkgs import kg_row_permutation

    special_ids = (cfg.sep_id, cfg.mask_id, cfg.unk_id)
    n, h = kg_vectors.shape
    table = np.zeros((n + 3, h), np.float32)
    table[kg_row_permutation(n, special_ids)] = np.asarray(kg_vectors, np.float32)
    ids = jnp.asarray([[s] for s in special_ids], jnp.int32)
    seq, _ = bert.bert_model(
        lm_params, cfg.lm, input_ids=ids,
        deterministic=True, precision=precision, with_pooler=False,
    )
    return jnp.asarray(table).at[jnp.asarray(special_ids)].set(seq[:, 0, :])


def backbone_embeddings(
    params: dict,
    cfg: ProtSTonKGsConfig,
    input_ids: Array,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    compute_dtype=jnp.float32,
    precision=None,
    attention_impl: str = "xla",
    prot_attention_impl: Optional[str] = None,
    tp_mesh=None,
) -> Array:
    """Three-modality input embeddings (B, 4096, H), trainable projection
    applied OUTSIDE the stop-gradient boundary (reference no_grad scope).

    ``prot_attention_impl`` defaults to "flash" on TPU: the 3072-token
    ProtBERT backbone is HBM-bound under dense attention (the fp32 score
    buffers dominate; in train mode XLA additionally materializes 3072²
    u32 dropout masks, >1 GB per layer at B=2); the Pallas kernel keeps
    the scores in VMEM and draws dropout in-kernel."""
    if prot_attention_impl is None:
        import jax as _jax

        prot_attention_impl = (
            "flash" if _jax.default_backend() == "tpu"
            else attention_impl)
    chunk = cfg.kg_start_idx // 3
    B = input_ids.shape[0]
    if not deterministic and dropout_rng is not None:
        r_lm, r_prot = jax.random.split(dropout_rng)
    else:
        r_lm = r_prot = None
    # text: 3 maskless chunks, each with positions 0..chunk-1 (quirk)
    text_in = input_ids[:, : cfg.kg_start_idx].reshape(B * 3, chunk)
    text_emb, _ = bert.bert_model(
        params["lm_backbone"], cfg.lm, input_ids=text_in,
        deterministic=deterministic, dropout_rng=r_lm,
        compute_dtype=compute_dtype, precision=precision,
        attention_impl=attention_impl, with_pooler=False,
    )
    text_emb = text_emb.reshape(B, cfg.kg_start_idx, -1)

    from stonkgs_tpu.parallel import tp

    ent_ids = input_ids[:, cfg.kg_start_idx: cfg.prot_start_idx]
    table = params["kg_backbone"].astype(compute_dtype)
    if tp.has_model_axis(tp_mesh):
        ent_emb = tp.tp_gather(table, ent_ids, tp_mesh)
    else:
        ent_emb = jnp.take(table, ent_ids, axis=0)

    # the prot backbone runs in train mode too (reference keeps the whole
    # module in .train() during training, so backbone dropout is active)
    prot_out, _ = bert.bert_model(
        params["prot_backbone"], cfg.prot,
        input_ids=input_ids[:, cfg.prot_start_idx:],
        deterministic=deterministic, dropout_rng=r_prot,
        compute_dtype=compute_dtype, precision=precision,
        attention_impl=prot_attention_impl, with_pooler=False,
    )
    text_emb = jax.lax.stop_gradient(text_emb)
    ent_emb = jax.lax.stop_gradient(ent_emb)
    prot_out = jax.lax.stop_gradient(prot_out)
    prot_emb = dense(prot_out, params["prot_projection"], precision)
    return jnp.concatenate([text_emb, ent_emb, prot_emb], axis=1)


def trunk_forward(
    params: dict,
    cfg: ProtSTonKGsConfig,
    input_ids: Array,
    attention_mask: Optional[Array] = None,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    compute_dtype=jnp.float32,
    precision=None,
    remat: bool = False,
    rand_attn: Optional[np.ndarray] = None,
    attention_impl: str = "xla",
    prot_attention_impl: Optional[str] = None,
    trunk_attention_type: Optional[str] = None,
    trunk_attention_impl: str = "flash",
    sparse_impl: str = "auto",
    cls_only: bool = False,
    tp_mesh=None,
) -> Tuple[Array, Array]:
    """``trunk_attention_type="original_full"`` replaces block-sparse with
    dense flash attention — measured 1.8x faster at 4096 on v5e, but only
    valid for models trained (or fine-tuned) with full attention; the
    default stays block-sparse for checkpoint parity."""
    if not deterministic and dropout_rng is not None:
        r_back, r_trunk = jax.random.split(dropout_rng)
    else:
        r_back = r_trunk = None
    inputs_embeds = backbone_embeddings(
        params, cfg, input_ids,
        deterministic=deterministic, dropout_rng=r_back,
        compute_dtype=compute_dtype, precision=precision,
        attention_impl=attention_impl,
        prot_attention_impl=prot_attention_impl,
        tp_mesh=tp_mesh,
    )
    return bigbird.bigbird_model(
        params["trunk"], cfg.trunk,
        inputs_embeds=inputs_embeds,
        attention_mask=attention_mask,
        deterministic=deterministic, dropout_rng=r_trunk,
        compute_dtype=compute_dtype, precision=precision,
        remat=remat, with_pooler=True, rand_attn=rand_attn,
        attention_type=trunk_attention_type,
        attention_impl=trunk_attention_impl,
        sparse_impl=sparse_impl, cls_only=cls_only,
    )


def pretraining_logits(
    params: dict, cfg: ProtSTonKGsConfig,
    input_ids: Array, attention_mask: Optional[Array] = None, **kw,
) -> Tuple[Array, Array, Array, Array]:
    """(mlm, elm, prot) dense logits + pooled (reference-shaped)."""
    seq, pooled = trunk_forward(params, cfg, input_ids, attention_mask, **kw)
    precision = kw.get("precision")
    p = params["cls"]["predictions"]
    t = elm_transform(p, seq, cfg.trunk, precision)
    mlm = elm_decode_segment(p, t[:, : cfg.kg_start_idx], "text", precision)
    elm = elm_decode_segment(
        p, t[:, cfg.kg_start_idx: cfg.prot_start_idx], "entity", precision)
    prot = elm_decode_segment(p, t[:, cfg.prot_start_idx:], "prot", precision)
    return mlm, elm, prot, pooled


def pretraining_loss(
    params: dict,
    cfg: ProtSTonKGsConfig,
    batch: dict,
    *,
    dense_heads: bool = False,
    **kw,
) -> Tuple[Array, dict]:
    """MLM + ELM + ProtLM loss (no NSP; ``protstonkgs_model.py:322-345``)."""
    precision = kw.get("precision")
    seq, _ = trunk_forward(
        params, cfg, batch["input_ids"], batch.get("attention_mask"), **kw
    )
    p = params["cls"]["predictions"]
    segs = [
        ("text", (0, cfg.kg_start_idx), cfg.lm_vocab_size,
         batch["masked_lm_labels"]),
        ("entity", (cfg.kg_start_idx, cfg.prot_start_idx), cfg.kg_vocab_size,
         batch["ent_masked_lm_labels"]),
        ("prot", (cfg.prot_start_idx, cfg.seq_len), cfg.prot_vocab_size,
         batch["prot_masked_lm_labels"]),
    ]
    from stonkgs_tpu.parallel import tp

    tp_mesh = kw.get("tp_mesh")
    losses = {}
    total = 0.0
    for name, (a, b), vocab, labels in segs:
        if dense_heads:
            logits = elm_decode_segment(
                p, elm_transform(p, seq[:, a:b], cfg.trunk, precision),
                name, precision)[..., :vocab]
            loss = masked_cross_entropy(logits, labels)
        else:
            k = max(int((b - a) * 0.15), 1)
            h, lab, _ = gather_masked_positions(seq[:, a:b], labels, k)
            t = elm_transform(p, h, cfg.trunk, precision)
            if tp.has_model_axis(tp_mesh):
                # vocab-parallel decode (see stonkgs.pretraining_loss)
                loss = tp.tp_decode_cross_entropy(
                    p, t, lab, name, vocab, tp_mesh)
            else:
                loss = masked_cross_entropy(
                    elm_decode_segment(p, t, name, precision)[..., :vocab], lab)
        losses[f"{name}_loss"] = loss
        total = total + loss
    losses["loss"] = total
    return total, losses


def classification_logits(
    params: dict, cfg: ProtSTonKGsConfig, batch: dict,
    *, deterministic: bool = True, dropout_rng: Optional[Array] = None, **kw,
) -> Array:
    """Sequence-classification forward (protstonkgs_finetuning.py:241-372)."""
    if not deterministic and dropout_rng is not None:
        r_trunk, r_cls = jax.random.split(dropout_rng)
    else:
        r_trunk = r_cls = None
    kw.setdefault("cls_only", deterministic)  # eval: skip last-layer rows
    _, pooled = trunk_forward(
        params, cfg, batch["input_ids"], batch.get("attention_mask"),
        deterministic=deterministic, dropout_rng=r_trunk, **kw,
    )
    return classifier_head(
        params["classifier"], pooled,
        dropout_prob=cfg.trunk.hidden_dropout_prob,
        dropout_rng=r_cls, deterministic=deterministic,
        precision=kw.get("precision"),
    )


def classification_loss(
    params: dict, cfg: ProtSTonKGsConfig, batch: dict, **kw
) -> Tuple[Array, dict]:
    """Cross-entropy + accuracy for ProtSTonKGs classification."""
    logits = classification_logits(params, cfg, batch, **kw)
    loss = masked_cross_entropy(logits, batch["labels"])
    accuracy = jnp.mean(
        (jnp.argmax(logits, axis=-1) == batch["labels"]).astype(jnp.float32))
    return loss, {"loss": loss, "accuracy": accuracy}
