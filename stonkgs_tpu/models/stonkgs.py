"""STonKGs: dual-modality (text + KG) BERT, TPU-native.

Re-implementation of ``STonKGsForPreTraining`` / ``STonKGsForSequenceClassification``
(``/root/reference/src/stonkgs/models/stonkgs_model.py:76-258``,
``stonkgs_finetuning.py:237-346``) and the TransE variant
(``transestonkgs_model.py``, which differs only in sequence layout 256+4).

TPU-first differences from the reference (behavior preserved, implementation not):
  * The per-token Python dict lookup over the KG backbone (the reference's
    hot loop, ``stonkgs_model.py:182-189``) becomes a single vectorized
    gather from a ``(kg_vocab+3, H)`` embedding table that XLA fuses into
    the forward pass.  The table layout replicates the reference's index
    space exactly: rows 100/102/103 hold LM-derived special embeddings and
    entity k lives at row ``k + (# special ids <= its row)`` — see
    ``build_kg_table``.
  * The frozen LM backbone and the trainable trunk run inside one jitted
    function; batch size is arbitrary (the reference extracts embeddings at
    batch size 1, ``stonkgs_for_embeddings.py:176-184``).
  * Pre-training losses can decode only the masked positions
    (``gather_masked_positions``) instead of materializing (B, S, kg_vocab)
    logits.

Fidelity quirks replicated:
  * The frozen LM backbone is run *without* an attention mask — it attends
    over PAD positions (``stonkgs_model.py:178``).
  * ELM-head decoder biases exist as parameters but are never added
    (see ``stonkgs_tpu.models.heads``).
  * Special KG-table rows are the LM backbone's output for a length-1
    sequence of the special token id (``stonkgs_model.py:138-141``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import bert
from stonkgs_tpu.models.heads import (
    classifier_head,
    elm_decode_segment,
    elm_head_dense,
    elm_transform,
    init_classifier_head,
    init_elm_head,
    init_nsp_head,
    nsp_head,
)
from stonkgs_tpu.ops.losses import (
    gather_masked_positions,
    masked_cross_entropy,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_stonkgs_params(
    key: Array,
    cfg: STonKGsConfig,
    *,
    with_classifier: bool = False,
    kg_table: Optional[Array] = None,
) -> dict:
    """Initialize the full parameter tree.

    ``kg_table`` is the frozen KG backbone ((kg_vocab+3, H)); if None a
    zero table is created (fill it with ``build_kg_table``).
    """
    k_trunk, k_lm, k_elm, k_nsp, k_cls = jax.random.split(key, 5)
    bcfg = cfg.bert
    params = {
        "trunk": bert.init_bert_params(k_trunk, bcfg, with_pooler=True),
        "lm_backbone": bert.init_bert_params(k_lm, bcfg, with_pooler=True),
        "cls": {
            "predictions": init_elm_head(
                k_elm, bcfg, [bcfg.vocab_size, cfg.kg_vocab_size], ("text", "entity")
            ),
            "seq_relationship": init_nsp_head(k_nsp, bcfg),
        },
        "kg_backbone": (
            kg_table if kg_table is not None
            else jnp.zeros((cfg.kg_table_size, bcfg.hidden_size), jnp.float32)
        ),
    }
    if with_classifier:
        assert cfg.num_labels is not None
        params["classifier"] = init_classifier_head(k_cls, bcfg, cfg.num_labels)
    return params


def kg_row_permutation(n_entities: int, special_ids=(100, 102, 103)) -> np.ndarray:
    """Row index in the KG table for each entity index 0..N-1.

    Replicates the reference mapping (``stonkgs_model.py:120-134``): table
    rows ``sorted(range(N+3)) - special_ids`` receive the entity vectors in
    key order, so entity k sits at row k shifted past any special ids <= it.
    """
    rows = np.setdiff1d(np.arange(n_entities + len(special_ids)), np.asarray(special_ids))
    assert rows.shape[0] == n_entities
    return rows


def build_kg_table(
    lm_params: dict,
    bert_cfg: BertConfig,
    kg_vectors: np.ndarray,       # (N, H) node2vec vectors in key order
    *,
    special_ids: Tuple[int, int, int] = (102, 103, 100),  # sep, mask, unk
    precision=None,
) -> jnp.ndarray:
    """Build the (N+3, H) KG backbone table.

    Special rows hold the LM backbone's hidden state for the length-1
    sequence ``[special_id]`` (reference: ``stonkgs_model.py:138-141``).
    """
    n, h = kg_vectors.shape
    assert h == bert_cfg.hidden_size, (
        f"KG embedding dim {h} != model hidden size {bert_cfg.hidden_size}")
    assert max(special_ids) < bert_cfg.vocab_size, (
        f"special token ids {special_ids} exceed LM vocab "
        f"{bert_cfg.vocab_size} — cannot embed them for the KG table")
    table = np.zeros((n + 3, h), np.float32)
    table[kg_row_permutation(n, special_ids)] = np.asarray(kg_vectors, np.float32)

    ids = jnp.asarray([[s] for s in special_ids], jnp.int32)  # (3, 1)
    seq, _ = bert.bert_model(
        lm_params, bert_cfg, input_ids=ids,
        deterministic=True, precision=precision, with_pooler=False,
    )
    table = jnp.asarray(table).at[jnp.asarray(special_ids)].set(seq[:, 0, :])
    return table


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def backbone_embeddings(
    params: dict,
    cfg: STonKGsConfig,
    input_ids: Array,             # (B, text_len + entity_len)
    *,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    compute_dtype=jnp.float32,
    precision=None,
    attention_impl: str = "xla",
    tp_mesh=None,
) -> Array:
    """Frozen-backbone input embeddings for the trunk: (B, S, H).

    Text half -> frozen LM backbone (NO attention mask, reference quirk);
    entity half -> KG table gather.  With ``tp_mesh`` (a mesh with a
    model axis > 1) the gather runs as the explicit shard_map TP
    embedding lookup (``parallel.tp.tp_gather``) — GSPMD cannot
    partition a plain take against the row-sharded table and would
    all-gather it instead.
    """
    from stonkgs_tpu.parallel import tp

    text_ids = input_ids[:, : cfg.text_len]
    ent_ids = input_ids[:, cfg.text_len:]

    token_embeddings, _ = bert.bert_model(
        params["lm_backbone"], cfg.bert, input_ids=text_ids,
        attention_mask=None,
        deterministic=deterministic, dropout_rng=dropout_rng,
        compute_dtype=compute_dtype, precision=precision,
        attention_impl=attention_impl, with_pooler=False,
    )
    table = params["kg_backbone"].astype(compute_dtype)
    if tp.has_model_axis(tp_mesh):
        ent_embeddings = tp.tp_gather(table, ent_ids, tp_mesh)
    else:
        ent_embeddings = jnp.take(table, ent_ids, axis=0)
    return jnp.concatenate([token_embeddings, ent_embeddings], axis=1)


def trunk_forward(
    params: dict,
    cfg: STonKGsConfig,
    input_ids: Array,
    attention_mask: Optional[Array] = None,
    token_type_ids: Optional[Array] = None,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    compute_dtype=jnp.float32,
    precision=None,
    attention_impl: str = "xla",
    remat: bool = False,
    stop_backbone_gradients: bool = True,
    cls_only: bool = False,
    tp_mesh=None,
    position_ids: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Backbones + trainable trunk. Returns (sequence_output, pooled_output).

    ``stop_backbone_gradients`` mirrors the reference's frozen backbones
    (``requires_grad=False``, ``stonkgs_model.py:113-114``): no gradients
    flow into the LM backbone or KG table, and XLA skips their backward
    entirely.

    ``cls_only``: compute the trunk's last layer only at the [CLS]
    position (pooled-output paths; sequence output becomes (B, 1, H)).

    ``position_ids`` apply to the TRUNK only (the backbone always embeds
    its text at positions 0..text_len-1).  The length-bucketed extraction
    mode passes ``[0..Sb-1, 256..511]`` here so a truncated text half
    keeps the entity half on its original position rows."""
    if not deterministic and dropout_rng is not None:
        r_back, r_trunk = jax.random.split(dropout_rng)
    else:
        r_back = r_trunk = None
    inputs_embeds = backbone_embeddings(
        params, cfg, input_ids,
        deterministic=deterministic, dropout_rng=r_back,
        compute_dtype=compute_dtype, precision=precision,
        attention_impl=attention_impl, tp_mesh=tp_mesh,
    )
    if stop_backbone_gradients:
        inputs_embeds = jax.lax.stop_gradient(inputs_embeds)
    seq, pooled = bert.bert_model(
        params["trunk"], cfg.bert,
        inputs_embeds=inputs_embeds,
        attention_mask=attention_mask,
        token_type_ids=token_type_ids,
        position_ids=position_ids,
        deterministic=deterministic, dropout_rng=r_trunk,
        compute_dtype=compute_dtype, precision=precision,
        attention_impl=attention_impl, remat=remat, with_pooler=True,
        cls_only=cls_only,
    )
    return seq, pooled


def pretraining_logits(
    params: dict,
    cfg: STonKGsConfig,
    input_ids: Array,
    attention_mask: Optional[Array] = None,
    token_type_ids: Optional[Array] = None,
    **kw,
) -> Tuple[Array, Array, Array, Array]:
    """Reference-shaped outputs: (mlm_logits, elm_logits, nsp_logits, pooled)."""
    seq, pooled = trunk_forward(
        params, cfg, input_ids, attention_mask, token_type_ids, **kw
    )
    precision = kw.get("precision")
    mlm, elm = elm_head_dense(
        params["cls"]["predictions"], seq, cfg.bert,
        [(0, cfg.text_len), (cfg.text_len, cfg.seq_len)],
        ("text", "entity"), precision,
    )
    nsp = nsp_head(params["cls"]["seq_relationship"], pooled, precision)
    return mlm, elm, nsp, pooled


def pooler_output(params: dict, cfg: STonKGsConfig, batch: dict, **kw) -> Array:
    """Embedding-extraction path: pooled [CLS] output only (no heads).

    Batched replacement for ``get_stonkgs_embeddings``'s per-row loop
    (reference: ``stonkgs_for_embeddings.py:176-184``). The trunk's last
    layer runs only at the [CLS] position (``cls_only`` — identical
    pooled output, one fewer full layer of compute).
    """
    kw.setdefault("cls_only", kw.get("deterministic", True))
    if "position_ids" in batch:
        kw.setdefault("position_ids", batch["position_ids"])
    _, pooled = trunk_forward(
        params, cfg,
        batch["input_ids"], batch.get("attention_mask"),
        batch.get("token_type_ids"), **kw,
    )
    return pooled


def pretraining_loss(
    params: dict,
    cfg: STonKGsConfig,
    batch: dict,
    *,
    max_text_predictions: Optional[int] = None,
    max_entity_predictions: Optional[int] = None,
    dense_heads: bool = False,
    **kw,
) -> Tuple[Array, dict]:
    """MLM + ELM + NSP loss (sum, reference ``stonkgs_model.py:229-245``).

    With ``dense_heads=False`` only masked positions are decoded — the data
    pipeline masks exactly ``int(0.15 * len)`` positions per half
    (reference ``indra_for_pretraining.py:55-58``), so the gather is lossless.
    """
    precision = kw.get("precision")
    seq, pooled = trunk_forward(
        params, cfg,
        batch["input_ids"], batch.get("attention_mask"),
        batch.get("token_type_ids"), **kw,
    )
    p = params["cls"]["predictions"]
    mlm_labels = batch["masked_lm_labels"]
    elm_labels = batch["ent_masked_lm_labels"]

    # Decoder kernels may be vocab-padded for model-axis sharding
    # (parallel.mesh.pad_params_for_mesh): slice logits to the true vocab.
    tv, ev = cfg.bert.vocab_size, cfg.kg_vocab_size
    from stonkgs_tpu.parallel import tp

    tp_mesh = kw.get("tp_mesh")
    if tp.has_model_axis(tp_mesh) and not dense_heads:
        # vocab-parallel decoders: each model shard holds its (B, K, V/n)
        # logit slice only; logsumexp/label-logit assembled by collectives
        k_text = max_text_predictions or max(int(cfg.text_len * 0.15), 1)
        k_ent = max_entity_predictions or max(int(cfg.entity_len * 0.15), 1)
        text_h, text_l, _ = gather_masked_positions(
            seq[:, : cfg.text_len], mlm_labels, k_text
        )
        ent_h, ent_l, _ = gather_masked_positions(
            seq[:, cfg.text_len:], elm_labels, k_ent
        )
        mlm_loss = tp.tp_decode_cross_entropy(
            p, elm_transform(p, text_h, cfg.bert, precision),
            text_l, "text", tv, tp_mesh)
        elm_loss = tp.tp_decode_cross_entropy(
            p, elm_transform(p, ent_h, cfg.bert, precision),
            ent_l, "entity", ev, tp_mesh)
    elif dense_heads:
        t = elm_transform(p, seq, cfg.bert, precision)
        mlm_logits = elm_decode_segment(p, t[:, : cfg.text_len], "text",
                                        precision)[..., :tv]
        elm_logits = elm_decode_segment(p, t[:, cfg.text_len:], "entity",
                                        precision)[..., :ev]
        mlm_loss = masked_cross_entropy(mlm_logits, mlm_labels)
        elm_loss = masked_cross_entropy(elm_logits, elm_labels)
    else:
        k_text = max_text_predictions or max(int(cfg.text_len * 0.15), 1)
        k_ent = max_entity_predictions or max(int(cfg.entity_len * 0.15), 1)
        text_h, text_l, _ = gather_masked_positions(
            seq[:, : cfg.text_len], mlm_labels, k_text
        )
        ent_h, ent_l, _ = gather_masked_positions(
            seq[:, cfg.text_len:], elm_labels, k_ent
        )
        mlm_loss = masked_cross_entropy(
            elm_decode_segment(p, elm_transform(p, text_h, cfg.bert, precision),
                               "text", precision)[..., :tv],
            text_l,
        )
        elm_loss = masked_cross_entropy(
            elm_decode_segment(p, elm_transform(p, ent_h, cfg.bert, precision),
                               "entity", precision)[..., :ev],
            ent_l,
        )

    nsp_logits = nsp_head(params["cls"]["seq_relationship"], pooled, precision)
    nsp_loss = masked_cross_entropy(nsp_logits, batch["next_sentence_labels"])
    loss = mlm_loss + elm_loss + nsp_loss
    return loss, {
        "loss": loss, "mlm_loss": mlm_loss,
        "elm_loss": elm_loss, "nsp_loss": nsp_loss,
    }


def classification_logits(
    params: dict,
    cfg: STonKGsConfig,
    batch: dict,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    **kw,
) -> Array:
    """Sequence-classification forward (reference ``stonkgs_finetuning.py:258-314``)."""
    if not deterministic and dropout_rng is not None:
        r_trunk, r_cls = jax.random.split(dropout_rng)
    else:
        r_trunk = r_cls = None
    kw.setdefault("cls_only", deterministic)  # eval: skip last-layer rows
    if "position_ids" in batch:
        kw.setdefault("position_ids", batch["position_ids"])
    _, pooled = trunk_forward(
        params, cfg,
        batch["input_ids"], batch.get("attention_mask"),
        batch.get("token_type_ids"),
        deterministic=deterministic, dropout_rng=r_trunk, **kw,
    )
    return classifier_head(
        params["classifier"], pooled,
        dropout_prob=cfg.bert.hidden_dropout_prob,
        dropout_rng=r_cls, deterministic=deterministic,
        precision=kw.get("precision"),
    )


def classification_loss(
    params: dict, cfg: STonKGsConfig, batch: dict, **kw
) -> Tuple[Array, dict]:
    """Cross-entropy + accuracy for STonKGs classification."""
    logits = classification_logits(params, cfg, batch, **kw)
    loss = masked_cross_entropy(logits, batch["labels"])
    accuracy = jnp.mean(
        (jnp.argmax(logits, axis=-1) == batch["labels"]).astype(jnp.float32)
    )
    return loss, {"loss": loss, "accuracy": accuracy}
