"""Parity against the reference's OWN torch classes (not a rewritten golden).

Imports ``/root/reference/src`` model code byte-for-byte (via
``reference_loader``'s constants/dep stubs), instantiates the real
``STonKGsForPreTraining`` / ``STonKGsForSequenceClassification`` /
``ProtSTonKGsForPreTraining`` at small configs with synthetic KG artifacts,
and asserts the JAX forward / losses match to fp32 tolerance.

Reference: ``stonkgs_model.py:76-258``, ``stonkgs_finetuning.py:237-346``,
``protstonkgs_model.py:104-357``.
"""

import numpy as np
import pandas as pd
import pytest
import torch
import transformers

from reference_loader import install_reference_package, load_reference_module

from stonkgs_tpu.config import (
    BertConfig,
    BigBirdConfig,
    ProtSTonKGsConfig,
    STonKGsConfig,
)
from stonkgs_tpu.models import protstonkgs, stonkgs
from stonkgs_tpu.utils.hf_loader import (
    protstonkgs_params_from_state_dict,
    stonkgs_params_from_state_dict,
)

# Tiny-but-real shapes. KG vocab must be >= 101 so the reference's
# numeric_indices.remove(100/102/103) succeeds (stonkgs_model.py:123-129).
VOCAB, HID, LAYERS, HEADS, INTER, MAXPOS = 120, 32, 2, 4, 64, 32
KGN = 150
TEXT_LEN = ENT_LEN = MAXPOS // 2


def _write_vocab(path, size):
    tokens = [f"[unused{i}]" for i in range(size)]
    tokens[0] = "[PAD]"
    tokens[100], tokens[101], tokens[102], tokens[103] = (
        "[UNK]", "[CLS]", "[SEP]", "[MASK]")
    path.write_text("\n".join(tokens) + "\n")


def _write_kg_tsv(path, n, dim, seed=7):
    rng = np.random.default_rng(seed)
    names = [f"p(HGNC:{i} ! G{i})" for i in range(n)]
    vecs = rng.normal(size=(n, dim)).astype(np.float32) * 0.2
    pd.DataFrame(vecs, index=names).to_csv(path, sep="\t", header=False)
    return vecs


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """Fixture artifacts + the imported reference modules."""
    root = tmp_path_factory.mktemp("ref_fixtures")

    biobert = root / "biobert"
    hf_cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS, type_vocab_size=2,
    )
    torch.manual_seed(0)
    transformers.BertModel(hf_cfg).save_pretrained(biobert)
    _write_vocab(biobert / "vocab.txt", VOCAB)

    kg_path = root / "embeddings_best_model.tsv"
    kg_vecs = _write_kg_tsv(kg_path, KGN, HID)

    # tiny ProtBERT backbone (different hidden size to exercise the
    # prot->hidden projection) and a BigBird trunk config dir
    protbert = root / "protbert"
    prot_cfg = transformers.BertConfig(
        vocab_size=30, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=MAXPOS, type_vocab_size=2,
    )
    torch.manual_seed(1)
    transformers.BertModel(prot_cfg).save_pretrained(protbert)

    bigbird = root / "bigbird"
    bb_cfg = transformers.BigBirdConfig(
        vocab_size=90, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=64, type_vocab_size=2,
        attention_type="original_full", block_size=4, num_random_blocks=2,
    )
    bigbird.mkdir()
    (bigbird / "config.json").write_text(bb_cfg.to_json_string())

    install_reference_package({
        "_fixture_root": str(root),
        "NLP_MODEL_TYPE": str(biobert),
        "PROTSTONKGS_MODEL_TYPE": str(bigbird),
        "PROT_SEQ_MODEL_TYPE": str(protbert),
        "EMBEDDINGS_PATH": str(kg_path),
        "PROT_EMBEDDINGS_PATH": str(kg_path),
        "VOCAB_FILE": str(biobert / "vocab.txt"),
        "RANDOM_WALKS_PATH": str(root / "random_walks_best_model.tsv"),
        "MLFLOW_TRACKING_URI": None,
        "MLFLOW_FINETUNING_TRACKING_URI": None,
        "LOCAL_EXECUTION": "True",
    })
    mod = load_reference_module("stonkgs.models.stonkgs_model")
    ft = load_reference_module("stonkgs.models.stonkgs_finetuning")
    return {
        "root": root, "biobert": str(biobert), "protbert": str(protbert),
        "bigbird": str(bigbird), "kg_path": str(kg_path), "kg_vecs": kg_vecs,
        "mod": mod, "ft": ft,
    }


def _jax_cfg(num_labels=None):
    return STonKGsConfig(
        bert=BertConfig(
            vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, intermediate_size=INTER,
            max_position_embeddings=MAXPOS,
        ),
        kg_vocab_size=KGN, text_len=TEXT_LEN, entity_len=ENT_LEN,
        num_labels=num_labels,
    )


def _batch(rng, batch_size, text_vocab=VOCAB, kg_table=KGN + 3,
           text_len=TEXT_LEN, ent_len=ENT_LEN):
    text = rng.integers(0, text_vocab, (batch_size, text_len))
    ent = rng.integers(0, kg_table, (batch_size, ent_len))
    ids = np.concatenate([text, ent], axis=1).astype(np.int64)
    mask = np.ones_like(ids)
    mask[:, text_len - 3: text_len] = 0  # some padded text positions
    tt = np.concatenate(
        [np.zeros((batch_size, text_len), np.int64),
         np.ones((batch_size, ent_len), np.int64)], axis=1)
    return ids, mask, tt


def _labels(rng, ids, text_vocab=VOCAB, kg_vocab=KGN,
            text_len=TEXT_LEN, ent_len=ENT_LEN):
    B = ids.shape[0]
    mlm = np.full((B, text_len), -100, np.int64)
    elm = np.full((B, ent_len), -100, np.int64)
    mlm[:, 1:3] = rng.integers(0, text_vocab, (B, 2))
    elm[:, 2:4] = rng.integers(0, kg_vocab, (B, 2))
    nsp = rng.integers(0, 2, (B,)).astype(np.int64)
    return mlm, elm, nsp


def _convert(model, cfg, kg_vecs):
    sd = {k: v for k, v in model.state_dict().items()}
    params = stonkgs_params_from_state_dict(sd, cfg)
    params["kg_backbone"] = stonkgs.build_kg_table(
        params["lm_backbone"], cfg.bert, kg_vecs)
    return params


def test_pretraining_forward_parity(ref):
    torch.manual_seed(11)
    model = ref["mod"].STonKGsForPreTraining(
        config=None, nlp_model_type=ref["biobert"],
        kg_embedding_dict_path=ref["kg_path"])
    model.eval()

    rng = np.random.default_rng(3)
    ids, mask, tt = _batch(rng, 3)
    mlm, elm, nsp = _labels(rng, ids)

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt),
            masked_lm_labels=torch.tensor(mlm),
            ent_masked_lm_labels=torch.tensor(elm),
            next_sentence_labels=torch.tensor(nsp),
            return_dict=True)
    t_mlm, t_elm = out.prediction_logits
    t_nsp, t_pool = out.seq_relationship_logits, out.pooler_output

    cfg = _jax_cfg()
    params = _convert(model, cfg, ref["kg_vecs"])
    j_mlm, j_elm, j_nsp, j_pool = stonkgs.pretraining_logits(
        params, cfg, ids, mask, tt)
    batch = {
        "input_ids": ids, "attention_mask": mask, "token_type_ids": tt,
        "masked_lm_labels": mlm, "ent_masked_lm_labels": elm,
        "next_sentence_labels": nsp,
    }
    j_loss, _ = stonkgs.pretraining_loss(params, cfg, batch, dense_heads=True)

    for name, t, j in [("mlm", t_mlm, j_mlm), ("elm", t_elm, j_elm),
                       ("nsp", t_nsp, j_nsp), ("pool", t_pool, j_pool)]:
        d = np.abs(t.numpy() - np.asarray(j)).max()
        assert d < 1e-5, f"{name} max dev {d}"
    assert abs(float(out.loss) - float(j_loss)) < 1e-5


def test_gathered_head_loss_matches_reference(ref):
    """The masked-position-gather loss path (the one training uses) equals
    the reference's dense CE when exactly the gathered positions are
    labeled."""
    torch.manual_seed(13)
    model = ref["mod"].STonKGsForPreTraining(
        config=None, nlp_model_type=ref["biobert"],
        kg_embedding_dict_path=ref["kg_path"])
    model.eval()

    rng = np.random.default_rng(5)
    ids, mask, tt = _batch(rng, 2)
    mlm, elm, nsp = _labels(rng, ids)
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt),
            masked_lm_labels=torch.tensor(mlm),
            ent_masked_lm_labels=torch.tensor(elm),
            next_sentence_labels=torch.tensor(nsp),
            return_dict=True)

    cfg = _jax_cfg()
    params = _convert(model, cfg, ref["kg_vecs"])
    batch = {
        "input_ids": ids, "attention_mask": mask, "token_type_ids": tt,
        "masked_lm_labels": mlm, "ent_masked_lm_labels": elm,
        "next_sentence_labels": nsp,
    }
    j_loss, _ = stonkgs.pretraining_loss(
        params, cfg, batch, dense_heads=False,
        max_text_predictions=4, max_entity_predictions=4)
    assert abs(float(out.loss) - float(j_loss)) < 1e-5


def test_classification_parity(ref):
    num_labels = 5
    hf_cfg = transformers.BertConfig.from_pretrained(ref["biobert"])
    hf_cfg.num_labels = num_labels
    torch.manual_seed(17)
    model = ref["ft"].STonKGsForSequenceClassification(
        hf_cfg, nlp_model_type=ref["biobert"],
        kg_embedding_dict_path=ref["kg_path"])
    model.eval()

    rng = np.random.default_rng(9)
    ids, mask, tt = _batch(rng, 4)
    labels = rng.integers(0, num_labels, (4,)).astype(np.int64)
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt), labels=torch.tensor(labels),
            return_dict=True)

    cfg = _jax_cfg(num_labels=num_labels)
    params = _convert(model, cfg, ref["kg_vecs"])
    batch = {"input_ids": ids, "attention_mask": mask, "token_type_ids": tt,
             "labels": labels}
    j_logits = stonkgs.classification_logits(params, cfg, batch)
    j_loss, _ = stonkgs.classification_loss(params, cfg, batch)
    d = np.abs(out.logits.numpy() - np.asarray(j_logits)).max()
    assert d < 1e-5, f"logits max dev {d}"
    assert abs(float(out.loss) - float(j_loss)) < 1e-5


def test_protstonkgs_pretraining_parity(ref):
    mod = load_reference_module("stonkgs.models.protstonkgs_model")

    class _FakeBigBirdTok:
        sep_token_id, mask_token_id, unk_token_id = 66, 67, 100

        @classmethod
        def from_pretrained(cls, *a, **k):
            return cls()

    # sentencepiece is not installed; the tokenizer is only used for its
    # 3 special ids (protstonkgs_model.py:162-168)
    orig_tok = mod.BigBirdTokenizer
    mod.BigBirdTokenizer = _FakeBigBirdTok
    try:
        torch.manual_seed(23)
        kg_start, prot_start, seq_len = 24, 32, 48
        model = mod.ProtSTonKGsForPreTraining(
            config=None,
            protstonkgs_model_type=ref["bigbird"],
            lm_model_type=ref["biobert"],
            lm_vocab_size=VOCAB,
            prot_start_idx=prot_start,
            prot_model_type=ref["protbert"],
            prot_vocab_size=30,
            kg_start_idx=kg_start,
            kg_embedding_dict_path=ref["kg_path"])
        model.eval()
    finally:
        mod.BigBirdTokenizer = orig_tok

    rng = np.random.default_rng(21)
    B = 2
    text = rng.integers(0, VOCAB, (B, kg_start))
    ent = rng.integers(0, KGN + 3, (B, prot_start - kg_start))
    prot = rng.integers(0, 30, (B, seq_len - prot_start))
    ids = np.concatenate([text, ent, prot], axis=1).astype(np.int64)
    mask = np.ones_like(ids)
    mask[:, seq_len - 2:] = 0
    mlm = np.full((B, kg_start), -100, np.int64)
    elm = np.full((B, prot_start - kg_start), -100, np.int64)
    plm = np.full((B, seq_len - prot_start), -100, np.int64)
    mlm[:, 1:3] = rng.integers(0, VOCAB, (B, 2))
    elm[:, 2:4] = rng.integers(0, KGN, (B, 2))
    plm[:, 3:5] = rng.integers(0, 30, (B, 2))

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            masked_lm_labels=torch.tensor(mlm),
            ent_masked_lm_labels=torch.tensor(elm),
            prot_masked_lm_labels=torch.tensor(plm),
            return_dict=True)
    t_mlm, t_elm, t_prot = out.prediction_logits

    cfg = ProtSTonKGsConfig(
        trunk=BigBirdConfig(
            vocab_size=90, hidden_size=HID, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, intermediate_size=INTER,
            max_position_embeddings=64, attention_type="original_full",
            block_size=4, num_random_blocks=2,
        ),
        lm=BertConfig(
            vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, intermediate_size=INTER,
            max_position_embeddings=MAXPOS,
        ),
        prot=BertConfig(
            vocab_size=30, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=48,
            max_position_embeddings=MAXPOS,
        ),
        lm_vocab_size=VOCAB, kg_vocab_size=KGN, prot_vocab_size=30,
        kg_start_idx=kg_start, prot_start_idx=prot_start, seq_len=seq_len,
        sep_id=66, mask_id=67, unk_id=100,
    )
    sd = {k: v for k, v in model.state_dict().items()}
    params = protstonkgs_params_from_state_dict(sd, cfg)
    params["kg_backbone"] = protstonkgs.build_kg_table(
        params["lm_backbone"], cfg, ref["kg_vecs"])

    j_mlm, j_elm, j_prot, j_pool = protstonkgs.pretraining_logits(
        params, cfg, ids, mask,
        trunk_attention_impl="xla", prot_attention_impl="xla")
    batch = {
        "input_ids": ids, "attention_mask": mask,
        "masked_lm_labels": mlm, "ent_masked_lm_labels": elm,
        "prot_masked_lm_labels": plm,
    }
    j_loss, _ = protstonkgs.pretraining_loss(
        params, cfg, batch, dense_heads=True,
        trunk_attention_impl="xla", prot_attention_impl="xla")

    for name, t, j in [("mlm", t_mlm, j_mlm), ("elm", t_elm, j_elm),
                       ("prot", t_prot, j_prot),
                       ("pool", out.pooler_output, j_pool)]:
        d = np.abs(t.numpy() - np.asarray(j)).max()
        assert d < 1e-5, f"{name} max dev {d}"
    assert abs(float(out.loss) - float(j_loss)) < 1e-5


def test_bert_base_scale_parity(ref, tmp_path):
    """Full BERT-base-scale parity (12L / 768h / 28996 vocab / seq 512)
    against the reference class — the BASELINE <1e-5 fidelity target at the
    real model scale, on the embedding-extraction (pooler) path."""
    biobert = tmp_path / "biobert_base"
    hf_cfg = transformers.BertConfig()  # BERT-base, vocab 30522
    hf_cfg.vocab_size = 28996  # BioBERT vocab
    torch.manual_seed(31)
    transformers.BertModel(hf_cfg).save_pretrained(biobert)
    _write_vocab(biobert / "vocab.txt", 28996)

    kg_path = tmp_path / "kg_base.tsv"
    kg_vecs = _write_kg_tsv(kg_path, 120, 768, seed=33)

    torch.manual_seed(37)
    model = ref["mod"].STonKGsForPreTraining(
        config=None, nlp_model_type=str(biobert),
        kg_embedding_dict_path=str(kg_path))
    model.eval()

    rng = np.random.default_rng(35)
    ids, mask, tt = _batch(rng, 2, text_vocab=28996, kg_table=123,
                           text_len=256, ent_len=256)
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt), return_dict=True)

    cfg = STonKGsConfig(
        bert=BertConfig(vocab_size=28996), kg_vocab_size=120,
        text_len=256, entity_len=256)
    params = _convert(model, cfg, kg_vecs)
    batch = {"input_ids": ids, "attention_mask": mask, "token_type_ids": tt}
    j_pool = stonkgs.pooler_output(params, cfg, batch)
    d = np.abs(out.pooler_output.numpy() - np.asarray(j_pool)).max()
    assert d < 1e-5, f"pooler max dev at BERT-base scale: {d}"

    j_nsp = np.asarray(stonkgs.pretraining_logits(params, cfg, ids, mask, tt)[2])
    d_nsp = np.abs(out.seq_relationship_logits.numpy() - j_nsp).max()
    assert d_nsp < 1e-5, f"nsp max dev at BERT-base scale: {d_nsp}"


def test_preprocess_fine_tuning_data_parity(ref, tmp_path):
    """The reference's own pandas/HF-tokenizer preprocessing vs our batched
    C++-tokenizer path — token-exact on input_ids/attention/token_type and
    labels (no masking on this path; reference
    ``stonkgs_finetuning.py:92-210``)."""
    from stonkgs_tpu.data.artifacts import KGArtifacts, save_kg_artifacts
    from stonkgs_tpu.data.fast_tokenizer import FastBertTokenizer
    from stonkgs_tpu.data.preprocessing import preprocess_for_finetuning

    # vocab with real words + subword pieces (same file drives both sides)
    words = ["akt1", "mtor", "gsk3b", "phosphorylates", "activates",
             "inhibits", "signaling", "pathway", "the", "via", "kinase"]
    vocab = (["[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + words + ["##s", "##ing", "##ylates", "phosphor", "activ",
                        "##ates"])
    vocab_file = tmp_path / "vocab_ft.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")

    # KG artifacts: rw_len 7 -> half_length 16
    rng = np.random.default_rng(11)
    n = 12
    names = [f"p(HGNC:{i} ! G{i})" for i in range(n)]
    artifacts = KGArtifacts(
        names=names, name_to_idx={m: i for i, m in enumerate(names)},
        vectors=rng.normal(size=(n, 8)).astype(np.float32),
        walk_indices=rng.integers(0, n, (n, 7), dtype=np.int32),
        rw_len=7)
    emb_path = tmp_path / "ft_emb.tsv"
    walks_path = tmp_path / "ft_walks.tsv"
    save_kg_artifacts(artifacts, emb_path, walks_path)

    rows = [
        (names[0], names[1], "AKT1 phosphorylates GSK3B via the pathway", 0),
        (names[2], names[3],
         "the kinase activates signaling " * 5, 2),  # truncation
        ("p(HGNC:999 ! ZZZ)", names[4], "inhibits the pathway", 1),  # dropped
        (names[5], names[6], "MTOR signaling", 1),
    ]
    tsv = tmp_path / "task.tsv"
    pd.DataFrame(rows, columns=["source", "target", "evidence", "class"]
                 ).to_csv(tsv, sep="\t", index=False)

    # the reference's fast-tokenizer branch reads the VOCAB_FILE constant
    # bound at module import; point it at the SAME vocab file ours uses
    ref["ft"].VOCAB_FILE = str(vocab_file)
    ref_df = ref["ft"].preprocess_fine_tuning_data(
        str(tsv),
        embedding_name_to_vector_path=str(emb_path),
        embedding_name_to_random_walk_path=str(walks_path),
    )

    kept = [r for r in rows if r[0] in artifacts.name_to_idx
            and r[1] in artifacts.name_to_idx]
    src = np.asarray([r[0] for r in kept], object)
    tgt = np.asarray([r[1] for r in kept], object)
    ev = [r[2] for r in kept]
    labels = np.asarray([r[3] for r in kept])
    ours = preprocess_for_finetuning(
        src, tgt, ev, labels, artifacts, FastBertTokenizer(str(vocab_file)))

    assert len(ref_df) == len(kept) == 3
    for col in ("input_ids", "attention_mask", "token_type_ids"):
        ref_arr = np.asarray([list(v) for v in ref_df[col]])
        np.testing.assert_array_equal(ref_arr, ours[col], err_msg=col)
    np.testing.assert_array_equal(np.asarray(ref_df["labels"]), ours["labels"])


def test_transestonkgs_pretraining_parity(ref, tmp_path):
    """TransESTonKGs parity vs the reference's own class: the model forces
    ``max_position_embeddings=260`` with a 256+[h,r,t,SEP] layout
    (``transestonkgs_model.py:70-137``), so the LM backbone fixture needs
    >= 256 positions."""
    mod = load_reference_module("stonkgs.models.transestonkgs_model")

    biobert = tmp_path / "biobert300"
    hf_cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=300, type_vocab_size=2,
    )
    torch.manual_seed(29)
    transformers.BertModel(hf_cfg).save_pretrained(biobert)
    _write_vocab(biobert / "vocab.txt", VOCAB)

    torch.manual_seed(31)
    model = mod.TransESTonKGsForPreTraining(
        config=None, nlp_model_type=str(biobert),
        kg_embedding_dict_path=ref["kg_path"])
    model.eval()

    rng = np.random.default_rng(33)
    B, text_len, ent_len = 2, 256, 4
    text = rng.integers(0, VOCAB, (B, text_len))
    ent = rng.integers(0, KGN + 3, (B, ent_len))
    ids = np.concatenate([text, ent], axis=1).astype(np.int64)
    mask = np.ones_like(ids)
    mask[:, text_len - 5: text_len] = 0
    tt = np.concatenate(
        [np.zeros((B, text_len), np.int64), np.ones((B, ent_len), np.int64)],
        axis=1)
    mlm = np.full((B, text_len), -100, np.int64)
    elm = np.full((B, ent_len), -100, np.int64)
    mlm[:, 1:4] = rng.integers(0, VOCAB, (B, 3))
    elm[:, 1:2] = rng.integers(0, KGN, (B, 1))
    nsp = rng.integers(0, 2, (B,)).astype(np.int64)

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt),
            masked_lm_labels=torch.tensor(mlm),
            ent_masked_lm_labels=torch.tensor(elm),
            next_sentence_labels=torch.tensor(nsp),
            return_dict=True)
    t_mlm, t_elm = out.prediction_logits

    cfg = STonKGsConfig(
        bert=BertConfig(
            vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, intermediate_size=INTER,
            max_position_embeddings=260,
        ),
        kg_vocab_size=KGN, text_len=text_len, entity_len=ent_len,
    )
    params = _convert(model, cfg, ref["kg_vecs"])
    j_mlm, j_elm, j_nsp, j_pool = stonkgs.pretraining_logits(
        params, cfg, ids, mask, tt)
    batch = {
        "input_ids": ids, "attention_mask": mask, "token_type_ids": tt,
        "masked_lm_labels": mlm, "ent_masked_lm_labels": elm,
        "next_sentence_labels": nsp,
    }
    j_loss, _ = stonkgs.pretraining_loss(params, cfg, batch, dense_heads=True)

    for name, t, j in [("mlm", t_mlm, j_mlm), ("elm", t_elm, j_elm),
                       ("nsp", out.seq_relationship_logits, j_nsp),
                       ("pool", out.pooler_output, j_pool)]:
        d = np.abs(t.numpy() - np.asarray(j)).max()
        assert d < 1e-5, f"{name} max dev {d}"
    assert abs(float(out.loss) - float(j_loss)) < 1e-5


def test_protstonkgs_classification_parity(ref):
    """ProtSTonKGs sequence classification vs the reference's own class
    (``protstonkgs_finetuning.py:241-372``)."""
    pre = load_reference_module("stonkgs.models.protstonkgs_model")
    ftm = load_reference_module("stonkgs.models.protstonkgs_finetuning")

    class _FakeBigBirdTok:
        sep_token_id, mask_token_id, unk_token_id = 66, 67, 100

        @classmethod
        def from_pretrained(cls, *a, **k):
            return cls()

    kg_start, prot_start, seq_len = 24, 32, 48
    num_labels = 3
    bb_cfg = transformers.BigBirdConfig.from_pretrained(ref["bigbird"])
    bb_cfg.num_labels = num_labels

    orig = pre.BigBirdTokenizer
    pre.BigBirdTokenizer = _FakeBigBirdTok
    try:
        torch.manual_seed(37)
        model = ftm.ProtSTonKGsForSequenceClassification(
            bb_cfg,
            protstonkgs_model_type=ref["bigbird"],
            lm_model_type=ref["biobert"],
            lm_vocab_size=VOCAB,
            prot_start_idx=prot_start,
            prot_model_type=ref["protbert"],
            prot_vocab_size=30,
            kg_start_idx=kg_start,
            kg_embedding_dict_path=ref["kg_path"])
        model.eval()
    finally:
        pre.BigBirdTokenizer = orig

    rng = np.random.default_rng(41)
    B = 2
    text = rng.integers(0, VOCAB, (B, kg_start))
    ent = rng.integers(0, KGN + 3, (B, prot_start - kg_start))
    prot = rng.integers(0, 30, (B, seq_len - prot_start))
    ids = np.concatenate([text, ent, prot], axis=1).astype(np.int64)
    mask = np.ones_like(ids)
    mask[:, seq_len - 3:] = 0
    labels = rng.integers(0, num_labels, (B,)).astype(np.int64)

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            labels=torch.tensor(labels), return_dict=True)

    cfg = ProtSTonKGsConfig(
        trunk=BigBirdConfig(
            vocab_size=90, hidden_size=HID, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, intermediate_size=INTER,
            max_position_embeddings=64, attention_type="original_full",
            block_size=4, num_random_blocks=2,
        ),
        lm=BertConfig(
            vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, intermediate_size=INTER,
            max_position_embeddings=MAXPOS,
        ),
        prot=BertConfig(
            vocab_size=30, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=48,
            max_position_embeddings=MAXPOS,
        ),
        lm_vocab_size=VOCAB, kg_vocab_size=KGN, prot_vocab_size=30,
        kg_start_idx=kg_start, prot_start_idx=prot_start, seq_len=seq_len,
        sep_id=66, mask_id=67, unk_id=100, num_labels=num_labels,
    )
    sd = {k: v for k, v in model.state_dict().items()}
    params = protstonkgs_params_from_state_dict(sd, cfg)
    params["kg_backbone"] = protstonkgs.build_kg_table(
        params["lm_backbone"], cfg, ref["kg_vecs"])

    batch = {"input_ids": ids, "attention_mask": mask, "labels": labels}
    j_logits = protstonkgs.classification_logits(
        params, cfg, batch,
        trunk_attention_impl="xla", prot_attention_impl="xla")
    j_loss, _ = protstonkgs.classification_loss(
        params, cfg, batch,
        trunk_attention_impl="xla", prot_attention_impl="xla")
    d = np.abs(out.logits.numpy() - np.asarray(j_logits)).max()
    assert d < 1e-5, f"logits max dev {d}"
    assert abs(float(out.loss) - float(j_loss)) < 1e-5


def test_transestonkgs_classification_parity(ref, tmp_path):
    """TransESTonKGs sequence classification vs the reference's own class
    (``transestonkgs_finetuning.py:187-298``)."""
    load_reference_module("stonkgs.models.transestonkgs_model")
    ftm = load_reference_module("stonkgs.models.transestonkgs_finetuning")

    biobert = tmp_path / "biobert300c"
    hf_back = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=300, type_vocab_size=2,
    )
    torch.manual_seed(43)
    transformers.BertModel(hf_back).save_pretrained(biobert)
    _write_vocab(biobert / "vocab.txt", VOCAB)

    num_labels = 4
    trunk_cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=260, type_vocab_size=2,
        num_labels=num_labels,
    )
    torch.manual_seed(47)
    model = ftm.TransESTonKGsForSequenceClassification(
        trunk_cfg, nlp_model_type=str(biobert),
        kg_embedding_dict_path=ref["kg_path"])
    model.eval()

    rng = np.random.default_rng(51)
    B, text_len, ent_len = 2, 256, 4
    text = rng.integers(0, VOCAB, (B, text_len))
    ent = rng.integers(0, KGN + 3, (B, ent_len))
    ids = np.concatenate([text, ent], axis=1).astype(np.int64)
    mask = np.ones_like(ids)
    mask[:, text_len - 7: text_len] = 0
    tt = np.concatenate(
        [np.zeros((B, text_len), np.int64), np.ones((B, ent_len), np.int64)],
        axis=1)
    labels = rng.integers(0, num_labels, (B,)).astype(np.int64)

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt), labels=torch.tensor(labels),
            return_dict=True)

    cfg = STonKGsConfig(
        bert=BertConfig(
            vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, intermediate_size=INTER,
            max_position_embeddings=260,
        ),
        kg_vocab_size=KGN, text_len=text_len, entity_len=ent_len,
        num_labels=num_labels,
    )
    params = _convert(model, cfg, ref["kg_vecs"])
    batch = {"input_ids": ids, "attention_mask": mask, "token_type_ids": tt,
             "labels": labels}
    j_logits = stonkgs.classification_logits(params, cfg, batch)
    j_loss, _ = stonkgs.classification_loss(params, cfg, batch)
    d = np.abs(out.logits.numpy() - np.asarray(j_logits)).max()
    assert d < 1e-5, f"logits max dev {d}"
    assert abs(float(out.loss) - float(j_loss)) < 1e-5
