"""Length-bucketed extraction speed mode (round-5).

The frozen BioBERT backbone runs over full 256-token padding for every
row in parity mode (reference quirk: no attention mask,
``stonkgs_model.py:178``).  Speed mode buckets rows by true text length
and runs the backbone at the bucket length and the trunk at
``bucket + entity_len`` with explicit position ids so the entity half
keeps its original position rows.

Numerics contract tested here:
  * the TRUNK side of the truncation is EXACT — masked PAD keys receive
    an additive -1e9 bias whose exp underflows to exactly 0 in fp32, and
    position ids pin the entity half to rows 256.. — so running the trunk
    on ``[text[:b], entities]`` equals the full 512 forward given the same
    backbone outputs;
  * the ONLY delta source is the backbone's attend-over-PAD quirk, which
    bucketing re-creates at bucket-width padding instead of 256.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.api.inference import STonKGsEngine
from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import bert, stonkgs

CFG = STonKGsConfig(
    bert=BertConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=48,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ),
    kg_vocab_size=61, text_len=16, entity_len=8,
)


@pytest.fixture(scope="module")
def params():
    p = stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), CFG)
    p["kg_backbone"] = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1),
                          (CFG.kg_table_size, CFG.bert.hidden_size)),
        np.float32)
    return p


def _features(n, lengths, seed=0):
    """Dual-modality features with given true text lengths (incl CLS/SEP)."""
    rng = np.random.default_rng(seed)
    tl, el = CFG.text_len, CFG.entity_len
    text = rng.integers(4, CFG.bert.vocab_size, (n, tl))
    am_text = np.zeros((n, tl), np.int32)
    for i, L in enumerate(lengths):
        am_text[i, :L] = 1
        text[i, L:] = 0  # PAD id
    ent = rng.integers(0, CFG.kg_vocab_size, (n, el))
    return {
        "input_ids": np.concatenate([text, ent], 1).astype(np.int32),
        "attention_mask": np.concatenate(
            [am_text, np.ones((n, el), np.int32)], 1),
        "token_type_ids": np.concatenate(
            [np.zeros((n, tl), np.int32), np.ones((n, el), np.int32)], 1),
    }


def test_trunk_truncation_is_exact(params):
    """Full 512-style forward == trunk on [text[:b] | entities] with
    position ids, GIVEN the same (full-parity) backbone outputs."""
    b = 8  # bucket: rows' true text length <= 8
    n = 4
    feats = _features(n, lengths=[5, 8, 3, 6])
    full_pooled = stonkgs.pooler_output(
        params, CFG, {k: jnp.asarray(v) for k, v in feats.items()},
        compute_dtype=jnp.float32)

    # oracle: full-parity backbone embeddings, then the trunk over the
    # sliced sequence with explicit position ids
    embeds = stonkgs.backbone_embeddings(
        params, CFG, jnp.asarray(feats["input_ids"]),
        compute_dtype=jnp.float32)
    tl = CFG.text_len
    keep = np.concatenate([np.arange(b), np.arange(tl, tl + CFG.entity_len)])
    _, pooled_trunc = bert.bert_model(
        params["trunk"], CFG.bert,
        inputs_embeds=embeds[:, keep],
        attention_mask=jnp.asarray(feats["attention_mask"][:, keep]),
        token_type_ids=jnp.asarray(feats["token_type_ids"][:, keep]),
        position_ids=jnp.asarray(keep[None]),
        compute_dtype=jnp.float32, with_pooler=True,
    )
    np.testing.assert_allclose(
        np.asarray(full_pooled), np.asarray(pooled_trunc),
        atol=2e-5, rtol=1e-5)


def _expected_bucketed(params, feats, bucket):
    """Direct model call at the bucket shape (the engine must match this)."""
    tl, el = CFG.text_len, CFG.entity_len
    keep = np.concatenate([np.arange(bucket), np.arange(tl, tl + el)])
    batch = {k: jnp.asarray(np.asarray(v)[:, keep])
             for k, v in feats.items()}
    batch["position_ids"] = jnp.asarray(keep[None].astype(np.int32))
    bcfg = CFG.replace(text_len=bucket)
    return np.asarray(stonkgs.pooler_output(
        params, bcfg, batch, compute_dtype=jnp.float32), np.float32)


def test_engine_bucketed_embed_matches_direct_calls(params):
    """Mixed-length rows across 3 buckets, shuffled, small batch size:
    the engine must reproduce per-bucket direct forwards in row order."""
    lengths = [3, 8, 5, 12, 16, 2, 9, 14, 7, 16, 4, 11]
    n = len(lengths)
    feats = _features(n, lengths, seed=3)
    eng = STonKGsEngine(cfg=CFG, params=params, compute_dtype="float32",
                        batch_size=3, length_buckets=(8, 12))
    got = eng.embed(feats)
    assert got.shape == (n, CFG.bert.hidden_size)

    lengths = np.asarray(lengths)
    expected = np.zeros_like(got)
    for bucket, mask in [
        (8, lengths <= 8),
        (12, (lengths > 8) & (lengths <= 12)),
    ]:
        idx = np.nonzero(mask)[0]
        sub = {k: v[idx] for k, v in feats.items()}
        expected[idx] = _expected_bucketed(params, sub, bucket)
    # full-shape rows (length > 12) take the exact parity path
    idx = np.nonzero(lengths > 12)[0]
    sub = {k: jnp.asarray(v[idx]) for k, v in feats.items()}
    expected[idx] = np.asarray(stonkgs.pooler_output(
        params, CFG, sub, compute_dtype=jnp.float32), np.float32)

    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-5)


def test_engine_unbucketed_unchanged(params):
    """length_buckets=None keeps the exact-parity path bit-for-bit."""
    feats = _features(5, [3, 16, 7, 16, 2], seed=5)
    eng = STonKGsEngine(cfg=CFG, params=params, compute_dtype="float32",
                        batch_size=2)
    got = eng.embed(feats)
    ref = np.asarray(stonkgs.pooler_output(
        params, CFG, {k: jnp.asarray(v) for k, v in feats.items()},
        compute_dtype=jnp.float32), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_bucketed_logits_path(params):
    feats = _features(6, [2, 16, 9, 4, 13, 8], seed=6)
    cfg = CFG.replace(num_labels=3)
    p = dict(params)
    p["classifier"] = stonkgs.init_classifier_head(
        jax.random.PRNGKey(2), cfg.bert, 3)
    eng = STonKGsEngine(cfg=cfg, params=p, compute_dtype="float32",
                        batch_size=4, length_buckets=(8,))
    lg = eng.logits(feats)
    assert lg.shape == (6, 3)
    # full-shape rows must match the parity classifier exactly
    long_idx = np.nonzero(np.asarray([2, 16, 9, 4, 13, 8]) > 8)[0]
    sub = {k: jnp.asarray(v[long_idx]) for k, v in feats.items()}
    ref = np.asarray(stonkgs.classification_logits(
        p, cfg, sub, compute_dtype=jnp.float32), np.float32)
    np.testing.assert_allclose(lg[long_idx], ref, atol=2e-5, rtol=1e-5)


def test_bucket_assignment_and_validation(params):
    eng = STonKGsEngine(cfg=CFG, params=params, compute_dtype="float32",
                        batch_size=4, length_buckets=(12, 8))  # any order
    assert eng.length_buckets == (8, 12)  # sorted, deduped
    feats = _features(5, [8, 9, 12, 13, 1], seed=7)
    got = {b: set(idx.tolist())
           for b, idx, _, _ in eng._bucket_features(feats)}
    assert got[8] == {0, 4}
    assert got[12] == {1, 2}
    assert got[CFG.text_len] == {3}

    with pytest.raises(ValueError):
        STonKGsEngine(cfg=CFG, params=params, compute_dtype="float32",
                      length_buckets=(0, 8))
    with pytest.raises(ValueError):
        STonKGsEngine(cfg=CFG, params=params, compute_dtype="float32",
                      length_buckets=(CFG.text_len + 1,))


def test_small_request_takes_single_bucket(params):
    """A request that fits one padded batch must dispatch ONCE, at the
    smallest bucket fitting its longest row (latency mode: splitting a
    B<=batch_size request across buckets costs a device round trip per
    bucket — measured 2x median latency at B=8)."""
    eng = STonKGsEngine(cfg=CFG, params=params, compute_dtype="float32",
                        batch_size=8, length_buckets=(8, 12))
    # longest row is 10 -> everything runs at bucket 12 in one group
    feats = _features(5, [3, 10, 5, 2, 7], seed=11)
    groups = list(eng._bucket_features(feats))
    assert len(groups) == 1
    b, idx, _, pos = groups[0]
    assert b == 12 and set(idx.tolist()) == set(range(5))
    got = eng.embed(feats)
    np.testing.assert_allclose(
        got, _expected_bucketed(params, feats, 12), atol=2e-5, rtol=1e-5)

    # a row past every bucket pushes the whole request to the full shape
    feats = _features(3, [3, 14, 5], seed=12)
    groups = list(eng._bucket_features(feats))
    assert len(groups) == 1 and groups[0][0] == CFG.text_len
    # larger-than-batch inputs keep the per-row throughput bucketing
    feats = _features(9, [3, 10, 5, 2, 7, 1, 4, 6, 8], seed=13)
    assert len(list(eng._bucket_features(feats))) > 1


def test_embed_stream_matches_embed_bucketed(params, monkeypatch):
    """Streaming must reassemble bucketed chunks in row order."""
    lengths = [3, 16, 8, 11, 2, 14, 6, 9]
    feats = _features(len(lengths), lengths, seed=9)
    eng = STonKGsEngine(cfg=CFG, params=params, compute_dtype="float32",
                        batch_size=3, length_buckets=(8, 12))
    # oracle: embed() per 3-row chunk (embed_stream's unit of work — each
    # chunk independently picks its bucket via the small-request fast path)
    want = np.concatenate([
        eng.embed({k: v[i: i + 3] for k, v in feats.items()})
        for i in range(0, len(lengths), 3)], 0)

    # bypass tokenization: feed the precomputed features per chunk
    rows = [(i,) for i in range(len(lengths))]  # opaque row markers

    def fake_preprocess(src, tgt, ev, **kw):
        idx = [s for s in np.asarray(src, object)]
        return {k: v[idx] for k, v in feats.items()}

    monkeypatch.setattr(eng, "preprocess", fake_preprocess)
    chunks = list(eng.embed_stream(
        ((i, i, i) for i in range(len(lengths))), chunk_rows=3))
    got = np.concatenate(chunks, 0)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
