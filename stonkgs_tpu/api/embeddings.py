"""Reference-compatible embedding-extraction API.

Drop-in equivalents of ``preprocess_df_for_embeddings`` and
``get_stonkgs_embeddings`` (``/root/reference/src/stonkgs/models/
stonkgs_for_embeddings.py:26-186``) operating on pandas DataFrames with
``source``/``target``/``evidence`` columns — but batched and jitted instead
of per-row with batch size 1.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from stonkgs_tpu.api.inference import STonKGsEngine
from stonkgs_tpu.data.artifacts import load_kg_artifacts
from stonkgs_tpu.data.preprocessing import preprocess_for_embeddings


def preprocess_df_for_embeddings(
    df,
    *,
    embedding_name_to_vector_path: str,
    embedding_name_to_random_walk_path: str,
    vocab_file_path: str,
    sep_id: int = 102,
    unk_id: int = 100,
    mask_id: int = 103,
    apply_masking: bool = True,
    seed: int = 0,
):
    """DataFrame(source, target, evidence) -> preprocessed feature DataFrame.

    ``apply_masking=True`` replicates the reference quirk of random 15%
    masking at inference (``stonkgs_for_embeddings.py:133-143``); pass False
    for deterministic embeddings."""
    import pandas as pd

    artifacts = load_kg_artifacts(
        embedding_name_to_vector_path, embedding_name_to_random_walk_path
    )
    from stonkgs_tpu.data.fast_tokenizer import FastBertTokenizer
    tokenizer = FastBertTokenizer(vocab_file_path)
    feats = preprocess_for_embeddings(
        df["source"].to_numpy(object),
        df["target"].to_numpy(object),
        df["evidence"].tolist(),
        artifacts, tokenizer,
        sep_id=sep_id, unk_id=unk_id, mask_id=mask_id,
        apply_masking=apply_masking, seed=seed,
    )
    return pd.DataFrame({k: list(v) for k, v in feats.items()})


def get_stonkgs_embeddings(
    preprocessed_df,
    pretrained_stonkgs_model_name=None,
    list_of_indices: Optional[list] = None,
):
    """Preprocessed DataFrame -> DataFrame with an ``embedding`` column.

    Positionally API-compatible with the reference function
    (``stonkgs_for_embeddings.py:158-163``): the 2nd argument is the hub
    checkpoint name (downloaded like the reference when a string; the
    default stonkgs-150k when None) — but runs batched jitted forwards
    instead of a batch-size-1 tqdm loop. An already-built
    :class:`STonKGsEngine` may be passed in its place to skip the
    download."""
    import pandas as pd

    if isinstance(pretrained_stonkgs_model_name, STonKGsEngine):
        engine = pretrained_stonkgs_model_name
    else:
        engine = STonKGsEngine.from_default_pretrained(
            pretrained_stonkgs_model_name)
    if list_of_indices is not None:
        preprocessed_df = preprocessed_df.iloc[list_of_indices]
    features = {
        k: np.stack(preprocessed_df[k].to_numpy())
        for k in ("input_ids", "attention_mask", "token_type_ids")
    }
    pooled = engine.embed(features)
    return pd.DataFrame({"embedding": [row.tolist() for row in pooled]})
