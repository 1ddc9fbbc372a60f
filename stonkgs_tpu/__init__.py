"""stonkgs_tpu — TPU-native STonKGs framework (JAX/XLA/Pallas/pjit).

Re-implementation of stonkgs/stonkgs ("Sophisticated Transformers for
Biomedical Text and Knowledge Graph Data") designed TPU-first: batched
fused data paths, one jitted forward/train step, sharding over a
{data, model} device mesh.

Public surface mirrors the reference package root
(``/root/reference/src/stonkgs/__init__.py:5-34``).
"""

from stonkgs_tpu.config import (  # noqa: F401
    BertConfig,
    BigBirdConfig,
    ProtSTonKGsConfig,
    STonKGsConfig,
)
from stonkgs_tpu.version import VERSION, get_version  # noqa: F401

__version__ = VERSION

__all__ = [
    "BertConfig",
    "BigBirdConfig",
    "ProtSTonKGsConfig",
    "STonKGsConfig",
    "STonKGsEngine",
    "get_stonkgs_embeddings",
    "preprocess_df_for_embeddings",
    "get_version",
]


def __getattr__(name):
    # Lazy imports keep `import stonkgs_tpu` light (no jax/pandas cost
    # until a model or API symbol is touched).
    if name == "STonKGsEngine":
        from stonkgs_tpu.api.inference import STonKGsEngine
        return STonKGsEngine
    if name in ("get_stonkgs_embeddings", "preprocess_df_for_embeddings"):
        from stonkgs_tpu.api import embeddings
        return getattr(embeddings, name)
    if name == "prepare_df":  # reference: kg_baseline_model.prepare_df
        from stonkgs_tpu.data.artifacts import prepare_df
        return prepare_df
    if name == "replace_mlm_tokens":  # reference: indra_for_pretraining
        from stonkgs_tpu.data.masking import replace_mlm_tokens
        return replace_mlm_tokens
    if name.startswith("infer_") or name.startswith("ensure_"):
        from stonkgs_tpu.api import api
        try:
            return getattr(api, name)
        except AttributeError:
            pass  # fall through to the package-level error below
    raise AttributeError(f"module 'stonkgs_tpu' has no attribute {name!r}")
