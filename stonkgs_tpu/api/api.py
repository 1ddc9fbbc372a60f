"""Packaged inference API: ensure fine-tuned models, run ``infer_*``.

Re-implements ``/root/reference/src/stonkgs/api/api.py``: Zenodo record ids
per task, per-task class-name columns, ``ensure_*``/``get_*_model``/
``infer_*`` family, input polymorphism (DataFrame | list-of-rows | INDRA
Statements), and ``infer``/``infer_iter``/``infer_concat``.

TPU-native difference: inference runs batched through ``STonKGsEngine``
(one jitted forward per padded batch) instead of the reference's
batch-size-1 per-row loop (``api.py:318-336``).
"""

from __future__ import annotations

import logging
from functools import lru_cache
from pathlib import Path
from typing import Callable, Iterable, List, Optional, Tuple, Union

import numpy as np

from stonkgs_tpu.api.inference import STonKGsEngine
from stonkgs_tpu.constants import EMBEDDINGS_URL, VOCAB_URL, WALKS_URL
from stonkgs_tpu.utils.cache import ensure

logger = logging.getLogger(__name__)

InferenceHint = Union["pandas.DataFrame", List[List[str]], list]  # noqa: F821

# Zenodo record ids (reference api.py:29-34)
SPECIES_RECORD = "5205530"
LOCATION_RECORD = "5205553"
DISEASE_RECORD = "5205592"
CORRECT_MULTICLASS_RECORD = "5206139"
CORRECT_BINARY_RECORD = "5205989"
CELL_LINE_RECORD = "5205915"

# per-task class columns (reference api.py:39-83)
POLARITY_COLUMNS = ["down", "up"]
INTERACTION_COLUMNS = ["direct_interaction", "indirect_interaction"]
SPECIES_COLUMNS = ["mouse", "rat", "human"]
LOCATION_COLUMNS = [
    "extracellular_space", "cell_membrane", "cell_nucleus",
    "extracellular_matrix", "cytoplasm",
]
DISEASE_COLUMNS = [
    "neuroblastoma", "multiple_myeloma", "lung_non-small_cell_carcinomaleukemia",
    "breast_cancer", "lung_cancer", "atherosclerosis", "osteosarcoma",
    "melanoma", "leukemia", "colon_cancer",
]
CORRECT_MULTICLASS_COLUMNS = [
    "act_vs_amt", "grounding", "hypothesis", "entity_boundaries",
    "no_relation", "correct", "wrong_relation", "polarity",
]
CORRECT_BINARY_COLUMNS = ["incorrect", "correct"]
CELL_LINE_COLUMNS = [
    "HeLa", "THP-1", "LNCAP", "COS-1", "DMS_114", "NIH-3T3", "HEK293",
    "MCF7", "Hep_G2", "U-937",
]

KEEP_COLUMNS = ["input_ids", "attention_mask", "token_type_ids"]


def ensure_walks() -> Path:
    """Ensure the random-walks artifact is cached (Zenodo 5205687)."""
    return ensure(WALKS_URL)


def ensure_embeddings() -> Path:
    """Ensure the node2vec embeddings artifact is cached."""
    return ensure(EMBEDDINGS_URL)


def ensure_vocab() -> Path:
    """Ensure the BioBERT vocab file is cached (constants.py:128-129)."""
    return ensure(VOCAB_URL, "misc")


def _ensure_fine_tuned(submodule: str, record: str) -> Path:
    ensure(f"https://zenodo.org/record/{record}/files/config.json", submodule)
    ensure(f"https://zenodo.org/record/{record}/files/training_args.bin", submodule)
    return ensure(
        f"https://zenodo.org/record/{record}/files/pytorch_model.bin", submodule)


def _get_engine(f: Callable[[], Path]) -> STonKGsEngine:
    path = f().parent
    logger.info("loading STonKGs sequence classifier from %s", path)
    return STonKGsEngine.from_pretrained(
        str(path),
        kg_embedding_path=str(ensure_embeddings()),
        kg_random_walk_path=str(ensure_walks()),
        vocab_file=str(ensure_vocab()),
    )


def ensure_species() -> Path:
    """Ensure the species model (Zenodo 5205530; ~1.4 GB)."""
    return _ensure_fine_tuned("species", SPECIES_RECORD)


def ensure_location() -> Path:
    """Ensure the location model."""
    return _ensure_fine_tuned("location", LOCATION_RECORD)


def ensure_disease() -> Path:
    """Ensure the disease model."""
    return _ensure_fine_tuned("disease", DISEASE_RECORD)


def ensure_correct_multiclass() -> Path:
    """Ensure the correct (multiclass) model."""
    return _ensure_fine_tuned("correct_multiclass", CORRECT_MULTICLASS_RECORD)


def ensure_correct_binary() -> Path:
    """Ensure the correct (binary) model."""
    return _ensure_fine_tuned("correct_binary", CORRECT_BINARY_RECORD)


def ensure_cell_line() -> Path:
    """Ensure the cell-line model."""
    return _ensure_fine_tuned("cell_line", CELL_LINE_RECORD)


@lru_cache(maxsize=1)
def get_species_model() -> STonKGsEngine:
    """Get the species model."""
    return _get_engine(ensure_species)


@lru_cache(maxsize=1)
def get_location_model() -> STonKGsEngine:
    """Get the location model."""
    return _get_engine(ensure_location)


@lru_cache(maxsize=1)
def get_disease_model() -> STonKGsEngine:
    """Get the disease model."""
    return _get_engine(ensure_disease)


@lru_cache(maxsize=1)
def get_correct_multiclass_model() -> STonKGsEngine:
    """Get the correct (multiclass) model."""
    return _get_engine(ensure_correct_multiclass)


@lru_cache(maxsize=1)
def get_correct_binary_model() -> STonKGsEngine:
    """Get the correct (binary) model."""
    return _get_engine(ensure_correct_binary)


@lru_cache(maxsize=1)
def get_cell_line_model() -> STonKGsEngine:
    """Get the cell-line model."""
    return _get_engine(ensure_cell_line)


def infer_species(data: InferenceHint):
    """Infer the species for the given input."""
    return infer_concat(get_species_model(), data, columns=SPECIES_COLUMNS)


def infer_locations(data: InferenceHint):
    """Infer the locations for the given input."""
    return infer_concat(get_location_model(), data, columns=LOCATION_COLUMNS)


def infer_diseases(data: InferenceHint):
    """Infer the diseases for the given input."""
    return infer_concat(get_disease_model(), data, columns=DISEASE_COLUMNS)


def infer_correct_multiclass(data: InferenceHint):
    """Infer the correct multiclass output for the given input."""
    return infer_concat(get_correct_multiclass_model(), data,
                        columns=CORRECT_MULTICLASS_COLUMNS)


def infer_correct_binary(data: InferenceHint):
    """Infer the correct binary output for the given input.

    >>> from stonkgs_tpu import infer_correct_binary
    >>> rows = [["p(HGNC:17927 ! SENP1)", "p(HGNC:4910 ! HIF1A)",
    ...          "Hence, deSUMOylation of HIF-1alpha by SENP1 could prevent "
    ...          "degradation of HIF-1alpha"]]
    >>> df = infer_correct_binary(rows)
    """
    return infer_concat(get_correct_binary_model(), data,
                        columns=CORRECT_BINARY_COLUMNS)


def infer_cell_lines(data: InferenceHint):
    """Infer the cell lines for the given input."""
    return infer_concat(get_cell_line_model(), data, columns=CELL_LINE_COLUMNS)


# ---------------------------------------------------------------------------
# generic inference
# ---------------------------------------------------------------------------

INDRA_DF_COLUMNS = ["stmt_hash", "belief", "source", "target", "evidence"]


def _convert_indra_statements(statements) -> "pandas.DataFrame":  # noqa: F821
    """INDRA Statement objects -> rows via the native BEL conversion."""
    import pandas as pd

    from stonkgs_tpu.data.indra_extraction import statement_edges

    rows = []
    for stmt in statements:
        stmt_json = stmt.to_json() if hasattr(stmt, "to_json") else stmt
        h = stmt_json.get("matches_hash", "")
        belief = stmt_json.get("belief", "")
        for (u, _), _rel, (v, _), data in statement_edges(stmt_json):
            if not data["evidence"]:
                continue
            rows.append((h, belief, u, v, data["evidence"]))
    return pd.DataFrame(rows, columns=INDRA_DF_COLUMNS)


def _prepare_df(data: InferenceHint):
    """DataFrame | [(source, target, evidence), ...] | INDRA Statements."""
    import pandas as pd

    if isinstance(data, pd.DataFrame):
        return data
    if not isinstance(data, list):
        raise TypeError(f"source df has invalid type: {type(data)}")
    if isinstance(data[0], (list, tuple)):
        return pd.DataFrame(data, columns=["source", "target", "evidence"])
    if hasattr(data[0], "to_json") or (
            isinstance(data[0], dict) and "type" in data[0]):
        # indra.statements.Statement objects OR raw statement-JSON dicts
        # (e.g. json.load-ed EMMAA dumps)
        return _convert_indra_statements(data)
    raise TypeError(f"row has invalid type: {type(data[0])}")


def infer(engine: STonKGsEngine, data: InferenceHint):
    """Run inference; returns (logits list, probabilities list)."""
    raw, probs = [], []
    for r, p in infer_iter(engine, data):
        raw.append(r)
        probs.append(p)
    return raw, probs


def infer_iter(engine: STonKGsEngine, data: InferenceHint) -> Iterable[Tuple]:
    """Yield (logits, probabilities) per row — batched under the hood."""
    df = _prepare_df(data)
    feats = engine.preprocess(
        df["source"].to_numpy(object), df["target"].to_numpy(object),
        df["evidence"].tolist(),
    )
    logits = engine.logits(feats)
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    probs = e / e.sum(axis=-1, keepdims=True)
    for lg, p in zip(logits, probs):
        yield lg, p.tolist()


def infer_concat(engine: STonKGsEngine, data: InferenceHint, *,
                 columns: Optional[List[str]] = None,
                 as_dataframe: bool = False):
    """Run inference, concatenating probability columns onto the input rows."""
    rv = iter(infer_concat_iter(engine, data, columns=columns))
    if as_dataframe:
        import pandas as pd

        header = next(rv)
        return pd.DataFrame(rv, columns=header)
    return rv


def infer_concat_iter(engine: STonKGsEngine, data: InferenceHint,
                      columns: Optional[List[str]] = None) -> Iterable:
    """Yield header then input rows extended with class probabilities.

    When ``columns`` is None, a generated ``class_<i>`` header is yielded
    instead (the header row is ALWAYS first — ``infer_concat``'s
    DataFrame mode consumes it, so omitting it would silently swallow the
    first data row as column labels)."""
    df = _prepare_df(data)
    if columns is None:
        columns = [f"class_{i}" for i in range(engine.cfg.num_labels)]
    yield (*df.columns, *columns)
    for row, (_lg, probs) in zip(df.values, infer_iter(engine, df)):
        yield (*row, *probs)
