"""Model configurations for the TPU-native STonKGs framework.

The reference derives its configs from HuggingFace ``BertConfig``/``BigBirdConfig``
(``/root/reference/src/stonkgs/models/stonkgs_model.py:96-97``,
``protstonkgs_model.py:137-145``, ``transestonkgs_model.py:90-93``).  Here the
configuration is a plain frozen dataclass so it can be closed over by jitted
functions and hashed for compilation caches.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """Configuration of a BERT-style encoder (matches HF BertModel semantics).

    Defaults correspond to BioBERT v1.1 / BERT-base (``dmis-lab/biobert-v1.1``),
    the LM backbone and trunk of the reference STonKGs model
    (reference: ``src/stonkgs/constants.py:120``).
    """

    vocab_size: int = 28996
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"  # exact erf-based gelu, like HF "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_dict(cls, d: dict) -> "BertConfig":
        """Build from a HuggingFace config.json dict (unknown keys ignored)."""
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    @classmethod
    def from_json_file(cls, path: str | os.PathLike) -> "BertConfig":
        """Build from a config.json path (HF checkpoint layout)."""
        with open(path) as f:
            return cls.from_hf_dict(json.load(f))


@dataclasses.dataclass(frozen=True)
class STonKGsConfig:
    """Configuration of the dual-modality STonKGs model.

    The input sequence is ``[text_len | entity_len]`` positions long; the text
    half is embedded by a frozen LM backbone, the entity half by a KG-embedding
    table gather (reference: ``src/stonkgs/models/stonkgs_model.py:52,178-189``).

    ``kg_vocab_size`` is the number of KG entities (the entity-decoder output
    dimension); the KG embedding *table* carries ``kg_vocab_size + 3`` rows
    because ids 100/102/103 (UNK/SEP/MASK) are reserved for LM-derived special
    embeddings (reference: ``stonkgs_model.py:120-141``).
    """

    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    kg_vocab_size: int = 0
    # Sequence layout. STonKGs: 256 + 256; TransESTonKGs: 256 + 4.
    text_len: int = 256
    entity_len: int = 256
    # Special token ids of the LM tokenizer (BertTokenizer defaults).
    unk_id: int = 100
    sep_id: int = 102
    mask_id: int = 103
    num_labels: Optional[int] = None  # set for sequence classification

    @property
    def seq_len(self) -> int:
        return self.text_len + self.entity_len

    @property
    def kg_table_size(self) -> int:
        """Number of rows of the KG backbone table (entities + 3 special rows)."""
        return self.kg_vocab_size + 3

    def replace(self, **kw) -> "STonKGsConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def transe(cls, kg_vocab_size: int, **kw) -> "STonKGsConfig":
        """TransESTonKGs layout: 256 text + [h, r, t, SEP]
        (reference: ``transestonkgs_model.py:92-93,44``)."""
        bert = kw.pop("bert", BertConfig(max_position_embeddings=260))
        return cls(bert=bert, kg_vocab_size=kg_vocab_size, text_len=256, entity_len=4, **kw)


@dataclasses.dataclass(frozen=True)
class ProtSTonKGsConfig:
    """Configuration of the tri-modality ProtSTonKGs model.

    Sequence layout ``[text 768 | kg 256 | prot 3072]`` = 4096 tokens, BigBird
    trunk (reference: ``src/stonkgs/models/protstonkgs_model.py:104-145``).
    """

    trunk: "BigBirdConfig" = None  # type: ignore[assignment]
    lm: BertConfig = dataclasses.field(default_factory=BertConfig)
    prot: BertConfig = dataclasses.field(
        default_factory=lambda: BertConfig(
            vocab_size=30, hidden_size=1024, num_hidden_layers=30,
            num_attention_heads=16, intermediate_size=4096,
            max_position_embeddings=40000,
        )
    )
    # decoder vocab sizes; None derives them from the backbone configs in
    # __post_init__ so the pairs cannot silently diverge
    lm_vocab_size: Optional[int] = None
    kg_vocab_size: int = 0
    prot_vocab_size: Optional[int] = None
    kg_start_idx: int = 768
    prot_start_idx: int = 1024
    seq_len: int = 4096
    unk_id: int = 100
    sep_id: int = 66
    mask_id: int = 67
    num_labels: Optional[int] = None

    def __post_init__(self):
        if self.lm_vocab_size is None:
            object.__setattr__(self, "lm_vocab_size", self.lm.vocab_size)
        if self.prot_vocab_size is None:
            object.__setattr__(self, "prot_vocab_size",
                               self.prot.vocab_size)

    @property
    def text_len(self) -> int:
        return self.kg_start_idx

    @property
    def entity_len(self) -> int:
        return self.prot_start_idx - self.kg_start_idx

    @property
    def prot_len(self) -> int:
        return self.seq_len - self.prot_start_idx

    @property
    def kg_table_size(self) -> int:
        return self.kg_vocab_size + 3

    def replace(self, **kw) -> "ProtSTonKGsConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class BigBirdConfig:
    """BigBird encoder config (``google/bigbird-roberta-base`` defaults).

    Reference trunk of ProtSTonKGs (``protstonkgs_model.py:137``); attention
    may run block-sparse (original_full | block_sparse).
    """

    vocab_size: int = 50358
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu_new"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 4096
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    attention_type: str = "block_sparse"
    block_size: int = 64
    num_random_blocks: int = 3
    use_bias: bool = True
    rescale_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_dict(cls, d: dict) -> "BigBirdConfig":
        """Build from a HuggingFace BigBird config.json dict."""
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})
