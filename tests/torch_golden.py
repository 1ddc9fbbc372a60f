"""Torch golden-model fixture reproducing the reference STonKGs semantics.

Test-only: composes HF ``BertModel`` modules and explicit tensor ops to
mirror the behavior documented in
``/root/reference/src/stonkgs/models/stonkgs_model.py`` (frozen backbone
without attention mask, KG dict with special rows 100/102/103, shared
transform + bias-free split decoders, NSP on pooled output).  Used to
validate the JAX implementation without network access to the real
stonkgs-150k checkpoint.
"""

from __future__ import annotations

import numpy as np
import torch
import transformers


class GoldenSTonKGs(torch.nn.Module):
    def __init__(self, tiny_cfg: dict, kg_vocab_size: int, text_len: int,
                 num_labels: int | None = None, seed: int = 0):
        super().__init__()
        torch.manual_seed(seed)
        hf_cfg = transformers.BertConfig(**tiny_cfg)
        h = hf_cfg.hidden_size
        self.text_len = text_len
        self.kg_vocab_size = kg_vocab_size
        self.trunk = transformers.BertModel(hf_cfg)
        self.lm_backbone = transformers.BertModel(hf_cfg)
        self.transform_dense = torch.nn.Linear(h, h)
        self.transform_ln = torch.nn.LayerNorm(h, eps=hf_cfg.layer_norm_eps)
        self.text_decoder = torch.nn.Linear(h, hf_cfg.vocab_size, bias=False)
        self.entity_decoder = torch.nn.Linear(h, kg_vocab_size, bias=False)
        self.seq_relationship = torch.nn.Linear(h, 2)
        self.classifier = torch.nn.Linear(h, num_labels) if num_labels else None
        self.eval()

        # KG backbone table with the reference's index-space layout
        rng = np.random.default_rng(seed)
        self.kg_vectors = rng.normal(size=(kg_vocab_size, h)).astype(np.float32)
        rows = np.setdiff1d(np.arange(kg_vocab_size + 3), [100, 102, 103])
        table = np.zeros((kg_vocab_size + 3, h), np.float32)
        table[rows] = self.kg_vectors
        with torch.no_grad():
            for sid in (102, 103, 100):
                out = self.lm_backbone(torch.tensor([[sid]]))[0][0, 0]
                table[sid] = out.numpy()
        self.kg_table = torch.tensor(table)

    def reference_state_dict(self) -> dict:
        """State dict with the reference checkpoint's key layout."""
        sd = {}
        sd.update({f"bert.{k}": v for k, v in self.trunk.state_dict().items()})
        sd.update({f"lm_backbone.{k}": v for k, v in self.lm_backbone.state_dict().items()})
        sd["cls.predictions.transform.dense.weight"] = self.transform_dense.weight
        sd["cls.predictions.transform.dense.bias"] = self.transform_dense.bias
        sd["cls.predictions.transform.LayerNorm.weight"] = self.transform_ln.weight
        sd["cls.predictions.transform.LayerNorm.bias"] = self.transform_ln.bias
        sd["cls.predictions.text_decoder.weight"] = self.text_decoder.weight
        sd["cls.predictions.entity_decoder.weight"] = self.entity_decoder.weight
        sd["cls.predictions.text_bias"] = torch.zeros(self.text_decoder.weight.shape[0])
        sd["cls.predictions.entity_bias"] = torch.zeros(self.entity_decoder.weight.shape[0])
        sd["cls.seq_relationship.weight"] = self.seq_relationship.weight
        sd["cls.seq_relationship.bias"] = self.seq_relationship.bias
        if self.classifier is not None:
            sd["classifier.weight"] = self.classifier.weight
            sd["classifier.bias"] = self.classifier.bias
        return sd

    @torch.no_grad()
    def forward(self, input_ids, attention_mask, token_type_ids):
        text_ids = torch.tensor(input_ids[:, : self.text_len])
        ent_ids = torch.tensor(input_ids[:, self.text_len:])
        # frozen backbone: NO attention mask (stonkgs_model.py:178)
        token_emb = self.lm_backbone(text_ids)[0]
        ent_emb = self.kg_table[ent_ids]
        inputs_embeds = torch.cat([token_emb, ent_emb], dim=1)
        out = self.trunk(
            inputs_embeds=inputs_embeds,
            attention_mask=torch.tensor(attention_mask),
            token_type_ids=torch.tensor(token_type_ids),
        )
        seq, pooled = out.last_hidden_state, out.pooler_output
        t = self.transform_ln(torch.nn.functional.gelu(self.transform_dense(seq)))
        mlm = self.text_decoder(t[:, : self.text_len])
        elm = self.entity_decoder(t[:, self.text_len:])
        nsp = self.seq_relationship(pooled)
        cls_logits = self.classifier(pooled) if self.classifier is not None else None
        return mlm, elm, nsp, pooled, cls_logits
