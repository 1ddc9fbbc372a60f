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


class GoldenProtSTonKGs(torch.nn.Module):
    """Torch golden model mirroring ProtSTonKGs semantics
    (``protstonkgs_model.py:104-357``): BigBird trunk over
    [text | KG | protein] embeddings from two frozen BertModels + a KG
    table, protein projection, PELM head with 3 bias-free decoders."""

    def __init__(self, trunk_cfg: dict, lm_cfg: dict, prot_cfg: dict,
                 kg_vocab_size: int, kg_start: int, prot_start: int,
                 special_ids=(4, 5, 2),  # (sep, mask, unk)
                 num_labels: int | None = None, seed: int = 0):
        super().__init__()
        torch.manual_seed(seed)
        self.trunk = transformers.BigBirdModel(transformers.BigBirdConfig(**trunk_cfg))
        self.lm_backbone = transformers.BertModel(transformers.BertConfig(**lm_cfg))
        self.prot_backbone = transformers.BertModel(transformers.BertConfig(**prot_cfg))
        h = trunk_cfg["hidden_size"]
        self.prot_projection = torch.nn.Linear(prot_cfg["hidden_size"], h)
        self.transform_dense = torch.nn.Linear(h, h)
        self.transform_ln = torch.nn.LayerNorm(h, eps=1e-12)
        self.text_decoder = torch.nn.Linear(h, lm_cfg["vocab_size"], bias=False)
        self.entity_decoder = torch.nn.Linear(h, kg_vocab_size, bias=False)
        self.prot_decoder = torch.nn.Linear(h, prot_cfg["vocab_size"], bias=False)
        self.classifier = torch.nn.Linear(h, num_labels) if num_labels else None
        self.kg_start = kg_start
        self.prot_start = prot_start
        self.hidden_act = trunk_cfg.get("hidden_act", "gelu_new")
        self.eval()

        rng = np.random.default_rng(seed)
        self.kg_vectors = rng.normal(size=(kg_vocab_size, h)).astype(np.float32)
        rows = np.setdiff1d(np.arange(kg_vocab_size + 3), list(special_ids))
        table = np.zeros((kg_vocab_size + 3, h), np.float32)
        table[rows] = self.kg_vectors
        with torch.no_grad():
            for sid in special_ids:
                table[sid] = self.lm_backbone(torch.tensor([[sid]]))[0][0, 0].numpy()
        self.kg_table = torch.tensor(table)

    def reference_state_dict(self) -> dict:
        sd = {}
        sd.update({f"bert.{k}": v for k, v in self.trunk.state_dict().items()})
        sd.update({f"lm_backbone.{k}": v for k, v in self.lm_backbone.state_dict().items()})
        sd.update({f"prot_backbone.{k}": v for k, v in self.prot_backbone.state_dict().items()})
        sd["prot_to_lm_hidden_linear.weight"] = self.prot_projection.weight
        sd["prot_to_lm_hidden_linear.bias"] = self.prot_projection.bias
        sd["cls.predictions.transform.dense.weight"] = self.transform_dense.weight
        sd["cls.predictions.transform.dense.bias"] = self.transform_dense.bias
        sd["cls.predictions.transform.LayerNorm.weight"] = self.transform_ln.weight
        sd["cls.predictions.transform.LayerNorm.bias"] = self.transform_ln.bias
        for name in ("text", "entity", "prot"):
            dec = getattr(self, f"{name}_decoder")
            sd[f"cls.predictions.{name}_decoder.weight"] = dec.weight
            sd[f"cls.predictions.{name}_bias"] = torch.zeros(dec.weight.shape[0])
        if self.classifier is not None:
            sd["classifier.weight"] = self.classifier.weight
            sd["classifier.bias"] = self.classifier.bias
        return sd

    @torch.no_grad()
    def forward(self, input_ids, attention_mask):
        input_ids = torch.tensor(input_ids)
        chunk = self.kg_start // 3
        text_emb = torch.cat(
            [self.lm_backbone(input_ids[:, i * chunk:(i + 1) * chunk])[0]
             for i in range(3)], dim=1)
        ent_emb = self.kg_table[input_ids[:, self.kg_start:self.prot_start]]
        prot_out = self.prot_backbone(input_ids[:, self.prot_start:])[0]
        prot_emb = self.prot_projection(prot_out)
        inputs_embeds = torch.cat([text_emb, ent_emb, prot_emb], dim=1)
        out = self.trunk(
            inputs_embeds=inputs_embeds,
            attention_mask=torch.tensor(attention_mask),
        )
        seq, pooled = out.last_hidden_state, out.pooler_output
        act = (torch.nn.functional.gelu if self.hidden_act == "gelu"
               else lambda x: torch.nn.functional.gelu(x, approximate="tanh"))
        t = self.transform_ln(act(self.transform_dense(seq)))
        mlm = self.text_decoder(t[:, : self.kg_start])
        elm = self.entity_decoder(t[:, self.kg_start: self.prot_start])
        prot = self.prot_decoder(t[:, self.prot_start:])
        cls_logits = self.classifier(pooled) if self.classifier is not None else None
        return mlm, elm, prot, pooled, cls_logits


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
