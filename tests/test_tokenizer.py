"""WordPiece tokenizer parity vs HuggingFace BertTokenizerFast.

The reference tokenizes with ``BertTokenizerFast(vocab_file=VOCAB_FILE)``
(``indra_for_pretraining.py:176``) — default do_lower_case=True. Our
tokenizer must produce identical ids/attention for the encode_plus usage
(padding='max_length', truncation=True).
"""

import numpy as np
import pytest

from stonkgs_tpu.data.wordpiece import BertTokenizer

VOCAB = [
    "[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "protein", "p53", "activ", "##ates", "##ation", "apoptosis",
    "in", "hela", "cells", "via", "caspase", "##-", "-", "3", ".", ",",
    "binding", "of", "to", "dna", "is", "increased", "by", "phosphor",
    "##yl", "##ated", "kinase", "a", "b", "c", "##a", "##b", "##c",
    "1", "2", "(", ")", "[", "]", "e", "##1", "über", "uber", "##r",
]

SENTENCES = [
    "The protein p53 activates apoptosis in HeLa cells via caspase-3.",
    "Binding of p53 to DNA is increased by phosphorylated kinase A.",
    "p53, ( a b c ) [ e1 ]",
    "über Über unknownlongwordxyz",
    "",
    "   whitespace\t\tand\nnewlines   ",
    "汉字 mixed with text",
    "café naïve résumé",  # accent stripping under lowercase
    "the [MASK] protein binds [MASK].",  # literal special tokens survive
    "[CLS] explicit specials [SEP]",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def ours(vocab_file):
    return BertTokenizer(vocab_file)


@pytest.fixture(scope="module")
def hf(vocab_file):
    import transformers
    return transformers.BertTokenizerFast(vocab_file=vocab_file)


@pytest.mark.parametrize("text", SENTENCES)
def test_tokenize_parity(ours, hf, text):
    assert ours.tokenize(text) == hf.tokenize(text)


@pytest.mark.parametrize("max_length", [16, 12])
def test_encode_plus_parity(ours, hf, max_length):
    for text in SENTENCES:
        enc = hf.encode_plus(
            text, padding="max_length", truncation=True, max_length=max_length
        )
        ids, mask = ours.encode(text, max_length)
        assert ids == enc["input_ids"], text
        assert mask == enc["attention_mask"], text


def test_encode_batch(ours, hf):
    ids, mask = ours.encode_batch(SENTENCES, 16)
    assert ids.shape == (len(SENTENCES), 16)
    for i, text in enumerate(SENTENCES):
        enc = hf.encode_plus(
            text, padding="max_length", truncation=True, max_length=16
        )
        np.testing.assert_array_equal(ids[i], enc["input_ids"])
        np.testing.assert_array_equal(mask[i], enc["attention_mask"])


def test_special_ids(ours):
    assert ours.pad_id == 0
    assert ours.unk_id == 2
    assert ours.cls_id == 3
    assert ours.sep_id == 4
