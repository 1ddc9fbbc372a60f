"""C++ WordPiece tokenizer: exact parity with the Python/HF tokenizer."""

import numpy as np
import pytest

from stonkgs_tpu.data.fast_tokenizer import FastBertTokenizer
from stonkgs_tpu.data.wordpiece import BertTokenizer

VOCAB = [
    "[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "protein", "p53", "activ", "##ates", "##ation", "apoptosis",
    "in", "hela", "cells", "via", "caspase", "##-", "-", "3", ".", ",",
    "binding", "of", "to", "dna", "is", "increased", "by", "phosphor",
    "##yl", "##ated", "kinase", "a", "b", "c", "##a", "##b", "##c",
    "1", "2", "(", ")", "[", "]", "e", "##1", "über", "uber", "##r",
    "σ", "##σ", "ας", "cafe", "naive", "α", "β", "汉", "字",
]

TEXTS = [
    "The protein p53 activates apoptosis in HeLa cells via caspase-3.",
    "Binding of p53 to DNA is increased by phosphorylated kinase A.",
    "über Über café naïve",
    "ΑΣ Σ σ ΣΙΓΜΑ",           # final-sigma lowering
    "汉字 mixed α β",
    "",
    "  \t weird \n whitespace   nbsp ",
    "ünïcödé àccénts ēverywhere",
    "x" * 150,                 # over max_input_chars_per_word
    "p53-activation (in-vivo) [test1]",
    "the [MASK] activates [MASK] in cells",   # literal special tokens
    "[CLS] already has specials [SEP]",
    "[mask] is not special but [MASK][MASK] are",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("v") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return str(p)


@pytest.fixture(scope="module")
def fast(vocab_file):
    t = FastBertTokenizer(vocab_file)
    assert t.is_native, "C++ tokenizer failed to build"
    return t


@pytest.fixture(scope="module")
def py(vocab_file):
    return BertTokenizer(vocab_file)


def test_special_ids(fast, py):
    assert fast.cls_id == py.cls_id
    assert fast.sep_id == py.sep_id
    assert fast.pad_id == py.pad_id
    assert fast.unk_id == py.unk_id
    assert fast.vocab_size == py.vocab_size


@pytest.mark.parametrize("max_length", [8, 16, 32])
def test_encode_parity(fast, py, max_length):
    for text in TEXTS:
        f_ids, f_mask = fast.encode(text, max_length)
        p_ids, p_mask = py.encode(text, max_length)
        assert f_ids == p_ids, text
        assert f_mask == p_mask, text


def test_encode_batch_parity(fast, py):
    f_ids, f_mask = fast.encode_batch(TEXTS, 24)
    p_ids, p_mask = py.encode_batch(TEXTS, 24)
    np.testing.assert_array_equal(f_ids, p_ids)
    np.testing.assert_array_equal(f_mask, p_mask)


def test_batch_threading_consistent(fast):
    texts = TEXTS * 20
    a, _ = fast.encode_batch(texts, 16)
    fast.n_threads = 1
    b, _ = fast.encode_batch(texts, 16)
    np.testing.assert_array_equal(a, b)


def test_random_unicode_fuzz(fast, py, rng):
    """Randomized ASCII+Latin+Greek strings tokenize identically."""
    alphabet = (
        list("abcdefghij ABCDEFGHIJ0123456789 .,-()[]{}!?;:'\"")
        + ["ä", "é", "ß", "α", "Σ", " σ", "汉", " ", "ö", "Ü"]
    )
    for _ in range(200):
        n = rng.integers(0, 40)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        f_ids, _ = fast.encode(text, 16)
        p_ids, _ = py.encode(text, 16)
        assert f_ids == p_ids, repr(text)


def test_decomposed_accents_match_python(fast, py):
    """NFD input: combining marks (Mn) must strip to NOTHING, not pass
    through (regression: empty strip mappings were encoded like identity
    mappings, so 'cafe\\u0301' tokenized as [UNK])."""
    cases = [
        "cafe\u0301",             # NFD e + acute
        "nai\u0308ve",            # NFD i + diaeresis
        "A\u0301B\u0302C\u0303",  # marks on capitals
        "x\u0301\u0302\u0303",    # multiple marks on one base
    ]
    for text in cases:
        f_ids, _ = fast.encode(text, 16)
        p_ids, _ = py.encode(text, 16)
        assert f_ids == p_ids, ascii(text)


def test_astral_plane_chars_match_python(fast, py):
    """Supplementary-plane chars: CJK Extension B splits like a chinese
    char, astral format (Cf) chars are stripped — same as unicodedata."""
    cases = [
        "\U00020000 word",       # CJK ext B
        "a\U000E0001b",          # TAG Cf char inside a word
        "\U0001F600 face",       # astral symbol (So)
        "\U0002A700x",           # CJK ext C adjacent to latin
    ]
    for text in cases:
        f_ids, _ = fast.encode(text, 16)
        p_ids, _ = py.encode(text, 16)
        assert f_ids == p_ids, ascii(text)


def test_tiny_max_length_no_overflow(fast):
    """max_length < 2 must not write out of bounds (C ABI hardening)."""
    ids, mask = fast.encode_batch(["hello world"] * 3, 2)
    assert ids.shape == (3, 2)
    ids1, mask1 = fast.encode_batch(["hello"], 1)
    assert ids1.shape == (1, 1) and mask1[0, 0] == 1
