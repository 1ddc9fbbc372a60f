"""ctypes frontend of the C++ WordPiece tokenizer (``csrc/wordpiece.cpp``).

Drop-in accelerated replacement for ``stonkgs_tpu.data.wordpiece
.BertTokenizer`` on the batch-encode hot path; builds the shared library
(and its generated Unicode tables) on first use, cached under
``csrc/build/``.  Falls back transparently to the pure-Python tokenizer
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Iterable, Optional, Tuple

import numpy as np

from stonkgs_tpu.data.wordpiece import BertTokenizer as PyBertTokenizer

_CSRC = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "csrc"))
_lib = None
_lib_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    src = os.path.join(_CSRC, "wordpiece.cpp")
    gen = os.path.join(_CSRC, "gen_unicode_tables.py")
    build = os.path.join(_CSRC, "build")
    header = os.path.join(build, "unicode_tables.h")
    so = os.path.join(build, "libwordpiece.so")
    try:
        os.makedirs(build, exist_ok=True)
        if not os.path.exists(header) or os.path.getmtime(header) < os.path.getmtime(gen):
            subprocess.run([sys.executable, gen, header], check=True,
                           capture_output=True)
        if (not os.path.exists(so)
                or os.path.getmtime(so) < max(os.path.getmtime(src),
                                              os.path.getmtime(header))):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 "-I", build, "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
        lib.wp_vocab_size.restype = ctypes.c_int32
        lib.wp_token_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.wp_token_id.restype = ctypes.c_int32
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except (subprocess.CalledProcessError, OSError, FileNotFoundError):
        _lib_failed = True
        _lib = None
    return _lib


class FastBertTokenizer:
    """C++-backed tokenizer with the same surface as data.wordpiece.BertTokenizer."""

    def __init__(self, vocab_file: str, do_lower_case: bool = True,
                 n_threads: Optional[int] = None):
        lib = _load_lib()
        self._py = None
        self._handle = None
        self._vocab_file = vocab_file
        self._do_lower_case = do_lower_case
        self.n_threads = n_threads or min(os.cpu_count() or 1, 16)
        if lib is not None:
            self._lib = lib
            self._handle = lib.wp_create(vocab_file.encode(), int(do_lower_case))
        if self._handle is None:
            self._py = PyBertTokenizer(vocab_file, do_lower_case)
            return
        self.vocab_size = int(lib.wp_vocab_size(self._handle))
        self.unk_id = int(lib.wp_token_id(self._handle, b"[UNK]"))
        self.cls_id = int(lib.wp_token_id(self._handle, b"[CLS]"))
        self.sep_id = int(lib.wp_token_id(self._handle, b"[SEP]"))
        self.pad_id = int(lib.wp_token_id(self._handle, b"[PAD]"))
        mask = int(lib.wp_token_id(self._handle, b"[MASK]"))
        self.mask_id = mask if mask >= 0 else None

    def __getattr__(self, name):
        # Methods the C ABI doesn't expose (tokenize, convert_tokens_to_ids,
        # vocab, ...) delegate to a lazily-built Python tokenizer so the
        # surface matches data.wordpiece.BertTokenizer in BOTH modes.
        if name.startswith("_"):
            raise AttributeError(name)
        if self._py is None:
            object.__setattr__(
                self, "_py",
                PyBertTokenizer(self._vocab_file, self._do_lower_case))
        return getattr(self._py, name)

    def __del__(self):
        h = getattr(self, "_handle", None)
        if h:
            self._lib.wp_free(h)

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def encode(self, text: str, max_length: int) -> Tuple[list, list]:
        """Encode one text to ids with padding/truncation to max_length."""
        ids, mask = self.encode_batch([text], max_length)
        return ids[0].tolist(), mask[0].tolist()

    def encode_batch(self, texts: Iterable[str], max_length: int):
        """Encode a list of texts; returns (ids, attention_mask) arrays."""
        if self._handle is None:
            return self._py.encode_batch(texts, max_length)
        texts = [t.encode("utf-8") for t in texts]
        n = len(texts)
        ids = np.zeros((n, max_length), np.int32)
        mask = np.zeros((n, max_length), np.int32)
        arr = (ctypes.c_char_p * n)(*texts)
        lens = np.asarray([len(t) for t in texts], np.int64)
        self._lib.wp_encode_batch(
            self._handle, arr,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, max_length, self.n_threads,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return ids, mask
