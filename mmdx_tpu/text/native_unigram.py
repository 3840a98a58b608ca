"""ctypes wrapper over the C++ unigram (Viterbi) core with Python fallback.

``NativeT5Tokenizer`` exposes the same surface as
``text.t5_tokenizer.T5StyleTokenizer``; normalization (NFKC + whitespace
collapse + dummy-prefix escaping) stays in Python, the Viterbi dynamic
program runs native. Outputs are always identical to the Python tokenizer
(parity-asserted in tests/test_native_unigram.py); unscored (greedy-mode)
vocabs route entirely through Python.
"""
from __future__ import annotations

import ctypes
from pathlib import Path

from mmdx_tpu import native
from mmdx_tpu.text.t5_tokenizer import WORD_BOUNDARY, T5StyleTokenizer


class NativeT5Tokenizer(T5StyleTokenizer):
    def __init__(self, vocab_file: str | Path):
        super().__init__(vocab_file=vocab_file)
        self._lib = native.load()
        self._handle = None
        if self._lib is not None and self.algorithm == "unigram":
            h = self._lib.ug_create(str(vocab_file).encode())
            if h:
                self._handle = ctypes.c_void_p(h)
                assert self._lib.ug_vocab_size(self._handle) == self.vocab_size

    @property
    def native_available(self) -> bool:
        return self._handle is not None

    def _viterbi(self, s: str) -> list[int]:
        if self._handle is not None:
            data = s.encode("utf-8")
            cap = max(16, 2 * len(s))
            out = (ctypes.c_int32 * cap)()
            count = self._lib.ug_encode(self._handle, data, out, cap)
            if count >= 0:
                return list(out[:count])
        return super()._viterbi(s)
