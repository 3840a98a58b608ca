"""C++ WordPiece core: byte-identical to the Python tokenizer, and faster."""
import time

import numpy as np
import pytest

from mmdx_tpu.text.native_wordpiece import NativeWordPieceTokenizer
from mmdx_tpu.text.wordpiece import WordPieceTokenizer

VOCAB = "mmdx_tpu/assets/bert_vocab.txt"

TEXTS = [
    "31 year old male PA view , smoking history of 40 pack years, hypertension",
    "78 year old female PA view , low grade fever, cough, shortness of breath",
    "67M, smoker; dyspnea; CHF history.",
    "",
    "UNKNOWNWORDXYZQ!! multiple   spaces",
    "Patient presente une toux naive cafe",  # ascii
    "Présente une toux naïve café",  # unicode -> python fallback path
]


@pytest.fixture(scope="module")
def tok():
    t = NativeWordPieceTokenizer(VOCAB)
    if not t.native_available:
        pytest.skip("native lib failed to build")
    return t


def test_native_matches_python(tok):
    py = WordPieceTokenizer(VOCAB)
    for text in TEXTS:
        assert tok.encode(text, 96) == py.encode(text, 96), text
    a = tok.encode_batch(TEXTS, 64)
    b = py.encode_batch(TEXTS, 64)
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    np.testing.assert_array_equal(a["attention_mask"], b["attention_mask"])


def test_native_is_faster(tok):
    py = WordPieceTokenizer(VOCAB)
    text = TEXTS[0]
    n = 300
    t0 = time.perf_counter()
    for _ in range(n):
        tok.encode(text, 96)
    dt_native = time.perf_counter() - t0
    # defeat the python lru word cache to compare honest cold-path cost
    t0 = time.perf_counter()
    for _ in range(n):
        py._wordpiece_cached.cache_clear()
        py.encode(text, 96)
    dt_py = time.perf_counter() - t0
    assert dt_native < dt_py
