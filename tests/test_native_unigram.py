"""C++ unigram (Viterbi) core vs the Python T5StyleTokenizer — id parity."""
import numpy as np
import pytest

from mmdx_tpu import native
from mmdx_tpu.checkpoints.bundle import _staged_vocab_file, default_t5_vocab
from mmdx_tpu.text.native_unigram import NativeT5Tokenizer
from mmdx_tpu.text.t5_tokenizer import T5StyleTokenizer

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native toolchain unavailable")

TEXTS = [
    "",
    "No acute cardiopulmonary abnormality.",
    "Heart size is within normal limits, lungs are clear.",
    "62 year old male PA view, smoking history of 30 pack years",
    "bilateral pleural effusions with atelectasis???",
    "UPPER Case And MiXeD   whitespace\t\ttabs",
    "unicode: café naïve — em-dash … ellipsis ΩΩΩ",
    "q%$#@!* zz xqj zzz",  # forces unk nodes
    "a" * 300,
]


@pytest.fixture(scope="module")
def pair():
    vocab, scores = default_t5_vocab()
    assert scores, "shipped t5 vocab should be scored (unigram mode)"
    lines = [f"{t}\t{scores.get(i, 0.0)}"
             for t, i in sorted(vocab.items(), key=lambda kv: kv[1])]
    path = _staged_vocab_file("t5test", lines)
    nat = NativeT5Tokenizer(path)
    assert nat.native_available
    py = T5StyleTokenizer(vocab=vocab, scores=scores)
    return nat, py


def test_encode_parity(pair):
    nat, py = pair
    for text in TEXTS:
        assert nat.encode(text) == py.encode(text), text
        assert nat.encode(text, max_length=16) == py.encode(text, max_length=16)


def test_batch_and_decode_parity(pair):
    nat, py = pair
    b_nat = nat.encode_batch(TEXTS, max_length=32)
    b_py = py.encode_batch(TEXTS, max_length=32)
    np.testing.assert_array_equal(b_nat["input_ids"], b_py["input_ids"])
    np.testing.assert_array_equal(b_nat["attention_mask"], b_py["attention_mask"])
    ids = b_py["input_ids"][3]
    assert nat.decode(ids) == py.decode(ids)


def test_bundle_routes_native():
    from mmdx_tpu.checkpoints.bundle import new_random_bundle

    b = new_random_bundle(seed=0, small=True)
    _, t5 = b.tokenizers()
    assert getattr(t5, "native_available", False)
    ref = T5StyleTokenizer(vocab=b.t5_vocab, scores=b.t5_scores)
    for text in TEXTS:
        assert t5.encode(text) == ref.encode(text)
