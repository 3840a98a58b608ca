"""Tokenizer parity: native WordPiece vs HF BertTokenizer on the same local
vocab (the exact algorithm the reference's AutoTokenizer applies), plus
T5-style tokenizer self-consistency."""
import numpy as np
import pytest

from mmdx_tpu.text.t5_tokenizer import T5StyleTokenizer
from mmdx_tpu.text.vocab_builder import (
    build_t5_vocab,
    build_wordpiece_vocab,
    default_medical_corpus,
    write_vocab,
)
from mmdx_tpu.text.wordpiece import WordPieceTokenizer

SAMPLES = [
    "31 year old male PA view , smoking history of 40 pack years, hypertension , productive cough, leg swelling, shortness of breath",
    "78 year old female PA view , low grade fever, cough, shortness of breath",
    "67M, smoker; dyspnea; CHF history.",
    "54F, no smoking; cough; asthma.",
    "Patient présente une toux (côugh) -- naïve café!!",
    "UNKNOWNWORDXYZQ supercalifragilistic",
    "",
    "   multiple   spaces\tand\nnewlines  ",
]


@pytest.fixture(scope="module")
def wp_vocab(tmp_path_factory):
    corpus = default_medical_corpus() + SAMPLES
    tokens = build_wordpiece_vocab(corpus, vocab_size=2048)
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    write_vocab(tokens, path)
    return path


def test_wordpiece_matches_hf_bert_tokenizer(wp_vocab, sample_patient_details):
    from transformers import BertTokenizer

    hf = BertTokenizer(str(wp_vocab), do_lower_case=True)
    ours = WordPieceTokenizer(wp_vocab)
    texts = SAMPLES + list(sample_patient_details.values())
    for text in texts:
        assert ours.tokenize(text) == hf.tokenize(text), text
        enc = hf(
            [text], padding="max_length", truncation=True, max_length=96,
            return_tensors="np",
        )
        got = ours.encode_batch([text], max_len=96)
        np.testing.assert_array_equal(got["input_ids"], enc["input_ids"])
        np.testing.assert_array_equal(got["attention_mask"], enc["attention_mask"])
        np.testing.assert_array_equal(got["token_type_ids"], enc["token_type_ids"])


def test_wordpiece_matches_hf_fast_tokenizer(wp_vocab):
    """Also match the Rust fast tokenizer (what AutoTokenizer actually returns)."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    vocab = {}
    for i, line in enumerate(wp_vocab.read_text().splitlines()):
        vocab[line] = i
    fast = Tokenizer(models.WordPiece(vocab, unk_token="[UNK]"))
    fast.normalizer = normalizers.BertNormalizer(lowercase=True)
    fast.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    ours = WordPieceTokenizer(wp_vocab)
    for text in SAMPLES:
        assert ours.tokenize(text) == fast.encode(text).tokens, text


def test_t5_style_roundtrip():
    corpus = default_medical_corpus()
    pieces = build_t5_vocab(corpus, vocab_size=2048)
    tok = T5StyleTokenizer(vocab=dict((p, i) for i, p in enumerate(pieces)))
    assert tok.pad_token_id == 0 and tok.eos_token_id == 1

    text = "the lungs are clear without focal consolidation , effusion or pneumothorax ."
    ids = tok.encode(text)
    assert ids[-1] == tok.eos_token_id
    assert tok.decode(ids) == text

    batch = tok.encode_batch([text, "heart size is normal ."], max_length=64)
    assert batch["input_ids"].shape == (2, 64)
    # pad masked out exactly like the reference labels path (pads -> -100)
    labels = np.where(batch["attention_mask"] == 0, -100, batch["input_ids"])
    assert (labels[1] == -100).sum() > 0


def test_t5_unknown_chars_fallback():
    pieces = build_t5_vocab(["abc def"], vocab_size=256)
    tok = T5StyleTokenizer(vocab=dict((p, i) for i, p in enumerate(pieces)))
    ids = tok.encode("abc zzz 中")
    assert tok.unk_token_id in ids or len(ids) > 0
