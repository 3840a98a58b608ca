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


# ---------------------------------------------------------------------------
# unigram-LM (Viterbi) mode — the SentencePiece-compatible segmentation
# ---------------------------------------------------------------------------
def _unigram_tok(scored: dict[str, float]):
    """Build a T5StyleTokenizer from {piece: score} (specials auto-added)."""
    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)] + list(scored.items())
    vocab = {p: i for i, (p, _) in enumerate(pieces)}
    scores = {i: s for i, (_, s) in enumerate(pieces)}
    return T5StyleTokenizer(vocab=vocab, scores=scores)


def test_unigram_viterbi_beats_greedy():
    """Hand-built model where longest-match is suboptimal: 'abc' segments as
    ▁a + bc (score -2.5), not the greedy ▁ab + c (score -4.0)."""
    tok = _unigram_tok({"▁ab": -1.0, "c": -3.0, "▁a": -1.5, "bc": -1.0})
    assert tok.algorithm == "unigram"
    assert tok.tokenize("abc") == ["▁a", "bc"]


def test_unigram_whole_sentence_segmentation():
    """Pieces may span the (escaped) space between words — segmentation runs
    over the full sentence like SentencePiece, not word-by-word."""
    tok = _unigram_tok({
        "▁of▁the": -1.0, "▁of": -2.0, "▁the": -2.0,
        "o": -8.0, "f": -8.0, "t": -8.0, "h": -8.0, "e": -8.0, "▁": -8.0,
    })
    assert tok.tokenize("of the") == ["▁of▁the"]


def test_unigram_unk_per_uncovered_char():
    """A position with no single-char piece gets an unk node scored
    min_score - 10 (SentencePiece kUnkPenalty); known chars still match."""
    tok = _unigram_tok({"▁a": -1.0, "b": -2.0, "▁": -3.0})
    ids = tok.encode("aZb", add_eos=False)
    assert ids == [tok.vocab["▁a"], tok.unk_token_id, tok.vocab["b"]]


def test_unigram_is_cased():
    """T5 is cased: 'PA' must not be lowercased into different pieces."""
    tok = _unigram_tok({"▁PA": -1.0, "▁pa": -1.0, "▁": -5.0,
                        "P": -6.0, "A": -6.0, "p": -6.0, "a": -6.0})
    assert tok.tokenize("PA") == ["▁PA"]
    assert tok.tokenize("pa") == ["▁pa"]


def test_unigram_scored_tsv_roundtrip(tmp_path):
    """spm_export_vocab-style TSV loads into unigram mode and survives a
    write/load cycle with identical segmentations."""
    pairs = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0),
             ("▁ab", -1.0), ("c", -3.0), ("▁a", -1.5), ("bc", -1.0)]
    path = write_vocab(pairs, tmp_path / "spiece_vocab.tsv")
    tok = T5StyleTokenizer(vocab_file=path)
    assert tok.algorithm == "unigram"
    assert tok.tokenize("abc") == ["▁a", "bc"]


def test_unigram_shipped_vocab_roundtrip():
    """The scored synthetic vocab segments + decodes domain text losslessly."""
    from mmdx_tpu.text.vocab_builder import score_t5_vocab

    corpus = default_medical_corpus(n_synthetic=200)
    scored = score_t5_vocab(build_t5_vocab(corpus, vocab_size=2048), corpus,
                            em_iters=1)
    vocab = {p: i for i, (p, _) in enumerate(scored)}
    scores = {i: s for i, (_, s) in enumerate(scored)}
    tok = T5StyleTokenizer(vocab=vocab, scores=scores)
    text = "The lungs are clear without focal consolidation , effusion or pneumothorax ."
    ids = tok.encode(text)
    assert ids[-1] == tok.eos_token_id
    assert tok.decode(ids) == text


def test_nmt_nfkc_normalization_fixtures():
    """Hand-built fixtures for the vendored SentencePiece nmt_nfkc rule set
    (builder.cc BuildNmtNFKCMap + remove_extra_whitespaces). These are the
    cases where plain 'NFKC + whitespace collapse' (the round-2 approximation)
    gives DIFFERENT answers than the reference's T5Tokenizer normalizer."""
    from mmdx_tpu.text.t5_tokenizer import nmt_nfkc_normalize as norm

    # NMT whitespace variants -> space (NFKC alone leaves most of these)
    assert norm("a​b") == "a b"        # ZERO WIDTH SPACE
    assert norm("a‍b") == "a b"        # ZERO WIDTH JOINER
    assert norm("a‌b") == "a b"        # ZERO WIDTH NON-JOINER
    assert norm("a‎‏b") == "a b"  # LRM+RLM -> two spaces -> squeeze
    assert norm("a b c") == "a b c"  # line/para separators
    assert norm("a﻿b") == "a b"        # BOM
    assert norm("a�b") == "a b"        # replacement char
    assert norm("a▁b") == "a b"        # the escape char itself
    assert norm("a\tb\nc\rd") == "a b c d"  # TAB/LF/CR

    # control characters removed outright (NOT spaces)
    assert norm("a\x07b") == "ab"           # BEL
    assert norm("a\x01\x02b") == "ab"
    assert norm("a\x1fb") == "ab"
    assert norm("a\x7fb") == "ab"           # DEL
    assert norm("a\x8fb") == "ab"
    assert norm("a\x9fb") == "ab"
    # ...but only 8F/9F from the C1 range (upstream table quirk) and NEL
    # (U+0085) passes through untouched
    assert norm("a\x85b") == "a\x85b"
    assert norm("a\x80b") == "a\x80b"

    # NFKC proper still applies
    assert norm("ＡＢＣ１２３") == "ABC123"   # full-width forms
    assert norm("a b") == "a b"          # NBSP -> space via NFKC
    assert norm("ﬁle") == "file"         # fi ligature
    assert norm("é") == "é"        # combining acute composes

    # FULL-WIDTH TILDE is protected from NFKC (wave-dash replacement)
    assert norm("あ～い") == "あ～い"
    assert norm("ＡＢ～ＣＤ") == "AB～CD"    # protection is per-char, NFKC around it

    # remove_extra_whitespaces: trim + squeeze literal spaces only
    assert norm("  a   b  ") == "a b"
    assert norm("") == ""
    assert norm(" \t ") == ""


def test_nmt_nfkc_feeds_encoder():
    """T5StyleTokenizer.normalize routes through the exact nmt_nfkc rules."""
    from mmdx_tpu.checkpoints.bundle import new_random_bundle

    b = new_random_bundle(seed=0, small=True)
    _, tok = b.tokenizers()
    # ZWJ would be kept by plain NFKC; nmt_nfkc makes these identical inputs
    a = tok.encode("lungs‍clear")
    c = tok.encode("lungs clear")
    assert a == c
