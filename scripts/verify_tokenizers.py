#!/usr/bin/env python
"""Real-vocab tokenizer parity harness.

Given the REAL pretrained vocab files (unshippable in this zero-egress build
environment — bring your own), asserts id-level parity between our tokenizers
and the HuggingFace ones the reference uses
(reference backend/ml/pipelines/training_pipeline.py:323 BertTokenizer,
:980 T5Tokenizer):

  python scripts/verify_tokenizers.py --bert-vocab vocab.txt \
                                      --spiece spiece.model  \
                                      [--corpus texts.txt]

* --bert-vocab: the bert-base-uncased ``vocab.txt`` (30522 lines). Compared
  against ``transformers.BertTokenizer(vocab)`` when transformers is
  importable (it is in this image), on a built-in clinical corpus plus
  adversarial unicode strings (and --corpus lines if given).
* --spiece: the T5 ``spiece.model``. Our side loads it through the
  dependency-free protobuf reader (text/spm_reader) + unigram Viterbi +
  vendored nmt_nfkc; the oracle is ``transformers.T5Tokenizer``, which needs
  the ``sentencepiece`` library — if it isn't importable the harness reports
  SKIPPED for the oracle but still smoke-decodes our side.

Exit code 0 = every available comparison matched on every string.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ADVERSARIAL = [
    "The lungs are clear. No focal consolidation, effusion or pneumothorax.",
    "62 year old male PA view, smoking history of 30 pack-years",
    "cardiomegaly with vascular congestion; f/u CT recommended",
    "naïve café — ﬁle ＡＢＣ１２３ ½ ㎒",
    "zero​width‍and‌controls\x07\x1f here",
    "spaces   　galore",
    "wave～dash and tilde~ mix",
    "CJK: 肺は清明である。胸水なし。",
    "混合 text with ＢＥＲＴ and t5 ♥",
    "",
    "   leading and trailing   ",
]


def load_corpus(path):
    if not path:
        return []
    return [ln.rstrip("\n") for ln in Path(path).open(encoding="utf-8") if ln.strip()]


def verify_bert(vocab_path: str, texts: list[str]) -> bool:
    from mmdx_tpu.text.wordpiece import WordPieceTokenizer

    ours = WordPieceTokenizer(vocab_file=vocab_path)
    try:
        from transformers import BertTokenizer
    except Exception as e:  # noqa: BLE001
        print(f"[bert] SKIPPED oracle (transformers unavailable: {e})")
        return True
    hf = BertTokenizer(vocab_file=vocab_path, do_lower_case=True)
    ok = True
    for t in texts:
        # ours pads to max_len (the serving contract); compare against HF
        # with identical padding+truncation so the comparison is id-for-id
        a = ours.encode(t, max_len=96)
        b = hf.encode(t, padding="max_length", truncation=True, max_length=96)
        if list(a) != list(b):
            ok = False
            print(f"[bert] MISMATCH on {t!r}:\n  ours={a}\n  hf  ={b}")
    print(f"[bert] {'OK' if ok else 'FAILED'}: {len(texts)} strings vs "
          f"transformers.BertTokenizer")
    # also the native C++ core, when buildable
    try:
        from mmdx_tpu.text.native_wordpiece import NativeWordPieceTokenizer

        nat = NativeWordPieceTokenizer(vocab_path)
        if nat.native_available:
            for t in texts:
                assert list(nat.encode(t)) == list(ours.encode(t)), t
            print(f"[bert] native C++ core parity OK")
    except Exception as e:  # noqa: BLE001
        print(f"[bert] native core skipped: {e}")
    return ok


def verify_t5(spiece_path: str, texts: list[str]) -> bool:
    from mmdx_tpu.text.spm_reader import read_spiece_vocab
    from mmdx_tpu.text.t5_tokenizer import T5StyleTokenizer

    vocab, scores = read_spiece_vocab(spiece_path)
    ours = T5StyleTokenizer(vocab=vocab, scores=scores)
    print(f"[t5] loaded {len(vocab)} pieces via spm_reader "
          f"(algorithm={ours.algorithm})")
    try:
        from transformers import T5Tokenizer

        hf = T5Tokenizer(vocab_file=spiece_path, legacy=True)
    except Exception as e:  # noqa: BLE001
        print(f"[t5] SKIPPED oracle (T5Tokenizer needs sentencepiece: {e}); "
              f"smoke-decoding our side only")
        for t in texts:
            ids = ours.encode(t)
            assert isinstance(ids, list) and ids[-1] == ours.eos_token_id
        return True
    ok = True
    for t in texts:
        a = ours.encode(t)
        b = hf.encode(t)
        if list(a) != list(b):
            ok = False
            print(f"[t5] MISMATCH on {t!r}:\n  ours={a}\n  hf  ={b}")
    print(f"[t5] {'OK' if ok else 'FAILED'}: {len(texts)} strings vs "
          f"transformers.T5Tokenizer")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bert-vocab")
    ap.add_argument("--spiece")
    ap.add_argument("--corpus", help="extra newline-delimited test strings")
    args = ap.parse_args()
    if not args.bert_vocab and not args.spiece:
        ap.error("provide --bert-vocab and/or --spiece")
    texts = ADVERSARIAL + load_corpus(args.corpus)
    ok = True
    if args.bert_vocab:
        ok &= verify_bert(args.bert_vocab, texts)
    if args.spiece:
        ok &= verify_t5(args.spiece, texts)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
