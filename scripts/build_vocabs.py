#!/usr/bin/env python
"""Regenerate the shipped tokenizer vocab assets from the synthetic domain corpus.

Usage: python scripts/build_vocabs.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from mmdx_tpu.text.vocab_builder import (
    build_t5_vocab,
    build_wordpiece_vocab,
    default_medical_corpus,
    score_t5_vocab,
    write_vocab,
)

ASSETS = pathlib.Path(__file__).resolve().parents[1] / "mmdx_tpu" / "assets"


def main():
    corpus = default_medical_corpus()
    wp = build_wordpiece_vocab(corpus, vocab_size=8192)
    t5 = score_t5_vocab(build_t5_vocab(corpus, vocab_size=8192), corpus)
    print(f"wordpiece vocab: {len(wp)} tokens -> {write_vocab(wp, ASSETS / 'bert_vocab.txt')}")
    print(f"t5 unigram vocab: {len(t5)} pieces -> {write_vocab(t5, ASSETS / 't5_vocab.txt')}")


if __name__ == "__main__":
    main()
