"""T5-conventions subword tokenizer (SentencePiece-style, greedy longest match).

The reference decodes reports with the hub-downloaded ``T5Tokenizer``
(reference ``backend/ml/pipelines/training_pipeline.py:980``,
``inference_pipeline.py:196``).  With no hub access, we own the tokenizer: the
id conventions match T5 exactly (pad=0 doubles as decoder_start, eos=1 </s>,
unk=2) so generated id sequences from our beam search decode directly; the
piece inventory comes from a local vocab file (built by text/vocab_builder.py)
using SentencePiece's ``▁`` word-boundary convention.

A user with the real ``spiece.model`` vocabulary exported to text can drop it
in for id-compatibility with the reference's checkpoints.
"""
from __future__ import annotations

from pathlib import Path

WORD_BOUNDARY = "▁"  # ▁


class T5StyleTokenizer:
    """Greedy longest-match subword tokenizer with T5 special-token ids."""

    pad_token = "<pad>"
    eos_token = "</s>"
    unk_token = "<unk>"
    pad_token_id = 0
    eos_token_id = 1
    unk_token_id = 2

    def __init__(self, vocab_file: str | Path | None = None,
                 vocab: dict[str, int] | None = None):
        if vocab is None:
            if vocab_file is None:
                raise ValueError("need vocab_file or vocab")
            vocab = {}
            with open(vocab_file, encoding="utf-8") as f:
                for i, line in enumerate(f):
                    vocab[line.rstrip("\n")] = i
        assert vocab.get(self.pad_token) == 0 and vocab.get(self.eos_token) == 1
        self.vocab = vocab
        self.inv_vocab = {i: t for t, i in vocab.items()}
        self.max_piece_len = max((len(t) for t in vocab), default=1)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def _encode_word(self, word: str) -> list[int]:
        """Greedy longest-match over '▁word' (char-fallback to unk)."""
        text = WORD_BOUNDARY + word
        ids: list[int] = []
        start = 0
        n = len(text)
        while start < n:
            end = min(n, start + self.max_piece_len)
            piece_id = None
            while end > start:
                pid = self.vocab.get(text[start:end])
                if pid is not None:
                    piece_id = pid
                    break
                end -= 1
            if piece_id is None:
                ids.append(self.unk_token_id)
                start += 1
            else:
                ids.append(piece_id)
                start = end
        return ids

    def encode(self, text: str, max_length: int | None = None,
               add_eos: bool = True) -> list[int]:
        ids: list[int] = []
        for word in text.lower().split():
            ids.extend(self._encode_word(word))
        if add_eos:
            ids = ids[: (max_length - 1) if max_length else None] + [self.eos_token_id]
        if max_length is not None:
            ids = ids[:max_length]
        return ids

    def encode_batch(self, texts: list[str], max_length: int = 256):
        """T5 report labels: pad to max_length; mask pads to -100 downstream
        (reference training_pipeline.py:983-991)."""
        import numpy as np

        rows = []
        mask = []
        for t in texts:
            ids = self.encode(t, max_length=max_length)
            m = [1] * len(ids) + [0] * (max_length - len(ids))
            ids = ids + [self.pad_token_id] * (max_length - len(ids))
            rows.append(ids)
            mask.append(m)
        return {
            "input_ids": np.asarray(rows, np.int32),
            "attention_mask": np.asarray(mask, np.int32),
        }

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        pieces: list[str] = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in (self.pad_token_id, self.eos_token_id):
                continue
            pieces.append(self.inv_vocab.get(i, self.unk_token))
        text = "".join(pieces).replace(WORD_BOUNDARY, " ")
        return text.strip()

    def batch_decode(self, batch, skip_special_tokens: bool = True) -> list[str]:
        return [self.decode(row, skip_special_tokens) for row in batch]
