"""ban_repeated_ngrams (matmul-decomposed mask) vs a literal scatter oracle."""
import numpy as np

import jax.numpy as jnp

from mmdx_tpu.decode.ngram import ban_repeated_ngrams


def _oracle(logprobs, seqs, cur_len, n):
    """Literal HF NoRepeatNGramLogitsProcessor semantics."""
    out = np.array(logprobs, np.float32)
    k = n - 1
    for row in range(seqs.shape[0]):
        hist = list(seqs[row, :cur_len])
        if len(hist) < n - 1:
            continue
        suffix = tuple(hist[-k:]) if k else ()
        for start in range(len(hist) - k):
            if tuple(hist[start:start + k]) == suffix:
                out[row, hist[start + k]] = -np.inf
    return out


def test_ngram_mask_matches_scatter_oracle():
    rng = np.random.default_rng(0)
    for trial in range(12):
        n_rows = 6
        vocab = int(rng.choice([97, 256, 300, 32128 // 64]))
        lmax = int(rng.integers(6, 40))
        cur = int(rng.integers(3, lmax))
        # small alphabet to force plenty of repeated ngrams; include v-1 edges
        seqs = rng.integers(0, min(vocab, 7), (n_rows, lmax)).astype(np.int32)
        seqs[0, :cur] = vocab - 1  # all-same at the top of the id range
        logprobs = rng.standard_normal((n_rows, vocab)).astype(np.float32)
        got = np.asarray(ban_repeated_ngrams(
            jnp.asarray(logprobs), jnp.asarray(seqs), jnp.asarray(cur, jnp.int32), 3
        ))
        want = _oracle(logprobs, seqs, cur, 3)
        np.testing.assert_array_equal(got, want), (trial, vocab, cur)
