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


def test_banned_follower_ids_sparse_exact():
    """Sparse follower-id extraction == the dense mask's banned set, and the
    overflow flag trips when a suffix matches more than cap windows."""
    import jax.numpy as jnp
    import numpy as np

    from mmdx_tpu.decode.ngram import banned_follower_ids, banned_ngram_mask

    rng = np.random.default_rng(0)
    n, lmax, v = 4, 24, 256
    seqs = rng.integers(0, 9, (n, lmax)).astype(np.int32)  # small alphabet
    for cur in (3, 7, 15, 23):
        ids, overflow = banned_follower_ids(jnp.asarray(seqs),
                                            jnp.asarray(cur), cap=8,
                                            ngram_size=3)
        dense = np.asarray(banned_ngram_mask(jnp.asarray(seqs),
                                             jnp.asarray(cur), v, 3))
        ids = np.asarray(ids)
        if not bool(overflow):
            for r in range(n):
                want = set(np.flatnonzero(dense[r]).tolist())
                got = set(t for t in ids[r].tolist() if t >= 0)
                assert got == want, (cur, r, got, want)

    # pathological repeat: "x y x y x y..." makes every window match -> the
    # matched-window count exceeds cap and overflow must trip
    rep = np.tile([5, 6], lmax // 2).astype(np.int32)[None, :].repeat(n, 0)
    ids, overflow = banned_follower_ids(jnp.asarray(rep),
                                        jnp.asarray(lmax - 1), cap=8,
                                        ngram_size=2)
    assert bool(overflow)


def test_greedy_sparse_ngram_token_parity(monkeypatch):
    """Chunked greedy with the sparse ngram ban (incl. its dense cond
    fallback) produces the same tokens as the dense-mask chunked path."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    import mmdx_tpu.decode.greedy as greedy_mod
    from mmdx_tpu.config import ReportDecoderConfig
    from mmdx_tpu.decode.greedy import greedy_decode
    from mmdx_tpu.models.t5 import T5

    cfg = ReportDecoderConfig(
        vocab_size=512, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout=0.0,
        chunked_step_logits=True,
    )
    model = T5(config=cfg)
    rng = np.random.default_rng(3)
    ids_in = jnp.asarray(rng.integers(0, 512, (2, 5)))
    msk = jnp.ones((2, 5), jnp.int32)
    variables = model.init(jax.random.PRNGKey(3), ids_in, msk, ids_in)
    B, lmax = 3, 16
    cond = jnp.asarray(rng.standard_normal((B, 4, cfg.d_model)) * 2.0,
                       jnp.float32)
    gen = dict(max_new_tokens=14, min_new_tokens=4, no_repeat_ngram_size=2,
               eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)

    def run():
        cache, static_kv = model.apply(variables, B, lmax, cond, None,
                                       method=T5.init_cache)
        bias = model.apply(variables, lmax, method=T5.decode_self_bias)
        enc_mask = jnp.ones((B, 4), jnp.int32)

        def step_fn(tokens, pos, c_):
            return model.apply(variables, tokens, pos, c_, static_kv, bias,
                               enc_mask, method=T5.decode_step)

        return np.asarray(greedy_decode(
            step_fn, cache, batch=B, vocab_size=cfg.vocab_size, **gen))

    monkeypatch.setattr(greedy_mod, "_SPARSE_NGRAM", False)
    dense = run()
    monkeypatch.setattr(greedy_mod, "_SPARSE_NGRAM", True)
    jax.clear_caches()  # the flag is baked into traced programs
    sparse = run()
    np.testing.assert_array_equal(sparse, dense)
