"""Edge cases across the stack: stores, feature validation, tokenizers, resize."""
import numpy as np
import pytest

from mmdx_tpu.io.store import InMemoryStore, LocalFSStore, open_url, parse_url, register_store
from mmdx_tpu.ops import resize as R


def test_parse_url_and_open_url_errors():
    assert parse_url("s3://bucket/a/b.jpg") == ("s3", "bucket", "a/b.jpg")
    assert parse_url("mem://x/k") == ("mem", "x", "k")
    with pytest.raises(ValueError):
        parse_url("not-a-url")
    with pytest.raises(ValueError):
        open_url("weird://nope/k")


def test_inmemory_store_missing_key():
    s = InMemoryStore("b")
    with pytest.raises(FileNotFoundError):
        s.get("nope")
    s.put("a/b", b"x")
    assert s.list("a/") == ["a/b"]
    assert s.url_for("a/b") == "mem://b/a/b"


def test_localfs_store_roundtrip(tmp_path):
    s = LocalFSStore(tmp_path / "root", bucket="bk")
    s.put("d/e.bin", b"\x00\x01")
    assert s.get("d/e.bin") == b"\x00\x01"
    assert s.exists("d/e.bin") and not s.exists("d/f.bin")
    assert s.list() == ["d/e.bin"]
    with pytest.raises(ValueError):
        s.put("../escape", b"x")
    blob = open_url(register_store(s).url_for("d/e.bin"))
    assert blob == b"\x00\x01"


def test_feature_pipeline_validation_errors():
    import pandas as pd

    from mmdx_tpu.pipelines.feature_pipeline import enforce_raw_data_columns

    with pytest.raises(ValueError, match="missing columns"):
        enforce_raw_data_columns(pd.DataFrame({"image_url": ["a"]}))

    df = pd.DataFrame({
        "image_url": ["a"], "patient_details": ["b"], "report": ["c"],
        "disease_classification_vector": [[1.0] * 12],  # wrong length
    })
    with pytest.raises(ValueError, match="length 13"):
        enforce_raw_data_columns(df)


def test_resize_matrices_are_row_stochastic():
    for in_size, out_size in [(512, 256), (256, 256), (100, 256), (333, 257)]:
        k = R.bilinear_coeff_matrix(in_size, out_size)
        np.testing.assert_allclose(k.sum(axis=1), 1.0, rtol=1e-12)
        assert (k >= 0).all()


def test_shorter_side_rules():
    assert R.shorter_side_target(512, 512, 256) == (256, 256)
    assert R.shorter_side_target(512, 256, 256) == (512, 256)  # no-op
    assert R.shorter_side_target(300, 400, 256) == (256, 341)
    assert R.center_crop_bounds(256, 256, 224) == (16, 16)


def test_wordpiece_long_word_becomes_unk():
    from mmdx_tpu.text.wordpiece import WordPieceTokenizer

    tok = WordPieceTokenizer("mmdx_tpu/assets/bert_vocab.txt")
    assert tok.tokenize("x" * 200) == ["[UNK]"]
    # truncation keeps max_len-2 content tokens
    ids = tok.encode("cough " * 200, max_len=16)
    assert len(ids) == 16 and ids[0] == tok.cls_id and ids[-1] == tok.sep_id


def test_t5_tokenizer_truncation():
    from mmdx_tpu.checkpoints.bundle import default_vocabs

    from mmdx_tpu.text.t5_tokenizer import T5StyleTokenizer

    _, t5_vocab = default_vocabs()
    tok = T5StyleTokenizer(vocab=t5_vocab)
    ids = tok.encode("the lungs are clear " * 50, max_length=20)
    assert len(ids) == 20 and ids[-1] == tok.eos_token_id


def test_bundle_bad_magic(tmp_path):
    from mmdx_tpu.checkpoints.bundle import load_bundle

    p = tmp_path / "junk.mmdx"
    p.write_bytes(b"NOTMAGIC" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        load_bundle(p)


def test_get_model_bundle_missing(tmp_path, monkeypatch):
    from mmdx_tpu.pipelines.inference_pipeline import clear_model_bundle, get_model_bundle

    clear_model_bundle()
    monkeypatch.setenv("MMDX_BUNDLE_PATH", str(tmp_path / "missing.mmdx"))
    with pytest.raises(FileNotFoundError):
        get_model_bundle()
    clear_model_bundle()
