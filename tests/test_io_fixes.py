"""Regressions for io/pipeline review findings (round-3 session-5 review)."""
import io
import threading
import time

import numpy as np
import pytest

from mmdx_tpu.io.store import LocalFSStore, open_url, register_store


def test_store_url_roundtrip_relative_root(tmp_path, monkeypatch):
    """url_for -> open_url must resolve through the REGISTRY handle even for
    relative roots (the documented scheduler flow: prepare writes URLs into
    feature rows, training reads them back in another working directory)."""
    monkeypatch.chdir(tmp_path)
    store = register_store(
        LocalFSStore(root="data/store", bucket="medical-ml-bucket")
    )
    store.put("chest-x-ray-images/a.jpg", b"JPEGDATA")
    url = store.url_for("chest-x-ray-images/a.jpg")
    assert url == "file://medical-ml-bucket/chest-x-ray-images/a.jpg"
    assert open_url(url) == b"JPEGDATA"


def test_store_key_escape_blocked(tmp_path):
    """'../<root-name>-sibling' must not pass the escape check (string-prefix
    comparison admitted sibling dirs sharing the root's name prefix)."""
    root = tmp_path / "store"
    sibling = tmp_path / "store-backup"
    sibling.mkdir()
    (sibling / "x").write_bytes(b"secret")
    s = LocalFSStore(root=root)
    with pytest.raises(ValueError, match="escapes"):
        s.get("../store-backup/x")
    with pytest.raises(ValueError, match="escapes"):
        s.put("../store-backup/y", b"z")


def test_feature_group_dedup_survives_new_process(tmp_path):
    """primary_key persists in sidecar metadata: a READER in a different
    process (fresh FeatureStore) still gets latest-event dedup."""
    import pandas as pd

    from mmdx_tpu.io.feature_store import FeatureStore

    writer = FeatureStore(object_store=LocalFSStore(root=tmp_path / "s"))
    fg = writer.get_or_create_feature_group(
        "cxr_features", version=1, primary_key=["image_url"]
    )
    df = pd.DataFrame({"image_url": ["u1", "u2"], "v": [1, 2]})
    fg.insert(df)
    fg.insert(pd.DataFrame({"image_url": ["u1"], "v": [9]}))  # newer u1

    reader = FeatureStore(object_store=LocalFSStore(root=tmp_path / "s"))
    got = reader.get_feature_group("cxr_features", version=1).read()
    assert len(got) == 2, got  # deduped, NOT 3 appended rows
    assert int(got.set_index("image_url").loc["u1", "v"]) == 9


def test_decode_16bit_grayscale_png():
    """16-bit radiography PNGs (PIL mode I/I;16) must range-scale, not clip
    every pixel >255 to white through convert('RGB')."""
    from PIL import Image

    from mmdx_tpu.io.images import decode_image

    grad = (np.linspace(0, 40000, 64 * 64).reshape(64, 64)).astype(np.uint16)
    buf = io.BytesIO()
    Image.fromarray(grad, mode="I;16").save(buf, format="PNG")
    arr = decode_image(buf.getvalue())
    assert arr.dtype == np.uint8
    assert arr.min() <= 5 and arr.max() >= 250  # full range used
    # monotone gradient preserved, not a clipped all-white plateau
    assert (arr.astype(int).reshape(-1)[-1] - arr.astype(int).reshape(-1)[0]) > 200
    assert np.mean(arr == 255) < 0.05


def test_decode_squeezes_rgb_encoded_grayscale():
    """RGB files whose channels are identical (the common CXR export form)
    decode to 2-D grayscale — exact under the repeat-to-3 preprocessing
    contract, 3x fewer serving tunnel bytes, and the turbo gray-stem path.
    Real color images must NOT be squeezed."""
    from PIL import Image

    from mmdx_tpu.io.images import decode_image
    from mmdx_tpu.ops.preprocess import preprocess_exact

    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (96, 80), dtype=np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=-1)
    buf = io.BytesIO()
    Image.fromarray(rgb, mode="RGB").save(buf, format="PNG")  # lossless
    arr = decode_image(buf.getvalue())
    assert arr.ndim == 2 and np.array_equal(arr, gray)
    # preprocessing is bit-identical either way
    np.testing.assert_array_equal(
        preprocess_exact(arr, img_size=48, resize_size=56),
        preprocess_exact(rgb, img_size=48, resize_size=56))

    color = rgb.copy()
    color[10, 10, 2] ^= 1  # one differing pixel -> genuinely color
    buf2 = io.BytesIO()
    Image.fromarray(color, mode="RGB").save(buf2, format="PNG")
    assert decode_image(buf2.getvalue()).ndim == 3


def test_dataloader_early_break_stops_worker(tmp_path, monkeypatch):
    """Breaking out of iteration mid-epoch must stop the prefetch worker
    (it used to block forever on q.put, leaking a thread per epoch)."""
    from mmdx_tpu.pipelines.dataloader import CXRImageDataset, DataLoader

    class _DS(CXRImageDataset):
        def __getitem__(self, i):
            return np.zeros((8, 8, 3), np.float32), self.labels[i]

    n = 64
    ds = _DS(image_urls=["u%d" % i for i in range(n)],
             labels=[np.zeros(13, np.float32)] * n)
    loader = DataLoader(ds, batch_size=4, prefetch=2)
    before = {t.name for t in threading.enumerate()}
    for imgs, ys in loader:
        break  # step-budgeted training loops do this constantly
    deadline = time.time() + 10
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name == "mmdx-loader" and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not [t for t in threading.enumerate()
                if t.name == "mmdx-loader" and t.is_alive()], (
        "prefetch worker leaked after early break")
    assert "mmdx-loader" not in before or True


def test_parse_label_bits_ignores_prose_digits():
    from mmdx_tpu.config import DISEASES
    from mmdx_tpu.pipelines.data_prep import parse_label_bits

    clean = "0,1,0,0,0,0,0,0,0,0,0,0,1"
    want = [0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1]
    assert parse_label_bits(clean) == want
    assert parse_label_bits("Here are the 13 bits: " + clean) == want
    assert parse_label_bits("(0=absent, 1=present)\n" + clean) == want
    nf = [0] * 13
    nf[DISEASES.index("No Finding")] = 1
    assert parse_label_bits("I cannot label this.") == nf


def test_t5_asymmetric_depth_roundtrip():
    """Import/export must infer encoder depth separately from decoder depth
    (T5 supports num_layers != num_decoder_layers)."""
    import numpy as np

    from mmdx_tpu.checkpoints.torch_export import export_hf_t5
    from mmdx_tpu.checkpoints.torch_import import import_hf_t5

    rng = np.random.default_rng(0)
    d, heads, dkv, dff, v, nb = 8, 2, 4, 16, 32, 4

    def lin(o, i):
        return rng.standard_normal((o, i)).astype(np.float32)

    sd = {
        "shared.weight": lin(v, d),
        "encoder.final_layer_norm.weight": np.ones(d, np.float32),
        "decoder.final_layer_norm.weight": np.ones(d, np.float32),
    }
    n_enc, n_dec = 3, 1
    for i in range(n_enc):
        t = f"encoder.block.{i}.layer"
        for m in "qkvo":
            sd[f"{t}.0.SelfAttention.{m}.weight"] = (
                lin(d, heads * dkv) if m == "o" else lin(heads * dkv, d))
        sd[f"{t}.0.layer_norm.weight"] = np.ones(d, np.float32)
        sd[f"{t}.1.DenseReluDense.wi.weight"] = lin(dff, d)
        sd[f"{t}.1.DenseReluDense.wo.weight"] = lin(d, dff)
        sd[f"{t}.1.layer_norm.weight"] = np.ones(d, np.float32)
    for i in range(n_dec):
        t = f"decoder.block.{i}.layer"
        for m in "qkvo":
            sd[f"{t}.0.SelfAttention.{m}.weight"] = (
                lin(d, heads * dkv) if m == "o" else lin(heads * dkv, d))
            sd[f"{t}.1.EncDecAttention.{m}.weight"] = (
                lin(d, heads * dkv) if m == "o" else lin(heads * dkv, d))
        sd[f"{t}.0.layer_norm.weight"] = np.ones(d, np.float32)
        sd[f"{t}.1.layer_norm.weight"] = np.ones(d, np.float32)
        sd[f"{t}.2.DenseReluDense.wi.weight"] = lin(dff, d)
        sd[f"{t}.2.DenseReluDense.wo.weight"] = lin(d, dff)
        sd[f"{t}.2.layer_norm.weight"] = np.ones(d, np.float32)
    sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = lin(nb, heads)
    sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = lin(nb, heads)

    p = import_hf_t5(sd)
    assert sum(1 for k in p if k.startswith("encoder_layer")) == n_enc
    assert sum(1 for k in p if k.startswith("decoder_layer")) == n_dec

    back = export_hf_t5(p)
    assert sum(1 for k in back
               if k.startswith("encoder.block") and k.endswith("wi.weight")) == n_enc
    assert sum(1 for k in back
               if k.startswith("decoder.block") and k.endswith("wi.weight")) == n_dec
    np.testing.assert_array_equal(
        back["encoder.block.2.layer.1.DenseReluDense.wi.weight"],
        sd["encoder.block.2.layer.1.DenseReluDense.wi.weight"],
    )
