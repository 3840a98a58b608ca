"""Offline batch-inference CLI: JSONL contract + details mapping."""
import json

from mmdx_tpu.checkpoints.bundle import new_random_bundle, save_bundle
from mmdx_tpu.config import DISEASES
from mmdx_tpu.pipelines.batch_inference import main


def test_batch_inference_cli(tmp_path, sample_image_paths):
    bundle = new_random_bundle(seed=0, small=True)
    bpath = tmp_path / "b.mmdx"
    save_bundle(bundle, bpath, timestamped_copy=False)
    details = {sample_image_paths[0].name: "62 year old male, cough"}
    dpath = tmp_path / "details.json"
    dpath.write_text(json.dumps(details))
    out = tmp_path / "out.jsonl"

    main([
        "--images", str(sample_image_paths[0].parent),
        "--out", str(out),
        "--bundle", str(bpath),
        "--details-json", str(dpath),
        "--gen", "off",
        "--batch", "2",
    ])

    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == len(list(
        p for p in sample_image_paths[0].parent.iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp")
    ))
    for row in lines:
        assert set(row) == {"image", "report_text", "disease_probs",
                            "disease_vector", "model_version"}
        assert list(row["disease_probs"]) == DISEASES
        assert all(0.0 <= v <= 1.0 for v in row["disease_probs"].values())
        assert len(row["disease_vector"]) == 13
        assert row["report_text"] == ""  # --gen off
    assert lines[0]["model_version"] == bundle.version
