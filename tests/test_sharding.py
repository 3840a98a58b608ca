"""Multi-chip path: sharding rules + one sharded dp x tp train step on the
8-device virtual CPU mesh (what the driver's dryrun_multichip validates)."""
import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from mmdx_tpu.parallel.mesh import make_mesh
from mmdx_tpu.parallel.sharding import spec_for_path, variable_shardings


def test_spec_rules():
    assert spec_for_path("params/text_encoder/bert/layer0/ffn_in/kernel") == P(None, "model")
    assert spec_for_path("text_encoder/bert/layer3/ffn_out/kernel") == P("model", None)
    assert spec_for_path("fusion/report_model/decoder_layer0/self_attn/q/kernel") == P(None, "model")
    assert spec_for_path("fusion/report_model/decoder_layer0/self_attn/o/kernel") == P("model", None)
    assert spec_for_path("fusion/cond_proj/kernel") == P(None, "model")
    # replicated: convs, norms, embeddings, heads
    assert spec_for_path("image_encoder/backbone/conv_stem/kernel") == P()
    assert spec_for_path("fusion/disease_head/kernel") == P()
    assert spec_for_path("text_encoder/bert/word_embeddings/embedding") == P()


def test_indivisible_falls_back_to_replication():
    mesh = make_mesh(n_model=2)
    # ffn kernel with odd output dim can't split 2 ways -> replicate
    tree = {"ffn_in": {"kernel": np.zeros((8, 7), np.float32)}}
    sh = variable_shardings(tree, mesh)
    assert sh["ffn_in"]["kernel"].spec == P()
    tree = {"ffn_in": {"kernel": np.zeros((8, 8), np.float32)}}
    sh = variable_shardings(tree, mesh)
    assert sh["ffn_in"]["kernel"].spec == P(None, "model")


@pytest.mark.parametrize("n_model", [1, 2])
def test_sharded_joint_train_step(n_model):
    """One real dp x tp step of the full model on the virtual 8-device mesh."""
    import jax.numpy as jnp

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.models.diagnosis import MultiModalDiagnosisModel
    from mmdx_tpu.parallel.sharding import shard_batch, shard_variables
    from mmdx_tpu.parallel.train import (
        build_joint_optimizer,
        make_joint_batch,
        make_sharded_train_step,
    )
    from mmdx_tpu.pipelines.training_pipeline import TrainState

    mesh = make_mesh(n_model=n_model)
    bundle = new_random_bundle(seed=0, small=True)
    model = MultiModalDiagnosisModel(config=bundle.config)
    variables = shard_variables(bundle.variables, mesh)
    tx = build_joint_optimizer(variables["params"])
    state = TrainState.create(variables["params"], tx, variables.get("batch_stats", {}))
    batch = make_joint_batch(jax.random.key(0), bundle.config, 8, report_len=8)
    batch = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)

    step_fn = make_sharded_train_step(model, tx, mesh, state, batch)
    new_state, loss = step_fn(state, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1
    # tp-sharded params keep their sharding after the update
    if n_model == 2:
        k = new_state.params["fusion"]["cond_proj"]["kernel"]
        assert k.sharding.spec == P(None, "model")


def test_multichip_inference_engine(rng):
    """Data-parallel serving over the virtual 8-device mesh matches single-device."""
    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.runtime.engine import InferenceEngine

    bundle = new_random_bundle(seed=0, small=True)
    imgs = [rng.integers(0, 256, (96, 96), dtype=np.uint8) for _ in range(8)]
    texts = [f"patient {i} cough fever" for i in range(8)]

    single = InferenceEngine(bundle, mode="parity")
    p1, _, _ = single.classify_batch(imgs, texts)

    mesh = make_mesh(n_model=1)
    multi = InferenceEngine(bundle, mode="parity", mesh=mesh)
    p8, _, _ = multi.classify_batch(imgs, texts)
    np.testing.assert_allclose(p1, p8, rtol=1e-5, atol=1e-6)

    # batches NOT divisible by the dp degree pad internally and un-pad on the
    # way out — any batch size works on any mesh
    for n in (1, 3, 5):
        pn, zi, zt = multi.classify_batch(imgs[:n], texts[:n])
        assert pn.shape == (n, 13) and zi.shape[0] == n and zt.shape[0] == n
        np.testing.assert_allclose(p1[:n], pn, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_model", [1, 2])
def test_multichip_generation(rng, n_model):
    """Beam + greedy report generation shards over the mesh (dp-only AND
    dp x tp: the T5 decoder's qkv/o/ffn kernels split over "model") and
    matches the single-device decode TOKEN-for-token (incl. a batch not
    divisible by dp)."""
    import dataclasses

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.runtime.engine import InferenceEngine

    bundle = new_random_bundle(seed=0, small=True)
    gen = dataclasses.replace(
        bundle.config.generation, max_new_tokens=10, min_new_tokens=4
    )
    zi = rng.standard_normal((5, bundle.config.fusion.d_img)).astype(np.float32)
    zt = rng.standard_normal((5, bundle.config.fusion.d_txt)).astype(np.float32)

    single = InferenceEngine(bundle, mode="parity")
    mesh = make_mesh(n_model=n_model)
    multi = InferenceEngine(bundle, mode="parity", mesh=mesh)
    if n_model == 2:
        # the tp split must actually engage (not silently replicate) for
        # this to certify tensor-parallel decode
        from jax.sharding import PartitionSpec

        sh = multi.variables["params"]["fusion"]["report_model"]
        leaf = sh["decoder_layer0"]["self_attn"]["q"]["kernel"]
        assert leaf.sharding.spec == PartitionSpec(None, "model")
    for greedy in (False, True):
        ids1 = single.generate_report_ids(zi, zt, gen=gen, greedy=greedy)
        idsm = multi.generate_report_ids(zi, zt, gen=gen, greedy=greedy)
        np.testing.assert_array_equal(ids1, idsm)
        assert idsm.shape[0] == 5
