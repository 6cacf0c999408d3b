"""Reference-checkpoint interop: torch state_dict ↔ parameter pytree.

Pins the key mapping and the OIHW↔HWIO orientation against torch itself
(the orientation oracle builds a real ``torch.nn.Conv2d`` from the exported
weight and compares outputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from stereospike_tpu.interop import (
    load_torch_checkpoint,
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)
from stereospike_tpu.models import forward, init_params
from stereospike_tpu.models.factory import (
    stereospike,
    stereospike_cutpredict,
    stereospike_tempo,
)
from stereospike_tpu.nn.layers import conv2d


@pytest.mark.parametrize("factory,learnable", [
    (stereospike, False),
    (stereospike_tempo, False),
    (stereospike_tempo, True),
    (stereospike_cutpredict, False),
])
def test_state_dict_round_trip(factory, learnable):
    cfg = factory(in_hw=(64, 88))
    if learnable:
        import dataclasses

        cfg = dataclasses.replace(cfg, learnable_multiply=True,
                                  multiply_factor=10.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    sd = params_to_torch_state_dict(params)
    back = params_from_torch_state_dict(sd, cfg)
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [k for k, _ in flat1] == [k for k, _ in flat2]
    for (k, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))


def test_reference_key_layout_and_orientation():
    """Exported keys follow the reference module tree, and the exported
    OIHW weight drives a real torch Conv2d to the same numbers as ours."""
    cfg = stereospike_tempo(in_hw=(64, 88))
    params = init_params(jax.random.PRNGKey(1), cfg)
    sd = params_to_torch_state_dict(params)

    # reference key spellings (SNN_models.py module tree)
    for key in ("bottom.0.weight", "conv4.0.weight",
                "bottleneck.0.conv1.0.weight", "bottleneck.1.conv2.0.weight",
                "deconv1.0.up.1.weight", "predict_depth1.0.up.1.weight",
                "predict_depth1.0.up.1.bias",
                "bottom.2.w", "bottleneck.0.sn1.w"):
        assert key in sd, key
    assert sd["bottom.0.weight"].shape == (32, 4, 5, 5)          # OIHW
    assert sd["deconv1.0.up.1.weight"].shape == (32, 64, 5, 5)
    # SpikingJelly's ParametricLIFNode.w is 0-dim; a [1] export would fail
    # the reference's load_state_dict size check
    assert sd["bottom.2.w"].shape == ()

    # orientation oracle: torch conv with the exported weight == our conv2d
    m = torch.nn.Conv2d(4, 32, 5, stride=1, padding=2, bias=False)
    with torch.no_grad():
        m.weight.copy_(torch.as_tensor(sd["bottom.0.weight"]))
    x = np.random.default_rng(0).normal(size=(2, 4, 16, 20)).astype(np.float32)
    ref = m(torch.as_tensor(x)).detach().numpy()
    ours = conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                  params["bottom"]["w"], stride=1, padding=2)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_pth_file_load_and_forward():
    cfg = stereospike(in_hw=(64, 88))
    params = init_params(jax.random.PRNGKey(2), cfg)
    sd = {k: torch.as_tensor(v) for k, v in
          params_to_torch_state_dict(params).items()}
    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "stereospike.pth")
    torch.save(sd, path)
    loaded = load_torch_checkpoint(path, cfg)
    frame = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 88, 4))
    d1, _, _ = forward(params, frame, cfg)
    d2, _, _ = forward(loaded, frame, cfg)
    np.testing.assert_array_equal(np.asarray(d1[0]), np.asarray(d2[0]))


def test_strict_rejects_foreign_and_mismatched():
    cfg = stereospike(in_hw=(64, 88))
    params = init_params(jax.random.PRNGKey(4), cfg)
    sd = params_to_torch_state_dict(params)

    sd_extra = dict(sd, **{"some.ann.bn.running_mean": np.zeros(32)})
    with pytest.raises(KeyError, match="unmapped"):
        params_from_torch_state_dict(sd_extra, cfg)
    # non-strict tolerates the stray key
    params_from_torch_state_dict(sd_extra, cfg, strict=False)

    with pytest.raises(KeyError, match="missing"):
        params_from_torch_state_dict(
            {k: v for k, v in sd.items() if k != "conv2.0.weight"}, cfg)

    # binocular checkpoint into a monocular config
    from stereospike_tpu.models.factory import stereospike_monocular

    with pytest.raises(ValueError, match="monocular"):
        params_from_torch_state_dict(sd, stereospike_monocular(in_hw=(64, 88)))


def test_driver_import_pth(tmp_path):
    """--import-pth on the eval driver: a reference .pth drives eval."""
    import os

    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import eval_loop

    cfg = TrainConfig(model="stereospike_tempo", in_hw=(48, 64),
                      batch_size=2, multiply_factor=10.0,
                      checkpoint_dir=str(tmp_path / "ck"))
    from stereospike_tpu.train.loop import build_model_config

    model_cfg = build_model_config(cfg)
    params = init_params(jax.random.PRNGKey(7), model_cfg)
    sd = {k: torch.as_tensor(v) for k, v in
          params_to_torch_state_dict(params).items()}
    pth = str(tmp_path / "ref.pth")
    torch.save(sd, pth)

    out = eval_loop(
        TrainConfig(**{**cfg.__dict__, "import_pth": pth}), synthetic=True)
    assert np.isfinite(out["test_loss"]) and out["n_batches"] > 0


def test_ann_state_dict_round_trip_and_driver():
    """ANN interop: round trip + reference key layout + driver eval from a
    .pth (the reference's committed test.py evaluates the ANN checkpoint)."""
    import tempfile, os

    from stereospike_tpu.interop import (
        ann_params_from_torch_state_dict,
        ann_params_to_torch_state_dict,
    )
    from stereospike_tpu.models.ann import (
        AnnConfig,
        init_ann_params,
        init_ann_state,
    )

    cfg = AnnConfig(in_hw=(64, 88))
    params = init_ann_params(jax.random.PRNGKey(0), cfg)
    bn_state = init_ann_state(cfg)
    sd = ann_params_to_torch_state_dict(params, bn_state)

    # reference module-tree key spellings (ANN_models.py: BN at index 2)
    for key in ("bottom.0.weight", "bottom.0.bias", "bottom.2.running_mean",
                "bottleneck.0.conv1.0.weight", "bottleneck.1.conv2.2.weight",
                "deconv1.0.up.1.weight", "deconv1.2.running_var",
                "predict_depth1.0.up.1.bias"):
        assert key in sd, key

    p2, s2 = ann_params_from_torch_state_dict(sd)
    for tree_a, tree_b in ((params, p2), (bn_state, s2)):
        flat1 = jax.tree_util.tree_flatten_with_path(tree_a)[0]
        flat2 = jax.tree_util.tree_flatten_with_path(tree_b)[0]
        assert [k for k, _ in flat1] == [k for k, _ in flat2]
        for (k, a), (_, b) in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(k))

    # SNN loader must reject an ANN checkpoint
    with pytest.raises(KeyError):
        params_from_torch_state_dict(sd, stereospike(in_hw=(64, 88)))
    # ANN loader must reject an SNN checkpoint
    snn_sd = params_to_torch_state_dict(
        init_params(jax.random.PRNGKey(1), stereospike(in_hw=(64, 88))))
    with pytest.raises(KeyError):
        ann_params_from_torch_state_dict(snn_sd)

    # driver: eval an exported ANN .pth
    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import eval_loop

    tmp = tempfile.mkdtemp()
    pth = os.path.join(tmp, "ann.pth")
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, pth)
    out = eval_loop(TrainConfig(model="ann_sigmoid", in_hw=(64, 88),
                                batch_size=2, import_pth=pth,
                                checkpoint_dir=os.path.join(tmp, "ck")),
                    synthetic=True)
    assert np.isfinite(out["test_loss"]) and out["n_batches"] > 0


def test_cutpredict_export_includes_defined_pred4():
    """The reference cut-predict class still DEFINES predict_depth4
    (SNN_models.py:835), so its strict load_state_dict demands those keys;
    export must synthesize them for a pytree without a pred4 leaf, and
    import must drop (not load) the dead tensors."""
    from stereospike_tpu.interop import (
        params_from_torch_state_dict,
        params_to_torch_state_dict,
    )
    from stereospike_tpu.models import init_params
    from stereospike_tpu.models.factory import stereospike_cutpredict

    cfg = stereospike_cutpredict(in_hw=(48, 64))
    assert cfg.heads == (1, 2, 3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "pred4" not in params

    sd = params_to_torch_state_dict(params)
    assert "predict_depth4.0.up.1.weight" in sd
    assert sd["predict_depth4.0.up.1.weight"].shape == (1, 256, 3, 3)
    assert not sd["predict_depth4.0.up.1.weight"].any()

    # round trip: the synthesized head keys are consumed (strict passes)
    # but do NOT become pytree leaves
    back = params_from_torch_state_dict(sd, cfg, strict=True)
    assert "pred4" not in back
    np.testing.assert_array_equal(np.asarray(back["pred1"]["w"]),
                                  np.asarray(params["pred1"]["w"]))


def test_cutpredict_learnable_scale_does_not_resurrect_pred4():
    """Regression: a learnable-scale reference .pth carries
    predict_depth4.1.scale_value; the scale-loading loop must not fold it
    into a dead params['pred4'] subtree (which would get optimizer state
    on an import_pth warm start and crash a later export's zero-fill,
    which keys off the subtree's absence)."""
    import dataclasses

    from stereospike_tpu.interop import (
        params_from_torch_state_dict,
        params_to_torch_state_dict,
    )
    from stereospike_tpu.models import init_params
    from stereospike_tpu.models.factory import stereospike_cutpredict

    cfg = dataclasses.replace(stereospike_cutpredict(in_hw=(48, 64)),
                              learnable_multiply=True, multiply_factor=10.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "pred4" not in params
    sd = params_to_torch_state_dict(params)
    assert "predict_depth4.1.scale_value" in sd  # synthesized for strict

    back = params_from_torch_state_dict(sd, cfg, strict=True)
    assert "pred4" not in back          # the dead head stays dead
    # and the re-export round trip must not crash on the missing 'w'
    sd2 = params_to_torch_state_dict(back)
    assert set(sd2) == set(sd)
