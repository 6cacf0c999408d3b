"""Training-trajectory equivalence against an independent torch recipe.

The composed-network oracle (test_full_model_oracle.py) pins one forward +
backward. This file pins the TRAINING DYNAMICS: the production train step
(`make_train_step`: forward_sequence → Total_Loss → BPTT → Adam →
MultiStepLR) run for several optimizer steps against a test-local torch
replica of the reference recipe — torch.optim.Adam + MultiStepLR +
the published loss formulas (train.py:126-128: Adam lr=2e-4,
MultiStepLR milestones γ=0.5; loss.py:110-135: Σ_scales SI + 0.5·Σ GM) —
starting from the SAME interop-exported weights and fed the SAME batches.

Per-step losses, per-step MDE, and the final parameters must agree. This
catches everything the one-shot oracle cannot: optimizer semantics (bias
correction, eps placement), LR-schedule boundary conventions, loss
composition over a real batch (pooled masked statistics with B > 1), and
state threading across steps. Everything runs float64 (both frameworks),
which the train step preserves end-to-end (steps.py::_to_master).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from test_full_model_oracle import HW, TorchStereoSpike, _f64
from test_objectives import _torch_gm, _torch_mde, _torch_si

from stereospike_tpu.interop import _CONV_SITES, _get, params_to_torch_state_dict
from stereospike_tpu.models import init_params, stereospike
from stereospike_tpu.objectives.losses import TotalLossConfig
from stereospike_tpu.train.state import (
    create_train_state,
    make_optimizer,
    multistep_lr_schedule,
)
from stereospike_tpu.train.steps import make_train_step

N_STEPS = 4
MILESTONES = (2, 3)  # LR halves at steps 2 and 3: both boundaries exercised
LR = 2e-4


@pytest.fixture()
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _make_batches(n, batch=2):
    """n fixed batches: poisson event frames, positive GT, ~20% invalid."""
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n):
        chunks = rng.poisson(0.4, (batch, 1, *HW, 4)).astype(np.float64)
        gt = rng.uniform(1.0, 9.0, (batch, *HW, 1))
        mask = rng.random((batch, *HW, 1)) > 0.2
        out.append({
            "chunks": jnp.asarray(chunks),
            "gt": jnp.asarray(np.where(mask, gt, 0.0)),
            "mask": jnp.asarray(mask),
            "gt_nan": np.where(mask, gt, np.nan),  # torch-side view
        })
    return out


def _torch_total_loss(depths, gt_nan):
    # reference Total_Loss defaults: scale_weights=(1,1,1,1), alpha=0.5,
    # penalize_spikes=False (loss.py:110-135)
    si = sum(_torch_si(d, gt_nan) for d in depths)
    gm = sum(_torch_gm(d, gt_nan) for d in depths)
    return si + 0.5 * gm


def test_training_trajectory_matches_torch(x64):
    cfg = stereospike(in_hw=HW)
    params = _f64(init_params(jax.random.PRNGKey(0), cfg))
    batches = _make_batches(N_STEPS)

    # ---- JAX side: the production train step, float64 end to end
    sched = multistep_lr_schedule(LR, MILESTONES, 0.5, steps_per_epoch=1)
    tx = make_optimizer(sched)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx,
                                   compute_dtype=jnp.float64))
    jax_losses, jax_mdes = [], []
    for b in batches:
        state, metrics = step(
            state, {k: v for k, v in b.items() if k != "gt_nan"})
        jax_losses.append(float(metrics["loss"]))
        jax_mdes.append(float(metrics["mde"]))

    # ---- torch side: same exported weights, torch Adam + MultiStepLR
    sd = {k: torch.tensor(np.asarray(v, np.float64), requires_grad=True)
          for k, v in params_to_torch_state_dict(params).items()}
    opt = torch.optim.Adam(sd.values(), lr=LR, betas=(0.9, 0.999), eps=1e-8)
    lr_sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=list(MILESTONES), gamma=0.5)
    torch_losses, torch_mdes = [], []
    for b in batches:
        # ascontiguousarray: torch.tensor preserves numpy strides, and the
        # f64 CPU conv backward (slow_conv2d) rejects non-contiguous inputs
        frames = torch.tensor(np.ascontiguousarray(
            np.moveaxis(np.asarray(b["chunks"]), -1, 2)))
        gt_nan = torch.tensor(np.ascontiguousarray(
            np.moveaxis(b["gt_nan"], -1, 1)))
        oracle = TorchStereoSpike(sd, cfg)  # fresh state: reset_net per step
        depths, _ = oracle.step(frames[:, 0])
        loss = _torch_total_loss(depths, gt_nan)
        opt.zero_grad()
        loss.backward()
        opt.step()
        lr_sched.step()
        torch_losses.append(float(loss.detach()))
        torch_mdes.append(float(_torch_mde(depths[0].detach(), gt_nan)))

    # per-step loss/MDE trajectories (LR boundaries included) agree
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-9)
    np.testing.assert_allclose(jax_mdes, torch_mdes, rtol=1e-9)
    # the LR schedule actually dropped: the post-milestone steps moved
    # params by roughly half — sanity that the boundary case is exercised
    assert float(lr_sched.get_last_lr()[0]) == pytest.approx(LR / 4)

    # final parameters agree tensor-for-tensor after N_STEPS Adam updates
    checked = 0
    for path, stem in _CONV_SITES:
        try:
            leaf = _get(state.params, path)
        except (KeyError, TypeError):
            continue
        w = np.asarray(leaf["w"]).transpose(3, 2, 0, 1)
        np.testing.assert_allclose(
            w, sd[f"{stem}.weight"].detach().numpy(),
            rtol=1e-8, atol=1e-11, err_msg=stem)
        checked += 1
        if "b" in leaf:
            np.testing.assert_allclose(
                np.asarray(leaf["b"]), sd[f"{stem}.bias"].detach().numpy(),
                rtol=1e-8, atol=1e-11, err_msg=f"{stem}.bias")
    assert checked >= 17  # every conv site took identical Adam trajectories
