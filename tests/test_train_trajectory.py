"""K-step training-trajectory parity vs the reference torch code.

Forward parity (test_vlsa_full_parity) and per-component optimizer/loss
parity are necessary but not sufficient: composition bugs — accumulation
order, weight-decay placement (torch Adam adds L2 to the gradient BEFORE
the moments), the timm decay/no-decay split (scalars like logit_scale DO
decay, ref optim/optim_factory.py:25-37), EMD-target gradients, frozen-
tower masking — only show up over a full optimization trajectory.

These tests run K Adam updates on identical fixed data through

  * the reference semantics: per-bag forwards, concatenated batch loss,
    loss.backward(), optimizer.step() — a faithful mirror of
    ref runner/base_handler.py:491-520 / vlsa_handler.py:260-289 driving
    the REAL reference model + loss + optimizer-factory code, and
  * our production `TrainEngine` batched step with the optax factory,

and assert the per-step loss trajectories and the final parameters agree
to float32 tolerance.  SA/ABMIL (SurvIFMLE) and full VLSA
(SurvIFMLE + SurvEMD with live logit_scale, frozen text tower) both run.
"""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import reference_available, add_reference_to_path
from test_prompt_parity import _install_stubs

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not reference_available(),
                                 reason="reference repo not mounted")]

BP_EVERY, K_UPDATES = 4, 20
N_PATCH, DIM_IN, NUM_BINS = 64, 32, 6
LR, WD = 2e-4, 1e-5


def _make_data(n_bags, num_bins, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(n_bags, N_PATCH, DIM_IN)).astype(np.float32)
    t = rng.integers(0, num_bins, size=n_bags).astype(np.int64)
    e = rng.integers(0, 2, size=n_bags).astype(np.float32)
    return feats, t, e


def _ref_optimizer(model):
    """The REAL reference optimizer factory (timm add_weight_decay split +
    torch.optim.Adam), exactly as the runner wires it
    (ref runner/base_handler.py:181-186)."""
    from optim.optim_factory import create_optimizer as ref_create
    args = types.SimpleNamespace(opt="adam", lr=LR, weight_decay=WD)
    return ref_create(args, model)


def _ref_update(net, optimizer, loss_fn, bags, t, e):
    """Mirror of _update_network (ref runner/base_handler.py:491-520):
    forward each bag separately, concat, one batch loss, backward, step."""
    import torch
    y_hat = []
    for i in range(len(bags)):
        pred = net(torch.tensor(bags[i][None]))
        if isinstance(pred, tuple):
            pred = pred[0]
        y_hat.append(pred)
    optimizer.zero_grad()
    bag_preds = torch.cat(y_hat, dim=0)
    loss = loss_fn(bag_preds, torch.tensor(t), torch.tensor(e))
    loss.backward()
    optimizer.step()
    return float(loss.item())


def _our_engine(model, params, loss_fns, weights, uses_vl, frozen=None):
    from vlsa_tpu.optim import create_optimizer
    from vlsa_tpu.runner.engine import TrainEngine, make_objective

    tx = create_optimizer("adam", LR, WD, params, frozen=frozen)
    objective = make_objective(
        loss_fns, weights, lambda x: jax.nn.softmax(x, axis=-1), uses_vl)
    eng = TrainEngine(model, tx, objective, uses_vl=uses_vl, frozen=frozen)
    return eng, tx.init(params)


def _run_ours(eng, params, opt_state, feats, t, e):
    step = eng.train_step()
    losses = []
    n_bags = feats.shape[0]
    for u in range(K_UPDATES):
        lo = (u * BP_EVERY) % n_bags
        batch = {
            "feats": jnp.asarray(feats[lo:lo + BP_EVERY]),
            "mask": jnp.ones((BP_EVERY, N_PATCH), bool),
            "t": jnp.asarray(t[lo:lo + BP_EVERY], jnp.int32),
            "e": jnp.asarray(e[lo:lo + BP_EVERY], jnp.float32),
            "valid": jnp.ones((BP_EVERY,), bool),
        }
        params, opt_state, loss, _raw = step(params, opt_state, batch,
                                             jax.random.PRNGKey(u))
        losses.append(float(loss))
    return params, np.array(losses)


def test_sa_abmil_20_step_trajectory_parity():
    add_reference_to_path()
    _install_stubs()
    import torch
    from loss.loss_surv import SurvIFMLE as RefSurvIFMLE
    from model.deepmil import DeepMIL as RefDeepMIL

    from vlsa_tpu.losses import surv_ifmle
    from vlsa_tpu.models import DeepMIL
    from vlsa_tpu.utils.torch_import import import_deepmil_state

    torch.manual_seed(0)
    ref = RefDeepMIL(dim_in=DIM_IN, dim_hid=16, num_cls=NUM_BINS,
                     use_feat_proj=True, pooling="attention",
                     pred_head="default")
    ref.train()
    # .copy(): the imported arrays must SNAPSHOT the torch tensors — the ref
    # optimizer below updates them in place, and numpy views would alias
    params = import_deepmil_state(
        {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()})
    ours = DeepMIL(dim_in=DIM_IN, dim_hid=16, num_cls=NUM_BINS,
                   use_feat_proj=True, pooling="attention",
                   pred_head="default")

    feats, t, e = _make_data(16, NUM_BINS)
    ref_loss = RefSurvIFMLE()  # alpha=0, as the shipped configs use

    def loss_fn(preds, tt, ee):
        # base_handler.calc_objective_loss: softmax converter, then loss on
        # (converted, t[:, None], e[:, None])
        return ref_loss(torch.softmax(preds, dim=-1),
                        tt.view(-1, 1), ee.view(-1, 1))

    opt = _ref_optimizer(ref)
    ref_losses = []
    for u in range(K_UPDATES):
        lo = (u * BP_EVERY) % 16
        ref_losses.append(_ref_update(
            ref, opt, loss_fn, feats[lo:lo + BP_EVERY],
            t[lo:lo + BP_EVERY], e[lo:lo + BP_EVERY]))

    eng, opt_state = _our_engine(ours, params, {"SurvIFMLE": surv_ifmle},
                                 {"SurvIFMLE": 1.0}, uses_vl=False)
    new_params, our_losses = _run_ours(eng, params, opt_state, feats, t, e)

    np.testing.assert_allclose(our_losses, np.array(ref_losses),
                               rtol=2e-4, atol=2e-5,
                               err_msg="per-step loss trajectories diverged")

    # final models must agree on predictions (tight: output-relevant
    # directions track exactly)
    with __import__("torch").no_grad():
        import torch
        ref.eval()
        want_logits = torch.cat(
            [ref(torch.tensor(feats[i][None])) for i in range(16)], 0).numpy()
    got_logits = np.asarray(ours.apply(
        {"params": new_params}, jnp.asarray(feats),
        mask=jnp.ones((16, N_PATCH), bool)))
    np.testing.assert_allclose(got_logits, want_logits, rtol=2e-3, atol=2e-4,
                               err_msg="final-model predictions diverged")

    # per-param check is necessarily looser: the attention pooling's final
    # bias (sigma.fc2_bias) is a softmax GAUGE direction — its true gradient
    # is 0, so Adam turns float noise into lr-sized random-sign steps on
    # both sides (the reference drifts the same way between its own CPU/GPU
    # runs); output-relevant directions are pinned by the logits check above
    want = import_deepmil_state(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(new_params))
    assert flat_w and len(flat_w) == len(flat_g)
    for path, w in flat_w:
        np.testing.assert_allclose(
            np.asarray(flat_g[path]), w, rtol=5e-3, atol=2e-3,
            err_msg=f"param {jax.tree_util.keystr(path)} diverged after "
                    f"{K_UPDATES} updates")


def test_vlsa_20_step_trajectory_parity():
    """Full VLSA: SurvIFMLE + SurvEMD (logit-scale-aware target), frozen
    CONCH-size text tower, trainable prompt embeds / visual adapter /
    TaskRes residuals / logit_scale — 20 batched Adam updates vs the
    reference's per-bag accumulation semantics."""
    add_reference_to_path()
    _install_stubs()
    import torch

    from test_vlsa_full_parity import LEARNABLE_KEYS, build_vlsa_pair
    from loss.loss_surv import SurvIFMLE as RefSurvIFMLE
    from loss.loss_surv_ext import SurvEMD as RefSurvEMD

    from vlsa_tpu.losses import surv_emd, surv_ifmle
    from vlsa_tpu.optim import frozen_mask_from_cfg
    from vlsa_tpu.utils.torch_import import import_vlsa_learnable_state

    ref_model, model, params = build_vlsa_pair(drop_rate=0.0)
    # snapshot: build_vlsa_pair imports numpy VIEWS of the torch tensors;
    # the ref optimizer below updates them in place
    params = jax.tree.map(lambda v: np.array(v, copy=True), params)
    ref_model.train()
    # the runner freezes the text tower (ref vlsa_handler.py:126-149 via
    # requires_grad=False, ref utils/func.py:155-176)
    for p in ref_model.prompt_encoder.parameters():
        p.requires_grad = False

    feats, t, e = _make_data(16, NUM_BINS, seed=3)
    ref_ifmle, ref_emd = RefSurvIFMLE(), RefSurvEMD(p=2)

    def loss_fn(preds, tt, ee):
        # vlsa_handler.calc_objective_loss: softmax-converted IFMLE +
        # logit-scale-aware SurvEMD (ref vlsa_handler.py:241-258)
        conv = torch.softmax(preds, dim=-1)
        ls = ref_model.get_logit_scale()
        return (ref_ifmle(conv, tt.view(-1, 1), ee.view(-1, 1))
                + ref_emd(conv, tt.view(-1, 1), ee.view(-1, 1), ls))

    opt = _ref_optimizer(ref_model)
    ref_losses = []
    for u in range(K_UPDATES):
        lo = (u * BP_EVERY) % 16
        ref_losses.append(_ref_update(
            ref_model, opt, loss_fn, feats[lo:lo + BP_EVERY],
            t[lo:lo + BP_EVERY], e[lo:lo + BP_EVERY]))

    frozen = frozen_mask_from_cfg(params, ["prompt_encoder"])
    eng, opt_state = _our_engine(
        model, params, {"SurvIFMLE": surv_ifmle, "SurvEMD": surv_emd},
        {"SurvIFMLE": 1.0, "SurvEMD": 1.0}, uses_vl=True, frozen=frozen)
    new_params, our_losses = _run_ours(eng, params, opt_state, feats, t, e)

    # SurvEMD's (sum |dCDF|^p)^(1/p) has unbounded slope at 0 distance: with
    # saturated (logit_scale ~100x) softmaxes the distance occasionally sits
    # at the cliff, where benign ~1e-6 f32 framework drift turns into a
    # ~1e-2 LOSS blip at that one step without forking the trajectory (the
    # surrounding steps re-match to 1e-6).  Require every step loosely and
    # nearly all steps tightly; the final-parameter check below pins the
    # trajectory itself.
    ref_losses = np.array(ref_losses)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-2, atol=1e-3,
                               err_msg="per-step loss trajectories diverged")
    tight = np.isclose(our_losses, ref_losses, rtol=5e-4, atol=5e-5)
    assert tight.sum() >= K_UPDATES - 2, (
        f"only {int(tight.sum())}/{K_UPDATES} steps match tightly: "
        f"{our_losses} vs {ref_losses}")

    # final learnable params must coincide (same import mapping)
    state = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()
             if k in LEARNABLE_KEYS}
    want = import_vlsa_learnable_state(jax.tree.map(np.asarray, new_params),
                                       state)
    for path_want, path_got in [(want, new_params)]:
        flat_w = jax.tree_util.tree_leaves_with_path(path_want)
        flat_g = dict(jax.tree_util.tree_leaves_with_path(path_got))
        for path, w in flat_w:
            g = np.asarray(flat_g[path])
            if np.allclose(w, g, rtol=1e-3, atol=1e-4):
                continue
            raise AssertionError(
                f"param {jax.tree_util.keystr(path)} diverged after "
                f"{K_UPDATES} updates: max dev "
                f"{np.abs(np.asarray(w) - g).max():.2e}")
