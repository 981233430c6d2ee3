"""Jitted train/eval steps with mesh sharding.

TPU-first replacement of the reference's per-bag Python training loop
(ref runner/base_handler.py:433-520): one compiled step consumes a whole
padded mini-batch of bags (the reference's bp_every_batch accumulation
becomes a single batched forward — identical loss, one optimizer step),
computes every configured loss in-graph, and applies the optax update.

When a `jax.sharding.Mesh` is given, bags shard over the `data` axis (XLA
inserts the gradient all-reduce over ICI).  With `tensor_parallel` the text
tower's MLP hidden dim additionally shards over `model` (parallel.sharding
layouts), and with `seq_parallel` the patch axis N shards over `model` (the
VLFAN co-attention then runs the partial-softmax shard_map path).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel import batch_pspec, make_mesh, param_shardings  # noqa: F401


def _feats_inputs(model, batch: dict):
    """(feats, extra kwargs) for a model apply, handling the storage-dtype
    sidecar rows: models that understand them (VLSA -> VLFAN fused kernels)
    get `x_scale` (int8 dequant) / `x_inv` (precomputed 1/l2norm); anything
    else sees dequantized bf16 features and no sidecars."""
    accepts = getattr(model, "accepts_x_scale", False)
    if "feats_scale" in batch and not accepts:
        from ..ops.coattn import dequantize_feats
        feats = dequantize_feats(batch["feats"], batch["feats_scale"])
        return feats.astype(jnp.bfloat16), {}
    kws = {}
    if accepts:
        if "feats_scale" in batch:
            kws["x_scale"] = batch["feats_scale"]
        if "feats_inv" in batch:
            kws["x_inv"] = batch["feats_inv"]
    return batch["feats"], kws


def make_output_converter(name: Optional[str]) -> Callable:
    """ref utils/func.py:40-48."""
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "softmax":
        return lambda x: jax.nn.softmax(x, axis=-1)
    return lambda x: x


def make_objective(loss_fns: Dict[str, Callable], loss_weights: Dict[str, float],
                   converter: Callable, uses_vl: bool):
    """Build the multi-loss objective (ref runner/vlsa_handler.py:241-258 /
    sa_handler.py:172-180)."""

    def objective(raw_pred, t, e, sample_mask, logit_scale=None, query_div_fn=None):
        converted = converter(raw_pred)
        total = 0.0
        for name, fn in loss_fns.items():
            w = loss_weights.get(name, 1)
            if name == "SurvEMD":
                total += w * fn(converted, t, e, logit_scale, sample_mask=sample_mask)
            elif name == "SurvT2I":
                total += w * fn(raw_pred, t, e, logit_scale, sample_mask=sample_mask)
            elif name == "QueryDiv":
                total += w * query_div_fn()
            else:
                total += w * fn(converted, t, e, sample_mask=sample_mask)
        return total

    return objective


class TrainEngine:
    """Owns the jitted train/eval steps for one model + optimizer."""

    def __init__(self, model, tx, objective, uses_vl: bool,
                 has_query_div: bool = False, mesh: Optional[Mesh] = None,
                 donate: bool = True, accum_steps: int = 1,
                 frozen: Optional[dict] = None,
                 tensor_parallel: bool = False, seq_parallel: bool = False,
                 needs_hessian: bool = False):
        self.model = model
        self.tx = tx
        self.objective = objective
        self.uses_vl = uses_vl
        self.has_query_div = has_query_div
        self.mesh = mesh
        self.tensor_parallel = tensor_parallel
        self.seq_parallel = seq_parallel
        # adahessian: the step also computes a Hutchinson Hessian-diagonal
        # estimate (forward-over-reverse; custom-vjp Pallas kernels have no
        # JVP rule, so that step's trace is scoped through
        # ops.flags.disable_pallas and runs the XLA reference path)
        self.needs_hessian = needs_hessian
        # donate params/opt_state into the step so XLA aliases them in
        # place instead of holding old+new copies live (no-op on CPU, where
        # jit would only warn)
        self.donate = bool(donate) and jax.default_backend() in ("tpu", "gpu")
        # pytree of bools marking frozen subtrees: their leaves are
        # stop-gradient'd inside the loss so AD never runs the (potentially
        # huge) backward through them — mirroring torch requires_grad=False
        # (ref utils/func.py:155-176), which the optimizer-level zero-update
        # masking alone does not
        self.frozen = frozen
        # accum_steps > 1: lax.scan over microbatches inside the jitted step
        # (memory headroom for very long bags; valid-count-weighted combine
        # reproduces the accum=1 loss/gradient exactly for per-bag-mean
        # objectives even on padded ragged tails)
        self.accum_steps = accum_steps
        self._train_step = None
        self._eval_step = None

    # --- sharding helpers ---
    def shard_batch(self, batch: dict) -> dict:
        if self.mesh is None:
            return batch
        if jax.process_count() > 1 or getattr(self, "force_global_assembly", False):
            # multi-host: `batch` holds only this process's bags; assemble
            # the global arrays without cross-host transfers
            from ..parallel.multihost import make_global_batch
            return make_global_batch(batch, self.mesh, self.seq_parallel)
        specs = batch_pspec(self.seq_parallel)
        return {k: jax.device_put(v, NamedSharding(self.mesh, specs.get(k, P("data"))))
                for k, v in batch.items()}

    def replicate(self, tree):
        if self.mesh is None:
            return tree
        sharding = NamedSharding(self.mesh, P())
        return jax.device_put(tree, sharding)

    def shard_params(self, params):
        """Place params on the mesh: replicated, except the text-tower MLP
        when tensor_parallel (parallel.sharding.param_shardings layout)."""
        if self.mesh is None:
            return params
        shardings = param_shardings(params, self.mesh,
                                    tensor_parallel=self.tensor_parallel)
        return jax.tree.map(jax.device_put, params, shardings)

    def init_opt_state(self, params):
        """(Re)build the optimizer state from already-placed params under jit
        so moment tensors inherit each param's sharding (TP moments shard
        with their TP params instead of replicating)."""
        if self.mesh is None:
            return self.tx.init(params)
        return jax.jit(self.tx.init)(params)

    # --- steps ---
    def train_step(self):
        if self._train_step is not None:
            return self._train_step

        model, objective = self.model, self.objective
        uses_vl, has_qd = self.uses_vl, self.has_query_div
        tx = self.tx
        accum = self.accum_steps

        frozen = self.frozen

        def loss_fn(p, batch, rng):
            if frozen is not None:
                p = jax.tree.map(
                    lambda v, f: jax.lax.stop_gradient(v) if f else v,
                    p, frozen)
            extra = {k: batch[k] for k in ("cluster_id", "edge_index", "edge_valid")
                     if k in batch}
            feats, feat_kws = _feats_inputs(model, batch)
            out = model.apply({"params": p}, feats,
                              mask=batch["mask"], train=True,
                              rngs={"dropout": rng}, **extra, **feat_kws)
            raw = out[0] if isinstance(out, tuple) else out
            ls = jnp.exp(p["logit_scale"]) if uses_vl else None
            qd = (lambda: model.apply({"params": p}, method=model.query_div_loss)) \
                if has_qd else None
            sm = batch["valid"].astype(raw.dtype)
            loss = objective(raw, batch["t"], batch["e"], sm,
                             logit_scale=ls, query_div_fn=qd)
            return loss, raw

        donate_kw = dict(donate_argnums=(0, 1)) if self.donate else {}
        if self.needs_hessian:
            assert accum <= 1, "adahessian + accum_steps unsupported"
            from ..optim.extra import hutchinson_hessian_diag
            from ..ops.flags import disable_pallas

            @functools.partial(jax.jit, **donate_kw)
            def hstep(params, opt_state, batch, rng):
                (loss, raw), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch, rng)
                hd = hutchinson_hessian_diag(
                    lambda p: loss_fn(p, batch, rng)[0], params,
                    jax.random.fold_in(rng, 7))
                updates, new_opt_state = tx.update(grads, opt_state, params,
                                                   hessian_diag=hd)
                new_params = optax.apply_updates(params, updates)
                return new_params, new_opt_state, loss, raw

            def step(params, opt_state, batch, rng):
                # the Hutchinson jvp cannot differentiate custom_vjp Pallas
                # kernels; scope tracing (whenever jit decides to trace) to
                # the XLA reference path without the process-global env knob
                with disable_pallas():
                    return hstep(params, opt_state, batch, rng)
        elif accum <= 1:
            @functools.partial(jax.jit, **donate_kw)
            def step(params, opt_state, batch, rng):
                (loss, raw), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch, rng)
                updates, new_opt_state = tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                return new_params, new_opt_state, loss, raw
        else:
            @functools.partial(jax.jit, **donate_kw)
            def step(params, opt_state, batch, rng):
                B = batch["feats"].shape[0]
                assert B % accum == 0, "batch not divisible by accum_steps"
                mb = B // accum
                stacked = jax.tree.map(
                    lambda v: v.reshape((accum, mb) + v.shape[1:]), batch)
                rngs = jax.random.split(rng, accum)

                # Weight each microbatch by its VALID-bag count: tail
                # batches are padded (valid=False rows), and averaging
                # per-microbatch masked MEANS would weight a lone valid bag
                # in one microbatch as heavily as many in another.  The
                # weighted combine reproduces the accum=1 batched loss and
                # gradient exactly for per-bag-mean objectives (weights sum
                # to 1, so parameter-only terms like query_div/L1 are also
                # preserved); batch-coupled objectives (Cox risk sets,
                # SurvT2I columns) remain microbatch-restricted, as any
                # gradient accumulation must be.
                def scan_body(carry, xs):
                    micro, r = xs
                    (loss, raw), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params, micro, r)
                    w = jnp.sum(micro["valid"].astype(jnp.float32))
                    acc_grads, acc_loss, acc_w = carry
                    acc_grads = jax.tree.map(lambda a, g: a + w * g,
                                             acc_grads, grads)
                    return (acc_grads, acc_loss + w * loss, acc_w + w), raw

                zero = jax.tree.map(jnp.zeros_like, params)
                (grads, loss_sum, w_tot), raws = jax.lax.scan(
                    scan_body, (zero, 0.0, 0.0), (stacked, rngs))
                w_tot = jnp.maximum(w_tot, 1.0)
                grads = jax.tree.map(lambda g: g / w_tot, grads)
                updates, new_opt_state = tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                raw = raws.reshape((B,) + raws.shape[2:])
                return new_params, new_opt_state, loss_sum / w_tot, raw

        self._train_step = step
        return step

    def eval_step(self):
        if self._eval_step is not None:
            return self._eval_step
        model = self.model

        @jax.jit
        def step(params, batch):
            extra = {k: batch[k] for k in ("cluster_id", "edge_index", "edge_valid")
                     if k in batch}
            feats, feat_kws = _feats_inputs(model, batch)
            out = model.apply({"params": params}, feats,
                              mask=batch["mask"], train=False, **extra, **feat_kws)
            return out[0] if isinstance(out, tuple) else out

        self._eval_step = step
        return step

    def text_precompute(self):
        """Jitted (text_features, query) for a fixed parameter set, or None
        if the model has no text branch.  During evaluation the params are
        constant, so the prompt-learner -> text-tower forward (and the VLFAN
        query adapter) are loop-invariant: computing them once per eval pass
        instead of once per batch is bit-identical and saves the full tower
        forward per batch (docs/PERF.md)."""
        if not (self.uses_vl and hasattr(self.model, "text_precompute")):
            return None
        if getattr(self, "_text_precompute", None) is None:
            model = self.model

            @jax.jit
            def pre(params):
                return model.apply({"params": params},
                                   method=model.text_precompute)
            self._text_precompute = pre
        return self._text_precompute

    def eval_step_precomputed(self):
        """Eval step consuming `text_precompute` outputs."""
        if getattr(self, "_eval_step_pre", None) is None:
            model = self.model

            @jax.jit
            def step(params, batch, text_features, query):
                extra = {k: batch[k]
                         for k in ("cluster_id", "edge_index", "edge_valid")
                         if k in batch}
                feats, feat_kws = _feats_inputs(model, batch)
                out = model.apply({"params": params}, feats,
                                  mask=batch["mask"], train=False,
                                  text_features=text_features, query=query,
                                  **extra, **feat_kws)
                return out[0] if isinstance(out, tuple) else out
            self._eval_step_pre = step
        return self._eval_step_pre
