"""Jitted train/eval steps with mesh sharding.

TPU-first replacement of the reference's per-bag Python training loop
(ref runner/base_handler.py:433-520): one compiled step consumes a whole
padded mini-batch of bags (the reference's bp_every_batch accumulation
becomes a single batched forward — identical loss, one optimizer step),
computes every configured loss in-graph, and applies the optax update.

When a `jax.sharding.Mesh` is given, bags shard over the `data` axis and
params/opt-state replicate; XLA inserts the gradient all-reduce over ICI.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
                 frozen: Optional[dict] = None):
        self.model = model
        self.tx = tx
        self.objective = objective
        self.uses_vl = uses_vl
        self.has_query_div = has_query_div
        self.mesh = mesh
        # pytree of bools marking frozen subtrees: their leaves are
        # stop-gradient'd inside the loss so AD never runs the (potentially
        # huge) backward through them — mirroring torch requires_grad=False
        # (ref utils/func.py:155-176), which the optimizer-level zero-update
        # masking alone does not
        self.frozen = frozen
        # accum_steps > 1: lax.scan over microbatches inside the jitted step
        # (memory headroom for very long bags; same averaged gradient)
        self.accum_steps = accum_steps
        self._train_step = None
        self._eval_step = None

    # --- sharding helpers ---
    def shard_batch(self, batch: dict) -> dict:
        if self.mesh is None:
            return batch
        sharding = NamedSharding(self.mesh, P("data"))
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    def replicate(self, tree):
        if self.mesh is None:
            return tree
        sharding = NamedSharding(self.mesh, P())
        return jax.device_put(tree, sharding)

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
            out = model.apply({"params": p}, batch["feats"],
                              mask=batch["mask"], train=True,
                              rngs={"dropout": rng}, **extra)
            raw = out[0] if isinstance(out, tuple) else out
            ls = jnp.exp(p["logit_scale"]) if uses_vl else None
            qd = (lambda: model.apply({"params": p}, method=model.query_div_loss)) \
                if has_qd else None
            sm = batch["valid"].astype(raw.dtype)
            loss = objective(raw, batch["t"], batch["e"], sm,
                             logit_scale=ls, query_div_fn=qd)
            return loss, raw

        if accum <= 1:
            @jax.jit
            def step(params, opt_state, batch, rng):
                (loss, raw), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch, rng)
                updates, new_opt_state = tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                return new_params, new_opt_state, loss, raw
        else:
            @jax.jit
            def step(params, opt_state, batch, rng):
                B = batch["feats"].shape[0]
                assert B % accum == 0, "batch not divisible by accum_steps"
                mb = B // accum
                stacked = jax.tree.map(
                    lambda v: v.reshape((accum, mb) + v.shape[1:]), batch)
                rngs = jax.random.split(rng, accum)

                def scan_body(carry, xs):
                    micro, r = xs
                    (loss, raw), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params, micro, r)
                    acc_grads, acc_loss = carry
                    acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                    return (acc_grads, acc_loss + loss), raw

                zero = jax.tree.map(jnp.zeros_like, params)
                (grads, loss_sum), raws = jax.lax.scan(
                    scan_body, (zero, 0.0), (stacked, rngs))
                grads = jax.tree.map(lambda g: g / accum, grads)
                updates, new_opt_state = tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                raw = raws.reshape((B,) + raws.shape[2:])
                return new_params, new_opt_state, loss_sum / accum, raw

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
            out = model.apply({"params": params}, batch["feats"],
                              mask=batch["mask"], train=False, **extra)
            return out[0] if isinstance(out, tuple) else out

        self._eval_step = step
        return step


def make_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    """Data(+model) mesh over available devices."""
    devices = np.array(jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))
