"""Single training runtime for every model family.

The reference has three training harnesses (Lightning, BasicSR iteration
loop, hand-rolled epoch loops — SURVEY.md §1 L4); here there is ONE: a
functional train step jitted over a Mesh. Gradient all-reduce is implicit in
the batch sharding (the DDP replacement); MoE aux losses flow out of the
model as a second output instead of Lightning's ``find_unused_parameters``
machinery; EMA is a pytree map inside the step (BasicSR model_ema,
image_restoration_model.py:200-222).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P



class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx, ema_decay: float | None = None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if ema_decay else None,
        )


@dataclasses.dataclass
class TrainerConfig:
    learning_rate: Any = 2e-4              # float or step->lr schedule
    weight_decay: float = 0.0
    betas: tuple = (0.9, 0.999)
    grad_clip: float | None = None          # max global norm (BasicSR uses 0.01)
    ema_decay: float | None = None          # e.g. 0.999
    loss: Mapping[str, float] = dataclasses.field(default_factory=lambda: {"l1": 1.0})
    aux_loss_weight: float = 0.0            # MoE balance loss weight (MoCE: 0.01)
    optimizer: str = "adamw"
    recipe: str = "default"                 # named multi-output loss recipe
    recipe_kwargs: Mapping = dataclasses.field(default_factory=dict)
    apply_kwargs: Mapping = dataclasses.field(default_factory=dict)
    # extra static kwargs for model.apply at train time, e.g. DarkIR's
    # side_loss=True (DarkIR.py:74) or MoE models' train=True
    plateau: bool = False                   # enable host-driven LR scaling
    # (ReduceLROnPlateau, BasicSR train.py:285-293): appends an injected
    # step_size multiplier the host mutates via set_lr_scale
    accumulate_grad_batches: int = 1        # optax.MultiSteps micro-batching
    # (Lightning accumulate_grad_batches, MoCE-IR-main/src/train.py:128-135)
    freeze_prefixes: tuple = ()             # top-level param subtrees whose
    # updates are zeroed (MWFormer stage 2 freezes the trained style filter,
    # MWFormer/train.py usage of the stage-1 checkpoint)


def make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    opt = {
        "adamw": lambda: optax.adamw(cfg.learning_rate, b1=cfg.betas[0],
                                     b2=cfg.betas[1], weight_decay=cfg.weight_decay),
        # IGMoCE-IR's c_adamw (src/utils/c_adamw.py) is the transformers
        # AdamW: decoupled decay with eps 1e-6
        "adamw_hf": lambda: optax.adamw(cfg.learning_rate, b1=cfg.betas[0],
                                        b2=cfg.betas[1], eps=1e-6,
                                        weight_decay=cfg.weight_decay),
        "adam": lambda: optax.adam(cfg.learning_rate, b1=cfg.betas[0], b2=cfg.betas[1]),
        "sgd": lambda: optax.sgd(cfg.learning_rate, momentum=0.9),
    }[cfg.optimizer]()
    chain = []
    if cfg.grad_clip:
        # non-finite-tolerant clip (the reference's error_if_nonfinite=False,
        # image_restoration_model.py:319): zero out non-finite grads first.
        chain.append(optax.zero_nans())
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(opt)
    if cfg.plateau:
        # LR update = -lr * step_size * direction; step_size lives in the
        # opt_state (InjectHyperparamsState) so the host can change it
        # without retracing the compiled step.
        chain.append(optax.inject_hyperparams(optax.scale)(step_size=1.0))
    if cfg.freeze_prefixes:
        prefixes = tuple(cfg.freeze_prefixes)

        def freeze_mask(params):
            return {k: jax.tree.map(
                lambda _: any(k == p or k.startswith(p) for p in prefixes), v)
                for k, v in params.items()}

        # zero the frozen subtrees' updates LAST so weight decay can't leak
        chain.append(optax.masked(optax.set_to_zero(), freeze_mask))
    tx = optax.chain(*chain)
    if cfg.accumulate_grad_batches > 1:
        # N micro-steps average their grads into one optimizer step; updates
        # are zero in between (Lightning accumulate_grad_batches semantics)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad_batches)
    return tx


def set_lr_scale(opt_state, scale: float):
    """Replace the injected plateau ``step_size`` inside an optax chain
    state (requires TrainerConfig.plateau=True). Pure pytree surgery — the
    returned state feeds the already-jitted train step unchanged."""
    found = [0]
    inject_types = tuple(
        t for t in (getattr(optax, "InjectHyperparamsState", None),
                    getattr(optax, "InjectStatefulHyperparamsState", None),
                    getattr(getattr(optax, "injection", None),
                            "InjectStatefulHyperparamsState", None))
        if t is not None)

    def walk(s):
        if isinstance(s, inject_types):
            found[0] += 1
            hp = dict(s.hyperparams)
            hp["step_size"] = jnp.asarray(scale, jnp.float32)
            return s._replace(hyperparams=hp)
        if isinstance(s, tuple) and hasattr(s, "_fields"):
            return type(s)(*[walk(x) for x in s])
        if isinstance(s, tuple):
            return tuple(walk(x) for x in s)
        return s

    out = walk(opt_state)
    if not found[0]:
        raise ValueError("no InjectHyperparamsState in opt_state — "
                         "build the optimizer with TrainerConfig(plateau=True)")
    return out


def split_model_output(out):
    """Normalize a model's return value to ``(out, aux_dict)``.

    ``(pred, {...})`` -> as-is; a tuple/list of arrays (NeRD-Rain's pyramid,
    model.py:603) stays whole with aux={}; a bare array gets aux={}.
    """
    if (isinstance(out, (tuple, list)) and len(out) == 2
            and isinstance(out[1], dict)):
        return out[0], out[1]
    return out, {}


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: TrainerConfig,
    mesh: Mesh | None = None,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step.

    The model's apply may return ``pred``, ``(pred, aux)`` where ``aux`` is a
    dict carrying ``aux_loss`` (MoE balance) or side heads (DarkIR), or a
    tuple of arrays (NeRD-Rain's 7-output pyramid) — ``split_model_output``
    normalizes all three. The loss comes from the named ``cfg.recipe``
    (train/recipes.py). Batch: dict with 'lq' (degraded) and 'gt', NHWC,
    sharded over the mesh 'data' axis.
    """
    from image_restoration_tpu.train.recipes import make_recipe

    if cfg.recipe == "default" and not cfg.recipe_kwargs:
        recipe = make_recipe("default", loss_terms=cfg.loss,
                             aux_loss_weight=cfg.aux_loss_weight)
    else:
        recipe = make_recipe(cfg.recipe, **dict(cfg.recipe_kwargs))
    apply_kwargs = dict(cfg.apply_kwargs)

    def step_fn(state: TrainState, batch, rng):
        def compute_loss(params):
            out = model.apply({"params": params}, batch["lq"],
                              rngs={"moe": rng} if rng is not None else None,
                              **apply_kwargs)
            out, aux = split_model_output(out)
            total, logs = recipe(out, aux, batch)
            logs["total"] = total
            return total, logs

        (loss, logs), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = cfg.ema_decay
            if cfg.accumulate_grad_batches > 1:
                # EMA ticks once per OPTIMIZER step, not per micro-batch:
                # MultiSteps wraps back to mini_step==0 right after it
                # applies the accumulated update.
                applied = opt_state.mini_step == 0
                ema = jax.tree.map(
                    lambda e, p: jnp.where(applied, d * e + (1 - d) * p, e),
                    ema, params)
            else:
                ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, params)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, ema_params=ema)
        return new_state, logs

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # `data` is a pytree PREFIX: every batch leaf (lq/gt plus any recipe
        # extras like de_id) shards its leading axis over 'data'
        return jax.jit(
            step_fn,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh: Mesh | None = None, use_ema: bool = False):
    def eval_fn(state: TrainState, lq):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        # TPU default fp32 matmul/conv precision is single-pass bf16, which
        # drifts ~1e-1 through deep U-Nets (measured on v5e); checkpoint
        # PSNR parity requires the 6-pass algorithm for fp32 eval.
        with jax.default_matmul_precision("highest"):
            out = model.apply({"params": params}, lq)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.clip(out, 0.0, 1.0)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(eval_fn, in_shardings=(repl, data), out_shardings=data)
    return jax.jit(eval_fn)


def shard_batch(batch, mesh: Mesh):
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
