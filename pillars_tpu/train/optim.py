"""Optimizer: AdamW with exponential LR decay, matching the reference.

reference train.py:223-246: tf.keras ExponentialDecay(initial=2e-3,
decay_steps=7000/batch_size, rate=0.8, staircase=False) feeding
tfa.optimizers.AdamW(weight_decay=1e-4, eps=1e-8).

tfa's AdamW applies DECOUPLED weight decay NOT scaled by the learning rate
(var -= lr * adam_dir + wd * var), which differs from optax.adamw (decay
scaled by lr) — so the chain below reproduces tfa exactly.

Transfer-learning layer freezing (reference set_trainable, train.py:62-113,
by positional layer index) becomes an optax mask keyed by parameter path
substrings — robust to architecture edits.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from pillars_tpu.config import OptimizerConfig


def exponential_decay_schedule(cfg: OptimizerConfig, batch_size: int
                               ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr(step) = initial * factor**(step / (decay_steps / batch_size)).

    The reference divides decay_steps by batch_size (train.py:230)."""
    decay_steps = cfg.decay_steps / batch_size

    def schedule(step):
        p = step / decay_steps
        if cfg.staircase:
            p = jnp.floor(p)
        return cfg.initial_learning_rate * jnp.power(cfg.decay_factor, p)

    return schedule


def freeze_mask(params, patterns: Sequence[str]):
    """True (=trainable) unless any pattern is a substring of the param path."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        return not any(p in path_str for p in patterns)

    paths = {jax.tree_util.keystr(p): trainable(p) for p, _ in flat}

    def mask_like(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: paths[jax.tree_util.keystr(p)], params)

    return mask_like(params)


def make_optimizer(cfg: OptimizerConfig, batch_size: int,
                   params=None) -> optax.GradientTransformation:
    schedule = exponential_decay_schedule(cfg, batch_size)
    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=cfg.adam_eps),
        optax.scale_by_schedule(schedule),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale(-1.0),
    )
    if cfg.freeze_patterns and params is not None:
        mask = freeze_mask(params, cfg.freeze_patterns)
        # optax.masked alone would pass raw gradients through for frozen
        # leaves; route them to set_to_zero instead so frozen params stay put
        labels = jax.tree_util.tree_map(
            lambda trainable: "train" if trainable else "freeze", mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx
