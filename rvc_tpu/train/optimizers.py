"""Optimizer factory in optax terms.

Parity target: reference rvc/train/train.py:667-709 — AdamW / RAdam / Ranger21
with betas (0.8, 0.99), eps 1e-9, weight_decay 0. Ranger21 (reference
rvc/train/custom_optimizers/ranger21/ranger21.py:107) is rebuilt as an optax
chain: adaptive gradient clipping (AGC, clip 0.01, eps 1e-3) -> gradient
centralization (conv-only, matching `gc_conv_only=True`) -> AdamW core ->
lookahead (k=5, alpha=0.5). MADGRAD/Chebyshev/warmdown options the reference
leaves disabled are not replicated.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable]

BETAS = (0.8, 0.99)
EPS = 1e-9


def _centralize_gradients(conv_only: bool = True) -> optax.GradientTransformation:
    """Gradient centralization (Yong et al. 2020): subtract the per-filter
    mean from multi-dim gradients. conv_only restricts to rank>=3 params
    (conv kernels), matching Ranger21's `gc_conv_only=True`."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def gc(g):
            min_rank = 3 if conv_only else 2
            if g.ndim >= min_rank:
                axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def adamw(lr: ScalarOrSchedule) -> optax.GradientTransformation:
    return optax.adamw(lr, b1=BETAS[0], b2=BETAS[1], eps=EPS, weight_decay=0.0)


def radam(lr: ScalarOrSchedule) -> optax.GradientTransformation:
    return optax.radam(lr, b1=BETAS[0], b2=BETAS[1], eps=EPS)


def ranger21(lr: ScalarOrSchedule) -> optax.GradientTransformation:
    """AGC + gradient centralization + AdamW core + lookahead.

    Reference config (train.py:681-701): agc_clipping_value=0.01, agc_eps=1e-3,
    using_gc=True (conv only), lookahead_active=True, warmup/warmdown handled
    by the external schedule instead.
    """
    inner = optax.chain(
        optax.adaptive_grad_clip(0.01, eps=1e-3),
        _centralize_gradients(conv_only=True),
        optax.adamw(lr, b1=BETAS[0], b2=BETAS[1], eps=EPS, weight_decay=0.0),
    )
    return lookahead(inner, sync_period=5, slow_step_size=0.5)


class LookaheadState(NamedTuple):
    inner_state: Any
    slow_params: Any
    count: jax.Array


def lookahead(
    inner: optax.GradientTransformation,
    sync_period: int = 5,
    slow_step_size: float = 0.5,
) -> optax.GradientTransformation:
    """Lookahead wrapper that keeps the slow weights inside the optimizer
    state (unlike optax.lookahead, which requires a params wrapper — this
    keeps the training-state pytree a plain params tree)."""

    def init_fn(params):
        return LookaheadState(
            inner_state=inner.init(params),
            slow_params=jax.tree.map(jnp.asarray, params),
            count=jnp.zeros([], jnp.int32),
        )

    def update_fn(updates, state, params):
        inner_updates, inner_state = inner.update(updates, state.inner_state, params)
        fast = optax.apply_updates(params, inner_updates)
        count = state.count + 1
        sync = count % sync_period == 0

        def do_sync(args):
            slow, fast = args
            new_slow = jax.tree.map(
                lambda s, f: s + slow_step_size * (f - s), slow, fast
            )
            return new_slow, new_slow

        def no_sync(args):
            slow, fast = args
            return slow, fast

        slow_params, new_fast = jax.lax.cond(
            sync, do_sync, no_sync, (state.slow_params, fast)
        )
        # Re-express as updates relative to the incoming params.
        final_updates = jax.tree.map(lambda nf, p: nf - p, new_fast, params)
        return final_updates, LookaheadState(inner_state, slow_params, count)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    name: str, lr: ScalarOrSchedule
) -> optax.GradientTransformation:
    """Factory keyed by the reference CLI's optimizer choice string."""
    name = name.lower()
    if name == "adamw":
        return adamw(lr)
    if name == "radam":
        return radam(lr)
    if name == "ranger21":
        return ranger21(lr)
    raise ValueError(f"unknown optimizer {name!r} (expected AdamW/RAdam/Ranger21)")
