"""The fused GAN training step: one jitted function per optimizer update.

Parity target: the per-batch body of reference rvc/train/train.py:1014-1200 —
G forward under bf16, slice the real wave, D update (x1 or x2), fmap pass, mel
(single or multi-scale) + FM + KL + adversarial losses (optionally through the
uncertainty LossBalancer), grad-norm probes, both optimizer steps.

TPU-first design:
  - ONE jitted function executes the whole step. The generator runs exactly
    once: `jax.vjp` retains its residuals (torch's "keep the graph" pattern),
    the discriminator updates on the stop-gradient output, then the loss
    cotangents are pulled back through the stored vjp. No recompute, no
    second G forward.
  - bf16 policy: parameters are stored fp32 and cast to bf16 at the forward
    boundary; losses and optimizer math stay fp32 (matching the reference's
    autocast placement, train.py:1040-1092).
  - Data parallelism comes from jit + sharding annotations on the batch
    (see rvc_tpu.parallel): batch-mean losses become psums automatically.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..configs import ExperimentConfig
from ..models.commons import slice_segments
from ..ops.stft import spec_to_mel, mel_spectrogram
from . import losses as L

# The reference balancer's initial log-sigmas (train.py:617-637), chosen so
# the uncertainty weights start at the fixed weights (adv 1, mel 45, fm 2, kl 1).
BALANCER_INIT = {
    "adv": -0.3466,
    "mel": -2.2499,
    "fm": -0.6931,
    "kl": -0.3466,
}


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params_g: Any
    params_d: Any
    balancer: Optional[Dict[str, jax.Array]]
    opt_g: optax.OptState
    opt_d: optax.OptState
    opt_b: Optional[optax.OptState] = None


def init_balancer() -> Dict[str, jax.Array]:
    return {k: jnp.asarray(v, jnp.float32) for k, v in BALANCER_INIT.items()}


def make_balancer_optimizer(lr_schedule=None, base_lr: float = 1e-4):
    """AdamW-style transform for the 4 balancer log-sigmas, riding the
    generator's warmup/decay schedule — the reference trains them in the
    shared optim_g AdamW param group (train.py:662-665), so a raw SGD step
    here would have materially different dynamics (no moment normalization).
    Always schedule-wrapped so the opt-state pytree is identical whether or
    not a schedule is supplied (checkpoint compatibility)."""
    from .optimizers import BETAS, EPS

    sched = lr_schedule if lr_schedule is not None else (lambda count: base_lr)
    return optax.chain(
        optax.scale_by_adam(b1=BETAS[0], b2=BETAS[1], eps=EPS),
        optax.scale_by_schedule(lambda count: -sched(count)),
    )


def balancer_total(
    balancer: Dict[str, jax.Array],
    terms: Dict[str, jax.Array],
    frozen: jax.Array,
) -> jax.Array:
    """Uncertainty-weighted total (train.py:639-659): for each term,
    loss / (2 exp(log_sigma)^2) + log_sigma; log-sigmas are frozen to their
    init for the first N epochs."""
    total = 0.0
    for name, loss in terms.items():
        ls = jnp.where(frozen, BALANCER_INIT[name], balancer[name])
        total += loss / (2.0 * jnp.exp(ls) ** 2) + ls
    return total


def _to_bf16(tree):
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if isinstance(p, jax.Array) and jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        tree,
    )


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)


def make_train_step(
    cfg: ExperimentConfig,
    model_g,
    model_d,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    steps_per_epoch: int = 1,
    balancer_freeze_epochs: int = 3,
    lr_schedule=None,
    debug_grads: bool = False,
):
    """Builds `train_step(state, batch, rng) -> (state, metrics)`.

    batch dict (all device arrays, static shapes):
      phone [B, T, 768] f32, phone_lengths [B] i32, pitch [B, T] i32,
      pitchf [B, T] f32, spec [B, Ts, spec_ch] f32, spec_lengths [B] i32,
      wave [B, Tw, 1] f32, sid [B] i32.
    """
    t = cfg.train
    d = cfg.data
    seg_frames = t.segment_size // d.hop_length
    use_bf16 = t.bf16_run
    d_updates = 2 if t.double_d_update else 1
    tx_b = make_balancer_optimizer(lr_schedule, t.learning_rate)

    def g_forward(params_g, batch, ids_slice, rngs):
        out = model_g.apply(
            {"params": params_g},
            batch["phone"],
            batch["phone_lengths"],
            batch["pitch"],
            batch["pitchf"],
            batch["spec"],
            batch["spec_lengths"],
            batch["sid"],
            ids_slice=ids_slice,
            rngs=rngs,
        )
        y_hat, _, x_mask, y_mask, vae = out
        return (y_hat.astype(jnp.float32),) + tuple(
            v.astype(jnp.float32) for v in vae
        ) + (y_mask.astype(jnp.float32),)

    def d_apply(params_d, y, y_hat):
        if use_bf16:
            params_d = _to_bf16(params_d)
            y = y.astype(jnp.bfloat16)
            y_hat = y_hat.astype(jnp.bfloat16)
        return model_d.apply({"params": params_d}, y, y_hat)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng_slice, rng_noise, rng_gp = jax.random.split(rng, 3)
        b = batch["spec"].shape[0]
        spec_lengths = batch["spec_lengths"]

        # Random latent slice starts, drawn outside the model (commons.py:88-103).
        ids_str_max = jnp.maximum(spec_lengths - seg_frames + 1, 1).astype(jnp.float32)
        u = jax.random.uniform(rng_slice, (b,))
        ids_slice = (u * ids_str_max).astype(jnp.int32)

        fwd_batch = batch
        if use_bf16:
            fwd_batch = dict(
                batch,
                phone=batch["phone"].astype(jnp.bfloat16),
                spec=batch["spec"].astype(jnp.bfloat16),
            )

        def fwd(pg):
            p = _to_bf16(pg) if use_bf16 else pg
            return g_forward(p, fwd_batch, ids_slice, {"noise": rng_noise})

        if t.use_checkpointing:
            # rematerialize generator activations in the backward pass
            # (replaces the reference's per-module checkpointing flags,
            # hifigan_nsf.py:188-194)
            fwd = jax.checkpoint(fwd)

        outputs, g_vjp = jax.vjp(fwd, state.params_g)
        y_hat, z, z_p, m_p, logs_p, m_q, logs_q, y_mask = outputs

        wave = slice_segments(
            batch["wave"], ids_slice * d.hop_length, t.segment_size
        )  # [B, seg, 1]

        # ---- Discriminator update(s) -------------------------------------
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        def d_loss_fn(params_d, rng_i):
            y_d_r, y_d_g, _, _ = d_apply(params_d, wave, y_hat_sg)
            if t.use_wgan:
                # critic loss + unit-gradient penalty (reference
                # train.py:1064-1071: loss_disc + gp_weight * gp, gp_weight=1)
                gp = L.gradient_penalty(
                    rng_i, d_apply, params_d, wave, y_hat_sg
                )
                return L.wgan_discriminator_loss(y_d_r, y_d_g) + gp
            return L.discriminator_loss(y_d_r, y_d_g)

        params_d, opt_d = state.params_d, state.opt_d
        loss_disc = 0.0
        grad_norm_d = 0.0
        for i in range(d_updates):
            # fresh interpolation points per critic update (the reference
            # redraws alpha each backward; reusing rng would bias the GP)
            sub_gp = jax.random.fold_in(rng_gp, i)
            loss_disc, grads_d = jax.value_and_grad(d_loss_fn)(params_d, sub_gp)
            grad_norm_d = global_norm(grads_d)
            updates_d, opt_d = tx_d.update(grads_d, opt_d, params_d)
            params_d = optax.apply_updates(params_d, updates_d)

        # ---- Generator losses --------------------------------------------
        epoch = state.step // max(1, steps_per_epoch)
        balancer_frozen = epoch < balancer_freeze_epochs

        def g_loss_fn(outs, balancer):
            y_hat, z, z_p, m_p, logs_p, m_q, logs_q, y_mask = outs
            _, y_d_g, fmap_r, fmap_g = d_apply(params_d, wave, y_hat)

            # standard mels: the loss term in single-scale mode, and the
            # mel-similarity % metric in BOTH modes (reference computes
            # y_mel/y_hat_mel unconditionally, train.py:1040-1053, and logs
            # mel_spec_similarity per batch, train.py:184-204)
            y_hat_mel = mel_spectrogram(
                y_hat[..., 0],
                d.filter_length,
                d.n_mel_channels,
                d.sample_rate,
                d.hop_length,
                d.win_length,
                d.mel_fmin,
                d.mel_fmax,
            )
            mel = spec_to_mel(
                batch["spec"].astype(jnp.float32),
                d.filter_length,
                d.n_mel_channels,
                d.sample_rate,
                d.mel_fmin,
                d.mel_fmax,
            )
            y_mel = slice_segments(mel, ids_slice, seg_frames)
            std_mel_l1 = L.mel_l1_loss(y_mel, y_hat_mel)
            if t.use_multiscale_mel:
                raw_mel = L.multiscale_mel_loss(
                    wave[..., 0], y_hat[..., 0], d.sample_rate
                )
                loss_mel = raw_mel if t.use_balancer else raw_mel * t.c_mel / 3.0
            else:
                raw_mel = std_mel_l1
                loss_mel = raw_mel if t.use_balancer else raw_mel * t.c_mel

            raw_fm = L.feature_loss(fmap_r, fmap_g)
            loss_fm = raw_fm if t.use_balancer else raw_fm * t.c_fm
            raw_kl = L.kl_loss(z_p, logs_q, m_p, logs_p, y_mask)
            loss_kl = raw_kl if t.use_balancer else raw_kl * t.c_kl
            loss_gen = (
                L.wgan_generator_loss(y_d_g) if t.use_wgan else L.generator_loss(y_d_g)
            )

            if t.use_balancer:
                total = balancer_total(
                    balancer,
                    {"adv": loss_gen, "mel": loss_mel, "fm": loss_fm, "kl": loss_kl},
                    balancer_frozen,
                )
            else:
                total = loss_gen + loss_fm + loss_mel + loss_kl
            return total, {
                "loss_gen": loss_gen,
                "loss_fm": loss_fm,
                "loss_mel": loss_mel,
                "loss_kl": loss_kl,
                "loss_gen_all": total,
                "mel_similarity_pct": jax.lax.stop_gradient(
                    jnp.clip(100.0 - std_mel_l1 * 100.0, 0.0, 100.0)),
            }

        if state.balancer is not None:
            (_, aux), (out_cts, balancer_grads) = jax.value_and_grad(
                g_loss_fn, argnums=(0, 1), has_aux=True
            )(outputs, state.balancer)
        else:
            (_, aux), out_cts = jax.value_and_grad(g_loss_fn, has_aux=True)(
                outputs, state.balancer
            )
            balancer_grads = None

        (grads_g,) = g_vjp(out_cts)
        grad_norm_g = global_norm(grads_g)
        updates_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        balancer = state.balancer
        opt_b = state.opt_b
        if balancer is not None:
            # The balancer's 4 scalars ride the same Adam moments + scheduled
            # LR as the reference's shared optim_g param group
            # (train.py:662-665: same optimizer, same warmup/decay schedule).
            updates_b, opt_b = tx_b.update(balancer_grads, opt_b, balancer)
            balancer = optax.apply_updates(balancer, updates_b)

        metrics = {
            "loss_disc": loss_disc,
            "grad_norm_d": grad_norm_d,
            "grad_norm_g": grad_norm_g,
            **aux,
        }
        if debug_grads:
            # Per-top-level-subtree gradient norms: lets callers (the
            # multi-chip dryrun, smoke scripts) assert that gradient flow
            # reaches EVERY module — a finite loss alone can't catch a
            # stop_gradient or wiring bug that silently zeroes a subtree.
            for k, sub in grads_g.items():
                metrics[f"gsub_g/{k}"] = global_norm(sub)
            for k, sub in grads_d.items():
                metrics[f"gsub_d/{k}"] = global_norm(sub)
        return (
            state.replace(
                step=state.step + 1,
                params_g=params_g,
                params_d=params_d,
                balancer=balancer,
                opt_g=opt_g,
                opt_d=opt_d,
                opt_b=opt_b,
            ),
            metrics,
        )

    return train_step


def create_train_state(
    rng: jax.Array,
    cfg: ExperimentConfig,
    model_g,
    model_d,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    example_batch: Dict[str, jax.Array],
) -> TrainState:
    """Initialize parameters and optimizer states from an example batch."""
    rng_g, rng_d, rng_noise = jax.random.split(rng, 3)
    vars_g = model_g.init(
        {"params": rng_g, "noise": rng_noise},
        example_batch["phone"],
        example_batch["phone_lengths"],
        example_batch["pitch"],
        example_batch["pitchf"],
        example_batch["spec"],
        example_batch["spec_lengths"],
        example_batch["sid"],
    )
    seg = cfg.train.segment_size
    wave_slice = example_batch["wave"][:, :seg, :]
    vars_d = model_d.init(rng_d, wave_slice, wave_slice)
    params_g, params_d = vars_g["params"], vars_d["params"]
    balancer = init_balancer() if cfg.train.use_balancer else None
    # opt-state structure is schedule-independent (make_balancer_optimizer
    # always wraps the LR in scale_by_schedule), so init with defaults here.
    opt_b = make_balancer_optimizer().init(balancer) if balancer is not None else None
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params_g=params_g,
        params_d=params_d,
        balancer=balancer,
        opt_g=tx_g.init(params_g),
        opt_d=tx_d.init(params_d),
        opt_b=opt_b,
    )
