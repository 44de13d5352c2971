"""GAN losses (reference loss.py:102-157): vanilla / lsgan / wgan-gp +
relativistic (ragan) helpers and gradient penalty."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def gan_loss(logits, target_is_real: bool, gan_type: str = "gan",
             real_label_val: float = 1.0, fake_label_val: float = 0.0):
    """D/G objective on discriminator outputs (loss.py:102-133)."""
    gan_type = gan_type.lower()
    if gan_type in ("gan", "ragan"):
        label = real_label_val if target_is_real else fake_label_val
        labels = jnp.full_like(logits, label)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))
    if gan_type == "lsgan":
        label = real_label_val if target_is_real else fake_label_val
        return jnp.mean((logits - label) ** 2)
    if gan_type == "wgan-gp":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    raise NotImplementedError(f"GAN type [{gan_type}] is not found")


def gradient_penalty(d_apply, params, interp):
    """WGAN-GP penalty (loss.py:136-157): (||∇_x D(x)||2 - 1)^2 on
    interpolated samples.  ``d_apply(params, x) -> logits``."""

    def critic_sum(x):
        return jnp.sum(d_apply(params, x))

    grads = jax.grad(critic_sum)(interp)
    g = grads.reshape(grads.shape[0], -1)
    norm = jnp.sqrt(jnp.sum(g**2, axis=1) + 1e-12)
    return jnp.mean((norm - 1.0) ** 2)
