"""Hyper-connections: learned multi-stream residuals (arXiv 2409.19606).

The reference's live LocalTransformer wraps every attention/FF branch in
hyper-connections with ``num_residual_streams = 4`` by default
(diffuser/models/transformer_local_attention.py:288,311,330-344, via the
``hyper_connections`` pip package that is absent from its environment.yml).
This is an original JAX implementation of the same mechanism, matching the
package's dynamic variant:

- the single residual is expanded into S streams (``expand_streams``),
- each wrapped branch performs a *width connection*: a learned (S, S+1)
  mixing matrix (static init ``[e_{layer mod S} | I]`` + a tanh dynamic term
  computed from the RMS-normalized streams, scaled by a small learned
  scalar) produces the branch input (column 0) and the passed-through
  streams (columns 1..S),
- the branch output re-enters every stream through a *depth connection*
  with per-stream learned weights beta (static init 1 + dynamic term),
- ``reduce_streams`` sums the streams back to one residual.

At initialization the dynamic terms are exactly zero (zero-init weights),
so the whole stack computes ``S * plain_residual_network(x)`` — which is
bit-equal to the plain network after any scale-invariant LayerNorm, a
property the tests pin down.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def expand_streams(h: jnp.ndarray, num_streams: int) -> jnp.ndarray:
    """(B, N, D) -> (B, N, S, D): every stream starts as a copy."""
    return jnp.broadcast_to(
        h[..., None, :], h.shape[:-1] + (num_streams, h.shape[-1])
    )


def reduce_streams(h: jnp.ndarray) -> jnp.ndarray:
    """(B, N, S, D) -> (B, N, D): sum over streams (the package's Reduce)."""
    return h.sum(axis=-2)


def depth_connection(branch_out: jnp.ndarray, residuals: jnp.ndarray,
                     beta: jnp.ndarray) -> jnp.ndarray:
    """Fold the branch output back into every stream, weighted by beta.

    branch_out (B, N, D), residuals (B, N, S, D), beta (B, N, S).
    Pure math (no params) so it can be called from the parent module scope.
    """
    return residuals + branch_out[..., None, :] * beta[..., None]


class HyperConnection(nn.Module):
    """Width connection for one wrapped branch.

    ``__call__(residuals)`` returns ``(branch_input, residuals, beta)``;
    the caller runs the branch and folds its output back with
    :func:`depth_connection`.
    """

    num_streams: int
    layer_index: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, residuals: jnp.ndarray):
        S = self.num_streams
        D = residuals.shape[-1]

        def alpha_init(_key, _shape):
            e = np.zeros((S, 1), np.float32)
            e[self.layer_index % S, 0] = 1.0
            return jnp.asarray(np.concatenate([e, np.eye(S, dtype=np.float32)], 1))

        static_alpha = self.param("static_alpha", alpha_init, (S, S + 1))
        static_beta = self.param("static_beta", nn.initializers.ones, (S,))
        dyn_alpha_w = self.param("dynamic_alpha_fn", nn.initializers.zeros, (D, S + 1))
        dyn_alpha_scale = self.param(
            "dynamic_alpha_scale", nn.initializers.constant(1e-2), ()
        )
        dyn_beta_w = self.param("dynamic_beta_fn", nn.initializers.zeros, (D,))
        dyn_beta_scale = self.param(
            "dynamic_beta_scale", nn.initializers.constant(1e-2), ()
        )

        normed = nn.RMSNorm(dtype=self.dtype, name="norm")(residuals)
        alpha = (
            jnp.tanh(normed @ dyn_alpha_w.astype(normed.dtype)) * dyn_alpha_scale
            + static_alpha
        )                                                   # (B, N, S, S+1)
        beta = (
            jnp.tanh(normed @ dyn_beta_w.astype(normed.dtype)) * dyn_beta_scale
            + static_beta
        )                                                   # (B, N, S)
        mixed = jnp.einsum("...st,...sd->...td", alpha, residuals)
        return mixed[..., 0, :], mixed[..., 1:, :], beta
