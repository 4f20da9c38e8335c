"""Pallas TPU kernels (hot-path fusions) with XLA-default fallbacks.

Every kernel here has a reference implementation in plain jax.numpy living
next to the model that uses it; the Pallas path is selected explicitly
(`use_pallas=True`) and only on TPU backends. On CPU/GPU the fallback runs
so tests work everywhere.
"""
from __future__ import annotations

import jax


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def local_attention_pallas(q, k, v, window_size, *, causal=False,
                           exact_windowsize=True, use_rotary=True,
                           use_xpos=False, xpos_scale_base=None):
    """Windowed attention kernel. Falls back to the jnp formulation off-TPU.

    The Pallas kernel fuses the look-around concat, rotary, QK^T, masking,
    softmax and PV into one VMEM-resident pass per (batch*head, window) tile.
    """
    from . import local_attention_kernel as _k

    if _on_tpu() or _k.INTERPRET:
        from .local_attention_kernel import local_attention_tpu

        return local_attention_tpu(
            q, k, v, window_size, causal=causal,
            exact_windowsize=exact_windowsize, use_rotary=use_rotary,
            use_xpos=use_xpos, xpos_scale_base=xpos_scale_base,
        )
    from ...models.local_attention import local_attention

    return local_attention(
        q, k, v, window_size, causal=causal,
        exact_windowsize=exact_windowsize, use_rotary=use_rotary,
        use_xpos=use_xpos, xpos_scale_base=xpos_scale_base,
    )
