"""Tensor-parallel parameter sharding by path rules.

The reference has no TP (SURVEY.md section 2.10 — single GPU); these models
are small, so TP is an *optional* axis for wide configs: shard the hidden
dimension of Dense/Conv kernels over a mesh axis and let XLA insert the
all-reduces. Rules map regex patterns over flattened parameter paths to
PartitionSpecs; unmatched params replicate.

Default rules (transformer family): the feed-forward expansion's output
axis and the attention QKV projection's output axis are sharded
(Megatron-style column parallel), their contractions reduce over the axis
(row parallel comes out of XLA's propagation from the constraint).
"""
from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_tp_rules(axis: str = "seq") -> list[tuple[str, P]]:
    """Column-parallel rules for the transformer denoisers."""
    return [
        # MDM encoder layers: attention projections + MLP
        (r".*MultiHeadDotProductAttention.*(query|key|value).*kernel", P(None, axis, None)),
        (r".*MultiHeadDotProductAttention.*out.*kernel", P(axis, None, None)),
        (r".*layer_\d+/Dense_0/kernel", P(None, axis)),   # ff up
        (r".*layer_\d+/Dense_1/kernel", P(axis, None)),   # ff down
        # local-attention transformer: qkv + GEGLU ff
        (r".*attn_\d+/Dense_0/kernel", P(None, axis)),
        (r".*attn_\d+/Dense_1/kernel", P(axis, None)),
        (r".*ff_\d+/Dense_0/kernel", P(None, axis)),
        (r".*ff_\d+/Dense_1/kernel", P(axis, None)),
    ]


def param_path_strings(params) -> list[str]:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return ["/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat]


def shard_params(params, mesh: Mesh, rules: list[tuple[str, P]] | None = None):
    """Place params on the mesh: rule-matched leaves sharded, rest
    replicated. Dimension mismatches (spec rank != leaf rank) replicate."""
    rules = rules if rules is not None else default_tp_rules()

    def place(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for pattern, spec in rules:
            if re.fullmatch(pattern, name):
                if len(spec) <= leaf.ndim:
                    padded = P(*(tuple(spec) + (None,) * (leaf.ndim - len(spec))))
                    dims_ok = all(
                        s is None or leaf.shape[i] % mesh.shape[s] == 0
                        for i, s in enumerate(padded)
                    )
                    if dims_ok:
                        return jax.device_put(leaf, NamedSharding(mesh, padded))
                break
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
