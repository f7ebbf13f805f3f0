"""Tensor-parallel (Megatron-style) parameter shardings for the towers.

The reference is data-parallel only (SURVEY.md §2.8: torch DDP/NCCL); this
is a beyond-reference TPU-native capability. Instead of rewriting the model
with explicit collectives, we annotate the *parameters* with a ``model``
mesh-axis sharding and let GSPMD propagate:

- attention qkv / BERT q,k,v and the MLP up-projections are column-parallel
  (output features sharded -> each device computes a head/neuron slice),
- the attention output projection and MLP down-projections are row-parallel
  (input features sharded -> XLA inserts one psum per block over ICI),
- everything else (embeddings, LayerNorms, projections, temperature) is
  replicated.

This is the scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert the collectives. Rules are scoped by parameter *path* regex so only
the encoder towers are touched (models/vit.py block layout, models/bert.py
layer layout); a dimension that does not divide by the model-axis size
falls back to replicated (correct, just not sharded).
"""

from __future__ import annotations

import re
from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simseg_tpu.parallel.mesh import MODEL_AXIS

# role -> (which tensor dim is sharded for kernels, bias sharded?)
_COL = "col"  # kernel (in, out): shard out; bias (out,): shard
_ROW = "row"  # kernel (in, out): shard in;  bias (out,): replicate

_TP_RULES: Tuple[Tuple[re.Pattern, str], ...] = tuple(
    (re.compile(pat), role)
    for pat, role in [
        # ViT blocks (models/vit.py): fused qkv + out proj + MLP
        (r"blocks_\d+/attn/qkv/", _COL),
        (r"blocks_\d+/attn/proj/", _ROW),
        (r"blocks_\d+/mlp/fc1/", _COL),
        (r"blocks_\d+/mlp/fc2/", _ROW),
        # BERT layers (models/bert.py): separate q/k/v + output + MLP
        (r"layer_\d+/(query|key|value)/", _COL),
        (r"layer_\d+/attention_output/", _ROW),
        (r"layer_\d+/intermediate/", _COL),
        (r"layer_\d+/output/", _ROW),
    ]
)


def _leaf_spec(path: str, shape, tp: int) -> P:
    for pat, role in _TP_RULES:
        if pat.search(path):
            break
    else:
        return P()
    if not shape:
        return P()
    if path.endswith("/bias"):
        if role == _COL and shape[-1] % tp == 0:
            return P(MODEL_AXIS)
        return P()
    # kernel (in, out)
    if len(shape) != 2:
        return P()
    if role == _COL:
        if shape[1] % tp == 0:
            return P(None, MODEL_AXIS)
    else:  # _ROW
        if shape[0] % tp == 0:
            return P(MODEL_AXIS, None)
    return P()


def tp_shardings(params, mesh: Mesh):
    """Per-leaf NamedSharding pytree for the model params under tensor
    parallelism. Identity (all replicated) when the mesh has no ``model``
    axis."""
    if MODEL_AXIS not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    tp = mesh.shape[MODEL_AXIS]

    def spec(path_entries, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_entries)
        return NamedSharding(mesh, _leaf_spec(path, getattr(leaf, "shape", ()), tp))

    return jax.tree_util.tree_map_with_path(spec, params)


def place_params_tp(params, mesh: Mesh):
    """Commit the parameter pytree to the mesh with TP shardings."""
    return jax.device_put(params, tp_shardings(params, mesh))


_EP_LEAF = re.compile(r"/moe/(w1|w2|b1|b2)$")


def ep_shardings(params, mesh: Mesh, base=None):
    """Expert-parallel shardings: MoE expert weights (ops/moe.py MoEMlp
    ``w1/b1/w2/b2``, leading dim = num_experts) are sharded over the 'data'
    mesh axis when the expert count divides it — each data-parallel device
    owns a slice of the experts, and GSPMD inserts the all-to-all around the
    expert FFN (the t5x/flaxformer EP recipe). Router and non-MoE leaves
    keep their ``base`` sharding."""
    from simseg_tpu.parallel.mesh import DATA_AXIS

    if DATA_AXIS not in mesh.axis_names:
        raise ValueError("ep_shardings needs a 'data' mesh axis")
    n = mesh.shape[DATA_AXIS]
    if base is None:
        base = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def spec(path_entries, leaf, sh):
        path = "/" + "/".join(str(getattr(k, "key", k)) for k in path_entries)
        shape = getattr(leaf, "shape", ())
        if _EP_LEAF.search(path) and shape and shape[0] % n == 0:
            return NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (len(shape) - 1))))
        return sh

    return jax.tree_util.tree_map_with_path(spec, params, base)


def fsdp_shardings(params, mesh: Mesh, base=None, min_size: int = 2**14):
    """Fully-sharded (ZeRO-3-style) parameter shardings over the data axis.

    Each tensor above ``min_size`` elements gets its largest
    still-unsharded, divisible dim sharded over 'data'; XLA then
    all-gathers weights just-in-time in the forward/backward and
    reduce-scatters the gradients — the GSPMD formulation of FSDP.
    Composes with tensor parallelism: pass the TP sharding tree as
    ``base`` and the data axis is added to each leaf's remaining free dim
    (e.g. a column-parallel qkv kernel becomes P('data', 'model'))."""
    from simseg_tpu.parallel.mesh import DATA_AXIS

    if DATA_AXIS not in mesh.axis_names:
        raise ValueError("fsdp_shardings needs a 'data' mesh axis")
    n = mesh.shape[DATA_AXIS]
    if base is None:
        base = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def size_of(shape):
        total = 1
        for s in shape:
            total *= s
        return total

    def upgrade(leaf, sh):
        shape = getattr(leaf, "shape", ())
        if not shape or size_of(shape) < min_size:
            return sh
        spec = list(sh.spec) + [None] * (len(shape) - len(sh.spec))
        for dim in sorted(range(len(shape)), key=lambda d: -shape[d]):
            if spec[dim] is None and shape[dim] % n == 0:
                spec[dim] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return sh

    return jax.tree.map(upgrade, params, base)
