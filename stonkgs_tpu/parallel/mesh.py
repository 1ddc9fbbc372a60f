"""Device mesh and sharding rules.

The reference's distributed story is HF accelerate + optional DeepSpeed
ZeRO-2 over NCCL (``/root/reference/src/stonkgs/models/stonkgs_pretraining.py:
146-193``, ``constants.py:67``).  TPU-native equivalent: a
``jax.sharding.Mesh`` with axes

  * ``data``  — batch (data parallelism; gradient psum inserted by XLA),
  * ``model`` — vocabulary dimension of the large KG entity-embedding table
    and the MLM/ELM decoders (tensor parallelism for the only weights that
    are actually large, per BASELINE config 5 "sharded KG entity-embedding
    table").

Everything else is replicated; optimizer state follows its parameter's
sharding, so the big-table optimizer state is sharded too (the ZeRO-ish
memory win where it matters).

``fsdp=True`` additionally shards every large otherwise-replicated
parameter along the **data** axis (largest divisible dim), fully sharding
parameters, gradients, and optimizer state — the ZeRO-3 equivalent the
reference's opt-in DeepSpeed config stops short of (it ships stage 2,
``/root/reference/src/stonkgs/models/deepspeed_config_zero2.json``). XLA
inserts the all-gathers before use and reduce-scatters on the gradients.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a {data, model} mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} > {len(devices)} devices"
    )
    devices = devices[: n_data * n_model]
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_pspec(path: str) -> P:
    """PartitionSpec for a parameter identified by its tree path.

    Sharded on ``model``:
      * ``kg_backbone``                      (table rows = KG vocab)
      * ``cls/predictions/entity_decoder``   (output dim = KG vocab)
      * ``cls/predictions/text_decoder``     (output dim = text vocab)
      * decoder bias vectors
    Replicated otherwise.
    """
    if path.endswith("kg_backbone"):
        return P(MODEL_AXIS, None)
    if ("entity_decoder" in path or "text_decoder" in path
            or "prot_decoder" in path):
        return P(None, MODEL_AXIS)
    if (path.endswith("entity_bias") or path.endswith("text_bias")
            or path.endswith("prot_bias")):
        return P(MODEL_AXIS)
    return P()


# leaves smaller than this stay replicated under fsdp (biases, LayerNorms);
# default for the fsdp_min_size parameters below
FSDP_MIN_SIZE = 65_536


def _fsdp_spec(shape, n_data: int, min_size: int) -> P:
    """Shard the largest ``n_data``-divisible dim on the data axis."""
    if int(np.prod(shape)) < min_size:
        return P()
    best = None
    for axis, size in enumerate(shape):
        if size % n_data == 0 and (best is None or size >= shape[best]):
            best = axis
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = DATA_AXIS
    return P(*spec)


def _tree_paths_and_specs(params, mesh: Optional[Mesh] = None,
                          fsdp: bool = False,
                          fsdp_min_size: Optional[int] = None):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    n_data = mesh.shape[DATA_AXIS] if mesh is not None else 1
    min_size = FSDP_MIN_SIZE if fsdp_min_size is None else fsdp_min_size
    specs = []
    for path, leaf in flat:
        path_str = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        spec = param_pspec(path_str)
        if (fsdp and spec == P() and n_data > 1
                and "embedding" not in path_str):
            # embedding tables stay replicated under fsdp: they are
            # gather-accessed, and GSPMD cannot partition a gather against
            # a row-sharded table — it would replicate-then-partition
            # ("involuntary full rematerialization") for the same memory
            # high-water mark with extra reshard traffic.  The one table
            # that matters (the KG backbone) is model-axis sharded with an
            # explicit shard_map lowering instead (``parallel.tp``).
            spec = _fsdp_spec(np.shape(leaf), n_data, min_size)
        specs.append(spec)
    return treedef, specs


def param_shardings(params, mesh: Mesh, fsdp: bool = False,
                    fsdp_min_size: Optional[int] = None):
    """NamedSharding tree matching ``params``' structure."""
    treedef, specs = _tree_paths_and_specs(params, mesh, fsdp, fsdp_min_size)
    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, s) for s in specs]
    )


def _pad_to_multiple(x, axis: int, m: int):
    size = x.shape[axis]
    pad = (-size) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(x), widths) if isinstance(x, np.ndarray) \
        else jax.numpy.pad(x, widths)


def pad_params_for_mesh(params, mesh: Mesh):
    """Zero-pad model-sharded dims to multiples of the model axis size.

    The KG table / decoder vocab dims are arbitrary sizes; sharding requires
    divisibility.  Padding is semantically inert: padded KG-table rows are
    never gathered (input ids < table size) and the losses slice decoder
    logits back to the true vocab (see ``stonkgs.pretraining_loss``)."""
    n_model = mesh.shape[MODEL_AXIS]
    if n_model == 1:
        return params
    treedef, specs = _tree_paths_and_specs(params)
    leaves = jax.tree_util.tree_leaves(params)
    out = []
    for leaf, spec in zip(leaves, specs):
        for axis, name in enumerate(spec):
            if name == MODEL_AXIS:
                leaf = _pad_to_multiple(leaf, axis, n_model)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_params(params, mesh: Mesh, fsdp: bool = False,
                 fsdp_min_size: Optional[int] = None):
    """Place a parameter tree on the mesh with its canonical shardings.

    Pads model-sharded dims as needed (see ``pad_params_for_mesh``);
    ``fsdp=True`` fully shards large replicated params over the data axis
    (ZeRO-3-style; optimizer moments inherit the shardings). Leaves
    smaller than ``fsdp_min_size`` (default ``FSDP_MIN_SIZE``) stay
    replicated."""
    params = pad_params_for_mesh(params, mesh)
    return jax.device_put(
        params, param_shardings(params, mesh, fsdp, fsdp_min_size))


def shard_batch(batch, mesh: Mesh):
    """Place a feature dict on the mesh, batch dim over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_unsharded(tree, mesh: Mesh):
    """Replicate any leaf that is not already placed across the mesh.

    jit refuses computations whose arguments span different device sets;
    optimizer scalars (step counts, PRNG keys) created on the default
    device must be replicated onto the mesh next to the sharded params."""
    repl = NamedSharding(mesh, P())
    dev_set = set(mesh.devices.flat)

    def place(x):
        sh = getattr(x, "sharding", None)
        if sh is not None and set(getattr(sh, "device_set", ())) == dev_set:
            return x
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)
