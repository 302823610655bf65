"""Mesh + sharding helpers (SURVEY §2.3, §5 'distributed backend').

The reference is single-process single-GPU; its only 'parallelism' is the
host-side view_batch_size micro-batch loop. The TPU-native equivalent:
a `jax.sharding.Mesh` over ('data', 'views') where

  - the prompt batch shards over 'data'
  - the patch-view axis (the spatial analog of sequence parallelism) shards
    over 'views': the batched per-view UNet call is annotated so XLA SPMD
    splits it across chips and the owner-map writeback runs on the gathered
    result (collectives ride ICI, inserted by XLA)
  - weights are replicated (SD-scale fits per chip in bf16)

No NCCL/MPI analog is needed: XLA emits all collectives (SURVEY §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Tuple[int, ...] = (1, 1),
              axis_names: Tuple[str, ...] = ("data", "views"),
              devices: Optional[Sequence[jax.Device]] = None) -> Optional[Mesh]:
    """Build a mesh over the available devices; None for single-device."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    if n <= 1:
        return None
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, axis_names)


def auto_mesh_shape(num_devices: int) -> Tuple[int, int]:
    """Default policy: give every chip to the views axis (the dominant
    fan-out), keep data=1 unless the caller overrides."""
    return (1, num_devices)


def replicated(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def shard_views(x, mesh: Optional[Mesh]):
    """Constrain the leading (views) axis to shard over the 'views' mesh axis.

    Constraint-only: when the axis does not divide the mesh width this
    degrades to replication. UNet-INPUT sites must instead use
    pad_and_shard_views so the fan-out actually shards at flagship batch
    sizes (e.g. SDXL 1024x2048 rs=7 merged batch 20 on an 8-wide mesh)."""
    if mesh is None or "views" not in mesh.axis_names:
        return x
    spec = P("views") if x.shape[0] % mesh.shape["views"] == 0 else P()
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def view_pad_rows(n: int, mesh: Optional[Mesh]) -> int:
    """Rows to append so a leading axis of size n divides the views mesh
    width (0 when no mesh / no views axis)."""
    if mesh is None or "views" not in mesh.axis_names:
        return 0
    return (-n) % mesh.shape["views"]


def pad_rows_to_mesh(x, mesh: Optional[Mesh]):
    """Pad the leading axis to a multiple of the views mesh width by
    duplicating the leading rows. Callers slice outputs back to the true
    batch; padded rows are pure throwaway compute that buys even sharding."""
    pad = view_pad_rows(x.shape[0], mesh)
    if pad:
        x = jnp.concatenate([x, x[:pad]])
    return x


def pad_and_shard_views(x, mesh: Optional[Mesh]):
    """Pad the leading axis to the views mesh width, then shard it. The
    batched-UNet entry point for the view/substep fan-out: guarantees the
    P('views') spec engages at ANY batch size (the silent-replication
    hazard of shard_views on non-divisible batches)."""
    return shard_views(pad_rows_to_mesh(x, mesh), mesh)


def replicate_mesh(x, mesh: Optional[Mesh]):
    """Explicitly replicate x across the whole mesh (one small all-gather
    where x arrives sharded; a no-op annotation where it is replicated
    already).

    Used on the LATENT ahead of the resample/view index gathers: without
    it a 'data'-sharded latent flows into gathers whose outputs GSPMD
    wants 'views'-sharded (the merged UNet batch), and the partitioner
    falls back to 'Involuntary full rematerialization' —
    replicate-then-repartition at top cost, with a loud spmd_partitioner
    warning (VERDICT r4 weak #3, MULTICHIP_r04 tail). Pinning the gather
    operand replicated makes the same data movement ONE explicit
    all-gather of the (B,4,H,W) latent (a few MB over ICI) and the final
    P('views') placement a local slice."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))


def shard_batch(x, mesh: Optional[Mesh]):
    """Constrain the leading (batch) axis over 'data'."""
    if mesh is None or "data" not in mesh.axis_names:
        return x
    spec = P("data") if x.shape[0] % mesh.shape["data"] == 0 else P()
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def collective_inventory(compiled_text: str) -> dict:
    """Count collective ops in optimized HLO text (async -start counted
    once, -done halves skipped): the explicit, reviewable record of what
    a mesh program actually communicates (VERDICT r4 next #8 — the v5e-8
    projection assumed zero collective overhead; this makes the
    assumption checkable)."""
    import re
    inv = {}
    for name in ("all-gather", "all-reduce", "collective-permute",
                 "reduce-scatter", "all-to-all"):
        n = len(re.findall(rf"\b{name}(?:-start)?\(", compiled_text))
        if n:
            inv[name] = n
    return inv


def put_replicated(tree, mesh: Optional[Mesh]):
    """Place a pytree fully replicated on the mesh (weights)."""
    if mesh is None:
        return tree
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
