"""Sharding-aware gating for the mega-fused Pallas kernels.

The fused talker/code-predictor kernels (ops/pallas_talker_step.py,
ops/pallas_code_predictor*.py) are single-device programs: ``pl.pallas_call``
streams whole weight matrices through VMEM and has no GSPMD partitioning
rule. If tp-partitioned ``QuantLinear`` params reached a kernel under a
multi-device mesh, GSPMD would at best insert an all-gather that silently
replicates the weights (destroying the tp memory/bandwidth win) and at worst
fail to lower on real hardware — and a CPU-mesh dryrun alone can never catch
it, because the kernels' backend auto-gate is already off on cpu. The kernel
resolution (runtime/decode_loop._resolve_fused_*) therefore inspects the
params' committed shardings whenever they are concrete (every public
non-jitted wrapper resolves there, before tracing):

- any leaf partitioned over a mesh axis of size > 1  ->  XLA fallback, one
  logged line per (kernel, axes) pair; an EXPLICIT ``fused_*=True`` raises
  instead of silently producing an unvalidated program.
- params replicated on a multi-device mesh  ->  the one-shot batched path
  keeps the kernels by running under ``jax.shard_map`` over the mesh's "dp"
  axis: each device holds the full weights and decodes its own lanes
  (decode_loop._generate_batched_shard_map). The continuous scheduler keeps
  the XLA fallback under any multi-device mesh (its lane state is dp-sharded
  in place and harvested incrementally; see ContinuousScheduler.__init__).

Reference bar: the shared refcounted backend singleton
(src/gguf_loader.cpp:10-77) — one backend choice observed consistently by
every component. Here the "backend choice" is kernel-vs-XLA, and it must
agree with the parameter placement.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding


def _leaf_sharding(x):
    """The committed sharding of a concrete array / ShapeDtypeStruct, or
    None when it cannot be known (tracers inside jit, numpy arrays)."""
    if isinstance(x, jax.core.Tracer):
        return None
    return getattr(x, "sharding", None)


def partitioned_axes(params) -> frozenset:
    """Names of mesh axes (size > 1) that any leaf of ``params`` is
    partitioned over. Unknown non-replicated shardings report as "?".
    Empty means: every inspectable leaf is replicated (or single-device,
    or uninspectable — tracers never veto, matching the pre-gate
    behavior inside jit)."""
    axes = set()
    for x in jax.tree.leaves(params):
        s = _leaf_sharding(x)
        if s is None:
            continue
        if isinstance(s, NamedSharding):
            for entry in s.spec:
                names = entry if isinstance(entry, (tuple, list)) else (entry,)
                for name in names:
                    if name is not None and s.mesh.shape[name] > 1:
                        axes.add(name)
        else:
            try:
                if getattr(s, "num_devices", 1) > 1 and not s.is_fully_replicated:
                    axes.add("?")
            except Exception:
                axes.add("?")
    return frozenset(axes)


def params_mesh(params):
    """The multi-device Mesh the params live on (from the first
    NamedSharding leaf), or None for local / single-device params."""
    for x in jax.tree.leaves(params):
        s = _leaf_sharding(x)
        if isinstance(s, NamedSharding) and s.mesh.size > 1:
            return s.mesh
    return None


def dp_kernel_mesh(talker_params, cp_params, batch: int):
    """The mesh to shard_map the kernel-enabled batched loop over, or None.

    Engages only when the weights are replicated on a multi-device mesh
    with a "dp" axis of size > 1 that divides the batch — then each device
    can run the single-device Pallas kernels on its own lane slice. Any
    partitioned leaf disqualifies (the resolvers already fell back to XLA
    in that case)."""
    mesh = params_mesh(talker_params) or params_mesh(cp_params)
    if mesh is None:
        return None
    if partitioned_axes((talker_params, cp_params)):
        return None
    if "dp" not in mesh.axis_names:
        return None
    dp = mesh.shape["dp"]
    if dp <= 1 or batch % dp != 0:
        return None
    return mesh
