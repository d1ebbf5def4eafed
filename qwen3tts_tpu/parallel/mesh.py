"""Device-mesh construction for multi-chip serving.

The reference is single-process/single-device (SURVEY.md §2 parallelism
inventory); its closest analog to a distribution layer is the GGML backend
scheduler splitting graphs between Metal and CPU. On TPU the idiomatic
scale-out is a ``jax.sharding.Mesh`` with named axes:

- ``dp``  data parallel: independent utterances (batched serving)
- ``tp``  tensor parallel: attention heads / FFN intermediate / vocab shards
          riding ICI all-reduces inserted by GSPMD

At 0.6B a single chip is compute-rich; dp is the throughput axis and tp the
latency axis. Both compose: mesh ("dp", "tp").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, have {len(devices)}")
    grid = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
