"""Multi-chip MSM: data-parallel point partitioning.

MSM is a sum — partition (points, scalars) across D devices, run the
single-chip Pippenger pipeline (ops/msm.py) per partition with every
dispatch targeted at that device (async: all chips work
concurrently), then add the D partial results (D-1 tiny group adds).
This is the BASELINE.json scheme "base points and scalar chunks
partitioned per chip"; the per-window bucket phase needs no
cross-chip traffic at all, so scaling is embarrassingly parallel with
one final D-point combine.

Works identically on the virtual CPU mesh (tests) and a real slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..curve import g1
from ..curve.g1 import APoint, JPoint
from ..ops.msm import msm


def msm_multichip(points: APoint, scalars: jnp.ndarray,
                  devices: Optional[Sequence] = None,
                  c: int | None = None) -> JPoint:
    """MSM with points/scalars split across `devices`
    (default: all local devices)."""
    devs = list(devices) if devices is not None else jax.devices()
    n = points.x.shape[1]
    d = max(1, min(len(devs), n))
    chunk = -(-n // d)

    partials = []
    for i in range(d):
        lo, hi = i * chunk, min((i + 1) * chunk, n)
        if lo >= hi:
            break
        dev = devs[i]
        p_i = APoint(
            jax.device_put(points.x[:, lo:hi], dev),
            jax.device_put(points.y[:, lo:hi], dev),
            jax.device_put(points.inf[lo:hi], dev),
        )
        s_i = jax.device_put(scalars[:, lo:hi], dev)
        partials.append(msm(p_i, s_i, c=c))

    acc = partials[0]
    dev0 = devs[0]
    for p in partials[1:]:
        moved = JPoint(
            jax.device_put(p.x, dev0),
            jax.device_put(p.y, dev0),
            jax.device_put(p.z, dev0),
        )
        acc = g1.add(acc, moved)
    return acc
