"""Prediction-head ops (class-axis argmax).

Separated from the spatial ops because the lowering is perf-critical and
centralized (every eval/predict/bench path routes through here).
"""
from __future__ import annotations

import jax.numpy as jnp

def argmax_lastdim(x):
    """Class-axis argmax — the zoo's single prediction hook.

    Centralized because the lowering is perf-sensitive: XLA can fuse the
    argmax's PRODUCER into the variadic reduce and recompute it per class
    (measured 127 ms on (8,1024,2048,19) after an ESPNet decoder — half the
    inference step — vs 2.6 ms for the bare op; tools/bench_argmax.py and
    tools/profile_infer.py). An ``optimization_barrier`` fence fixes ESPNet
    (+10%) but forfeits the upsample+argmax fusion that makes Fast-SCNN
    fastest (-5%), so the default stays plain ``jnp.argmax``; revisit with a
    producer-cost-aware fence if the ESP family becomes the headline.
    """
    return jnp.argmax(x, axis=-1).astype(jnp.int32)
