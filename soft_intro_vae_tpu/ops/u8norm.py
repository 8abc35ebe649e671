"""Bit-exact, gather-free uint8 -> f32 [0,1] normalization.

The reference feeds images normalized on host as ``x.astype(f32)/255``
(soft_intro_vae/dataset.py:129-134). Reproducing that ON DEVICE bit-exactly
is non-trivial: TPU f32 division (and multiply-by-reciprocal) is 1 ULP off
host numpy for 126 of the 256 byte values (measured on-chip, BENCH_NOTES.md
"Feed gap"), and a 256-entry LUT gather — the obvious exact fix — costs
~0.9 ms/step on the CIFAR north-star program (~17% of the step): XLA:TPU
lowers small-table gathers through the scalar path.

This module computes the CORRECTLY-ROUNDED ``i/255`` for every byte with a
handful of elementwise integer ops (clz, shifts, one 32-bit multiply, one
bitcast) that vectorize on the VPU and fuse into the surrounding program —
no table, no gather, no division.

Derivation: for a byte ``i``, the binary expansion of ``i/255`` is the byte
``i`` repeated forever::

    i/255 = i * (2^-8 + 2^-16 + 2^-24 + ...) = 0.iiii... (base 256)

Normalize ``i`` to the top of its byte: ``e = msb(i)``, ``j = i << (7-e)``
(so ``j`` in [128,255] and ``i/255 = (j/255) * 2^(e-7)``). The uint32
``R = j * 0x01010101`` is the first 32 fraction bits (``j`` repeated 4x)
with the leading 1 at bit 31, so the 24-bit mantissa window is ``R >> 8``
and the round bit is ``(R >> 7) & 1``. The bits BELOW the round bit
continue with infinitely repeating nonzero ``j`` — the sticky bit is always
1 — so round-to-nearest-even degenerates to "round up iff round bit set",
with no tie case::

    m = (R >> 8) + ((R >> 7) & 1)        # in [2^23, 2^24]
    bits = ((e - 8 + 127) << 23) + (m - 0x800000)

The additive form absorbs the ``i=255`` mantissa carry (m = 2^24) into the
exponent, yielding exactly 1.0; ``i=0`` is selected to 0.0. Exactness for
all 256 values is pinned by tests/test_uint8_pipeline.py on CPU and was
verified on the real chip (BENCH_NOTES.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def u8_to_unit_f32(x: Array) -> Array:
    """Exact ``x/255`` for uint8 ``x``, matching host numpy
    ``x.astype(np.float32)/np.float32(255)`` bit-for-bit. Elementwise integer
    ops only — fuses into any surrounding jitted program."""
    i = x.astype(jnp.uint32)
    e = 31 - jax.lax.clz(jnp.maximum(i, 1))          # msb index, 0..7
    j = i << (7 - e)                                  # normalized byte [128,255]
    r = j * jnp.uint32(0x01010101)                    # j repeated 4x
    m = (r >> 8) + ((r >> 7) & 1)                     # rounded 24-bit mantissa
    bits = ((e + jnp.uint32(119)) << 23) + (m - jnp.uint32(0x800000))
    y = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where(i == 0, jnp.float32(0.0), y)
