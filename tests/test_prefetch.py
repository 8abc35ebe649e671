"""Tests for the device prefetch pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from soft_intro_vae_tpu.data.prefetch import device_prefetch


def test_yields_all_batches_in_order():
    batches = [np.full((2, 2), i, np.float32) for i in range(10)]
    out = list(device_prefetch(iter(batches), size=3, put_fn=jnp.asarray))
    assert len(out) == 10
    for i, b in enumerate(out):
        assert float(b[0, 0]) == i


def test_propagates_producer_errors():
    def gen():
        yield np.zeros((1,), np.float32)
        raise RuntimeError("boom")

    it = device_prefetch(gen(), size=2, put_fn=jnp.asarray)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_empty_iterable():
    assert list(device_prefetch(iter([]), put_fn=jnp.asarray)) == []
