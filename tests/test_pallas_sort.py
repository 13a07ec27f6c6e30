"""In-VMEM bitonic sort (ops/pallas_sort.py) — interpret-mode correctness.

The windowed render's in-kernel depth ordering rests on this primitive;
these run on the CPU CI via Pallas interpret mode (the on-chip integration
is covered by tests/test_pallas_tpu.py's kernel-sort parity test).
"""

import jax.numpy as jnp
import numpy as np

from sags_tpu.ops.pallas_sort import sort_blocks


def test_bitonic_sort_matches_np_sort():
    rng = np.random.default_rng(1)
    x = rng.integers(-2**31, 2**31, size=(2, 8, 128), dtype=np.int32)
    out = np.asarray(sort_blocks(jnp.array(x), interpret=True))
    ref = np.sort(x.reshape(2, -1), axis=1).reshape(x.shape)
    np.testing.assert_array_equal(out, ref)


def test_bitonic_sort_single_row_and_ties():
    rng = np.random.default_rng(2)
    # heavy ties exercise the compare-exchange stability-by-value property
    x = rng.integers(0, 8, size=(1, 1, 128), dtype=np.int32)
    out = np.asarray(sort_blocks(jnp.array(x), interpret=True))
    np.testing.assert_array_equal(out[0, 0], np.sort(x[0, 0]))
