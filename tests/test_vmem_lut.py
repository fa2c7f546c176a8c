"""The VMEM lookup-table primitive (round-2 texture-cache foundation)."""

import numpy as np
import jax.numpy as jnp

from direct12pbrrenderer_tpu.ops.vmem_lut import batched_lut_lookup


def test_segmented_lut_lookup_exact():
    rng = np.random.default_rng(0)
    table = rng.standard_normal((32, 128)).astype(np.float32)  # 4096 entries
    idx = rng.integers(0, 32 * 128, (7, 48, 128)).astype(np.int32)
    out = np.asarray(
        batched_lut_lookup(jnp.asarray(table), jnp.asarray(idx), interpret=True)
    )
    np.testing.assert_array_equal(out, table.reshape(-1)[idx])


def test_segmented_lut_small_table():
    rng = np.random.default_rng(1)
    table = rng.standard_normal((1, 128)).astype(np.float32)
    idx = rng.integers(0, 128, (2, 8, 128)).astype(np.int32)
    out = np.asarray(
        batched_lut_lookup(jnp.asarray(table), jnp.asarray(idx), interpret=True)
    )
    np.testing.assert_array_equal(out, table.reshape(-1)[idx])
