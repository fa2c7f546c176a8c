"""Native C++ runtime components: BC codecs, TLSF allocator, loose octree.

Mirrors the reference's unit-test scope (UnitTest/Source/MemoryAllocatorTest,
ThreadPoolTest) plus codec cross-checks against the numpy implementations.
"""

import numpy as np
import pytest

from direct12pbrrenderer_tpu.native import load

pytestmark = pytest.mark.skipif(load() is None, reason="native library not built")


def test_bc1_native_matches_numpy_decode():
    from direct12pbrrenderer_tpu.resource import bc, native_codec

    rng = np.random.default_rng(0)
    # random valid BC1 data (any bit pattern decodes)
    blob = rng.integers(0, 256, 8 * 8 * 8, np.uint8).tobytes()
    w = h = 32
    a = native_codec.bc1_decode_mip(blob, w, h)
    # numpy path (bypass native dispatch by calling internals)
    bw = bh = 8
    import direct12pbrrenderer_tpu.resource.bc as bc_mod

    raw = np.frombuffer(blob, dtype=np.uint8).reshape(bh, bw, 8)
    # use the numpy implementation directly via a temp monkeypatch
    orig = native_codec.available
    native_codec.available = lambda: False
    try:
        b = bc_mod.bc1_decode_mip(blob, w, h)
    finally:
        native_codec.available = orig
    np.testing.assert_array_equal(a, b)


def test_bc6h_native_roundtrip_matches_numpy():
    from direct12pbrrenderer_tpu.resource import bc, native_codec

    y, x = np.mgrid[0:8, 0:8].astype(np.float32) / 8.0
    img = np.stack([1 + 4 * x, 0.5 + y, 2 * x * y + 0.1, np.ones_like(x)], -1).astype(
        np.float16
    )
    blob_native = native_codec.bc6h_encode_mip(img)
    orig = native_codec.available
    native_codec.available = lambda: False
    try:
        blob_numpy = bc.bc6h_encode_mip(img)
        dec_numpy = bc.bc6h_decode_mip(blob_native, 8, 8)
    finally:
        native_codec.available = orig
    assert blob_native == blob_numpy  # identical algorithm, identical bits
    dec_native = native_codec.bc6h_decode_mip(blob_native, 8, 8)
    np.testing.assert_array_equal(
        dec_native.view(np.uint16), dec_numpy.view(np.uint16)
    )


def test_tlsf_alloc_free_merge():
    from direct12pbrrenderer_tpu.utils.tlsf import TlsfAllocator

    t = TlsfAllocator(1 << 20, min_block=256)
    a = t.alloc(1000)
    b = t.alloc(2000)
    c = t.alloc(4000)
    assert {a, b, c} and len({a, b, c}) == 3
    assert t.used >= 1000 + 2000 + 4000
    # free middle then neighbors -> blocks merge, big alloc fits again
    assert t.free(b)
    assert t.free(a)
    assert t.free(c)
    assert t.used == 0
    d = t.alloc((1 << 20) - 256, align=256)
    assert d is not None


def test_tlsf_alignment():
    from direct12pbrrenderer_tpu.utils.tlsf import TlsfAllocator

    t = TlsfAllocator(1 << 20, min_block=256)
    t.alloc(300)  # misalign the arena head
    for align in (512, 4096, 65536):
        off = t.alloc(1234, align=align)
        assert off is not None and off % align == 0


def test_tlsf_oom():
    from direct12pbrrenderer_tpu.utils.tlsf import TlsfAllocator

    t = TlsfAllocator(4096, min_block=256)
    assert t.alloc(8192) is None
    a = t.alloc(4096)
    assert a == 0
    assert t.alloc(256) is None
    t.free(a)
    assert t.alloc(256) is not None


def test_octree_cull_matches_bruteforce():
    from direct12pbrrenderer_tpu.utils.octree import LooseOctree
    from direct12pbrrenderer_tpu.utils import mathlib as ml

    rng = np.random.default_rng(1)
    tree = LooseOctree([-500] * 3, [500] * 3)
    centers = rng.uniform(-100, 100, (200, 3)).astype(np.float32)
    sizes = rng.uniform(0.5, 5, (200, 1)).astype(np.float32)
    mins, maxs = centers - sizes, centers + sizes
    handles = [tree.add(mins[i], maxs[i]) for i in range(200)]
    assert tree.node_count > 1  # it actually subdivided

    vp = ml.projection_matrix1(1.0, 1.5, 0.1, 500.0)
    planes = ml.frustum_planes_from_matrix(vp)
    got = set(tree.frustum_cull(planes).tolist())
    expected = set(np.nonzero(ml.frustum_cull_aabbs(planes, mins, maxs))[0].tolist())
    assert got == {handles[i] for i in expected}


def test_octree_update_and_remove():
    from direct12pbrrenderer_tpu.utils.octree import LooseOctree
    from direct12pbrrenderer_tpu.utils import mathlib as ml

    tree = LooseOctree([-500] * 3, [500] * 3)
    h = tree.add([-1, -1, 10], [1, 1, 12])  # in front of origin camera (+z)
    vp = ml.projection_matrix1(1.0, 1.0, 0.1, 500.0)
    planes = ml.frustum_planes_from_matrix(vp)
    assert tree.frustum_cull(planes).tolist() == [h]
    tree.update(h, [-1, -1, -12], [1, 1, -10])  # move behind camera
    assert tree.frustum_cull(planes).size == 0
    tree.update(h, [-1, -1, 10], [1, 1, 12])
    tree.remove(h)
    assert tree.frustum_cull(planes).size == 0
