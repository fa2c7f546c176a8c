"""direct12pbrrenderer_tpu — a TPU-native deferred PBR render engine.

A from-scratch rebuild of the capabilities of zrlhahaha/Direct12PBRRenderer
(D3D12/C++/HLSL, see /root/reference) as an idiomatic JAX/XLA/Pallas framework:

* The D3D12 command-list/pass machinery becomes a single jit-compiled frame
  function composed by a declarative render graph (`graph.frame_graph`).
* The HLSL raster + compute shaders become batched MXU/VPU kernels
  (`ops.raster`, `ops.shading`, `ops.bloom`, ...), with Pallas kernels for the
  bandwidth-bound hot loops.
* The reflection-based JSON/binary asset repository is preserved byte- and
  schema-compatible (`resource.serialization`) so scenes authored for the
  reference renderer load unchanged.
* The C++ runtime pieces of the reference (BC texture codecs, TLSF allocator,
  loose octree) are rebuilt as a native C++ library (`native/`) with ctypes
  bindings and pure-numpy fallbacks.

Reference layer map: /root/repo/SURVEY.md §1-2.
"""

__version__ = "0.1.0"
