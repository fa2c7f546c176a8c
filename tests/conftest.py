"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the driver separately dry-runs the multi-chip path)."""

import os

# The environment may pre-import jax with a TPU platform (sitecustomize);
# env vars alone are too late, so pin the platform through jax.config too.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

# ---------------------------------------------------------------------------
# fast/slow split: `pytest -m "not slow"` is the <2-minute core suite (every
# package module keeps at least one fast test); the full suite (~12 min on an
# 8-device CPU host) adds the 1080p-class goldens, sharded reference-scene
# equivalence, and other full-pipeline compiles. Centralized here (not as
# per-test decorators) so the tier list is auditable in one place.
# ---------------------------------------------------------------------------

SLOW_MODULES = {
    "test_golden.py",             # full-pipeline CPU golden renders
    "test_golden_reference.py",   # reference-scene hero goldens
    "test_sharded_reference.py",  # 8-device reference-scene equivalence
}

# The slow tier is further split into three independently runnable subsets,
# each < 10 min on a 1-core host (so any CI window can run one):
#   pytest -m slow_golden   — full-pipeline golden renders (incl. hero)
#   pytest -m slow_sharded  — 8-device sharding equivalence suites
#   pytest -m slow_kernels  — everything else (kernel exactness, census,
#                             budgets, scale, e2e import)
SLOW_GOLDEN_MODULES = {"test_golden.py", "test_golden_reference.py"}
SLOW_SHARDED_MODULES = {"test_sharded_reference.py", "test_sharded.py"}

SLOW_TESTS = {
    "test_pipeline.py::test_env_budget_census_and_starvation",
    "test_texcache.py::test_stage_budget_truncation_and_exactness",
    "test_texcache.py::test_tap_census_recommend_covers",
    "test_import_e2e.py::test_imported_model_renders",
    "test_lights_pallas.py::test_pipeline_light_tile_path",
    "test_raster_pallas.py::test_two_pass_hot_tiles_match_xla",
    "test_pipeline.py::test_arbitrary_resolution_pad_and_crop",
    "test_sharded.py::test_sharded_with_cache_kernels_matches_single_chip",
    "test_sharded.py::test_sharded_matches_single_chip",
    "test_pipeline.py::test_kernel_paths_match_xla_paths",
    "test_pipeline.py::test_fused_gbuffer_matches_planar_pipeline",
    "test_pipeline.py::test_tex_approx_stat_surfaced",
    "test_pipeline.py::test_renders_lit_sphere",
    "test_texcache.py::test_textured_covered_exact_overflow_approximated",
    "test_texcache.py::test_two_level_cover_on_coherent_content",
    "test_texcache.py::test_tiled_matches_raw_sampler[trilinear]",
    "test_texcache.py::test_wrap_seam_and_mip_clamp",
    "test_texcache.py::test_anisotropic_beats_trilinear_at_grazing",
    "test_scale.py::test_stress_scene_pools_autogrow_and_bin_1080p",
    "test_assets.py::test_scene_json_loads",
    "test_raster_pallas.py::test_fused_interp_two_pass_hot_tiles",
    "test_raster.py::test_hierarchical_binning_matches_flat",
    "test_envcache.py::test_env_tiled_matches_xla_samplers",
    "test_postprocess.py::test_bloom_shapes_and_sanity[hw1]",
    "test_postprocess.py::test_bloom_shapes_and_sanity[hw2]",
    # round-3 re-tier (measured --durations on a 1-core host): the heaviest
    # fast-tier tests move here; every module keeps at least one fast test
    "test_viewer.py::test_viewer_serves_page_and_steps_camera",
    "test_texcache.py::test_tiled_matches_raw_sampler[bilinear]",
    "test_raster.py::test_fullscreen_triangle_covers_everything",
    "test_pipeline.py::test_render_sequence_matches_per_frame",
    "test_raster_pallas.py::test_fused_interp_matches_gather_path[0]",
    "test_postprocess.py::test_bloom_fused_matches_literal",
    "test_raster_pallas.py::test_pallas_dynamic_count_correct",
    "test_envcache.py::test_env_stage_budget_generous_is_bit_identical",
    "test_texcache.py::test_fused_cover_dynamic_matches_static",
    "test_lights_pallas.py::test_tile_kernel_matches_fori[scattered]",
    "test_pipeline.py::test_exposure_adapts_over_frames",
    "test_raster.py::test_depth_test_less_front_wins",
    "test_assets.py::test_scene_json_roundtrip",
    "test_pipeline.py::test_device_cull_matches_host",
    "test_raster_pallas.py::test_pallas_matches_xla[0]",
    "test_envcache.py::test_env_stage_budget_truncation_degrades_to_fallback",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-pipeline / large-shape tests (excluded from "
        "the <2-minute core suite; run the full suite before release)"
    )
    config.addinivalue_line(
        "markers", "slow_golden: slow subset — golden-image renders")
    config.addinivalue_line(
        "markers", "slow_sharded: slow subset — multi-device equivalence")
    config.addinivalue_line(
        "markers", "slow_kernels: slow subset — kernel/census/scale/e2e")


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.fspath.basename
        key = f"{mod}::{item.name}"
        if mod in SLOW_MODULES or key in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
            if mod in SLOW_GOLDEN_MODULES:
                item.add_marker(pytest.mark.slow_golden)
            elif mod in SLOW_SHARDED_MODULES:
                item.add_marker(pytest.mark.slow_sharded)
            else:
                item.add_marker(pytest.mark.slow_kernels)


REFERENCE_ASSETS = pathlib.Path("/root/reference/DeferredRendering")


@pytest.fixture
def reference_assets() -> pathlib.Path:
    if not REFERENCE_ASSETS.exists():
        pytest.skip("reference asset tree not available")
    return REFERENCE_ASSETS


@pytest.fixture
def asset_loader(reference_assets):
    from direct12pbrrenderer_tpu.resource.loader import ResourceLoader

    loader = ResourceLoader(reference_assets)
    old = ResourceLoader._instance
    ResourceLoader.set_instance(loader)
    yield loader
    ResourceLoader._instance = old
