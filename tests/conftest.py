"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-device sharding paths
(shard_map + halo exchange over a Mesh) are exercised without TPU hardware —
the standard JAX trick of --xla_force_host_platform_device_count.
This must happen before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU backend; override it so tests
# run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import reforge_tpu.utils as utils  # noqa: E402

# Don't spam stderr with expected warnings during negative-path tests;
# warnings are still recorded and assertable via utils.recent_warnings().
utils.print_warnings = False

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_warnings():
    utils.clear_warnings()
    yield


# Isolate the GLSL conv-synthesis disk cache: without this, entries under
# ~/.cache written by earlier runs would mask synthesis REGRESSIONS (the
# fuzz sources are deterministic, so their hashes are stable) and test
# runs would pollute the user-level cache.
_SYNTH_CACHE_DIR = None


@pytest.fixture(autouse=True, scope="session")
def _isolated_synth_cache(tmp_path_factory):
    global _SYNTH_CACHE_DIR
    _SYNTH_CACHE_DIR = str(tmp_path_factory.mktemp("convsynth"))
    os.environ["REFORGE_SYNTH_CACHE"] = _SYNTH_CACHE_DIR
    yield
    os.environ.pop("REFORGE_SYNTH_CACHE", None)


# ---- fast-by-default selection -------------------------------------------
#
# The full suite takes ~7.5 min on a 1-core box; the default run deselects
# the randomized fuzz suites (`fuzz`) and the individually heavy tests
# (`slow`, measured > ~2.5 s with --durations) so iteration stays < 2 min.
# `pytest -q -m ""` runs everything.  Centralized here (rather than inline
# decorators) because several entries are single parametrize cases.
_SLOW = [
    "test_goldens.py::test_goldens",
    "test_goldens.py::test_shader_goldens",
    "test_goldens.py::test_builtin_kernel_goldens",
    "test_kernels.py::TestNumerics::test_all_kernels_trace",
    "test_kernels.py::TestNumerics::test_gaussian_preserves_constant",
    "test_kernels.py::TestChannelLocalForms::test_conv_epilogue_cw_matches",
    "test_kernels.py::TestChannelLocalForms::test_cw_matches_full",
    "test_kernels.py::TestEdgePreservingKernels::test_bilateral_preserves_step_edge",
    "test_kernels.py::TestArtisticKernels::test_kuwahara_flat_preserved",
    "test_kernels.py::TestStylizedKernels::test_halftone_black_and_white_extremes",
    "test_graph.py::TestConvBundling::test_bundled_matches_per_node",
    "test_graph.py::TestConvBundling::test_strip_fused_matches_per_node",
    "test_graph.py::TestExecution::test_branching_equals_manual",
    "test_pallas_ops.py::test_graph_strip_raw_padding_matches",
    "test_pallas_ops.py::TestMxuX3Variant::test_matches_sep_conv_f32_exact",
    "test_pallas_ops.py::TestMxuX3Variant::test_three_tile_band_and_zero_mode",
    "test_pallas_ops.py::TestMxuVariant::test_wide_radius_falls_back",
    "test_pallas_ops.py::TestMxuVariant::test_matches_sep_conv_f32",
    "test_pallas_ops.py::TestMxuVariant::test_matches_zero_mode_and_asym",
    "test_pallas_ops.py::TestMxuVariant::test_bf16_input",
    "test_pallas_ops.py::test_sep_conv_matches",
    "test_pallas_ops.py::test_sep_conv_fused_matches",
    "test_pallas_ops.py::test_sep_conv_fused_raw_padding_matches",
    "test_pallas_ops.py::test_both_fused_variants_match",
    "test_pallas_ops.py::test_non_divisible_dims",
    "test_pallas_ops.py::test_stencil_raw_padding_matches",
    "test_pallas_ops.py::test_conv_matches_jnp",
    "test_parallel.py::TestHaloSharding::test_matches_single_device[edge_preserving]",
    "test_parallel.py::TestHaloSharding::test_ssbo_pipeline_sharded",
    "test_parallel.py::TestGspmdSharding::test_matches_single_device",
    "test_parity.py::TestConvParity::test_gaussian",
    "test_parity.py::TestConvParity::test_unsharp",
    "test_parity.py::TestConvParity::test_box_blur",
    "test_ssbo.py::TestSharded::test_histogram_pipeline_sharded",
]


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("/")[-1]
        if rel.startswith("test_fuzz.py::"):
            item.add_marker(pytest.mark.fuzz)
            continue
        for entry in _SLOW:
            if rel == entry or rel.startswith(entry + "[") or rel.startswith(entry + "::"):
                item.add_marker(pytest.mark.slow)
                break
