"""Test config: run on a virtual 8-device CPU mesh (TPU-free, hermetic).

This mirrors SURVEY.md §4's plan: multi-device correctness is validated with
XLA's host-platform device simulation — the TPU-native analogue of the
reference's op_cpu fake-backend (model/stylegan/op_cpu/readme.md).
"""

import os

# Must be set before jax initializes its backends (override any outer value —
# the test suite is hermetic-CPU by design).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize may have pinned a hardware platform; tests
# are hermetic-CPU, so override after import as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Fast dev-loop tier (`pytest -m quick`, measured 4:44 on the loaded
# 1-core CI host, round 4): every test EXCEPT the
# compile-heavy ones below (each >10 s under --durations=0; the full suite is
# >1 h). New tests are quick by default — add them here when they grow past
# ~10 s. e2e-marked tests are never quick.
_HEAVY_TESTS = {
    "test_arcface_parity",
    "test_bisenet_parity",
    "test_bucketed_vs_exact_outputs",
    "test_demo_directory",
    "test_discriminator_parity",
    "test_dp_inference_frame_sharding",
    "test_dp_tp_inference_pipeline_e2e",
    "test_dp_tp_pretrain_step",
    "test_dp_tp_train_step",
    "test_dp_tp_train_t_step",
    "test_frame_graph_parity",
    "test_generator_w_parity",
    "test_load_reference_vtoonify_and_faceparsing",
    "test_pipeline_bucketing_and_mesh",
    "test_pretrain_step_runs_and_learns",
    "test_pretrain_t_step",
    "test_psp_encoder_parity",
    "test_psp_full_wrapper",
    "test_psp_init_structure_matches",
    "test_raft_init_smoke",
    "test_raft_parity",
    "test_raft_train_cli",
    "test_raft_train_step",
    "test_sample_grid_logger",
    "test_smooth_parsing_maps_smoke",
    "test_train_d_cli_both_stages",
    "test_train_d_step_runs",
    "test_train_state_roundtrip",
    "test_train_steps_bf16_mixed_precision",
    "test_train_t_step",
    "test_validate_drivers_run",
    "test_vgg19_loss_shapes",
    "test_video_engine",
    "test_vtoonify_apply_fold_matches_tiled",
    "test_raft_apply_alt_corr_matches",
    "test_sp_single_frame_inference",
    # round-4 re-tier (VERDICT r3 #6): everything measured >10 s on the
    # 1-core host (pytest -m quick --durations, 2026-08-19) moves out of
    # the quick tier — quick re-measured at 4:44 / 111 tests after.
    "test_hlo_collectives_train_d",
    "test_hlo_collectives_train_t",
    "test_hlo_collectives_inference",
    "test_bucket_margin_paranoid_mode",
    "test_synth_dtype_bf16_tracks_f32",
    "test_raft_train_step_train_bn",
    "test_pipeline_packed_output_end_to_end",
    "test_generator_packed_stages_match_unpacked",
    "test_lookup_corr_alt_matches_allpairs",
    # added after the re-tier: chains two raft-train CLI runs (two full
    # train-step compiles) + a validate_chairs pass — minutes, not quick.
    "test_raft_train_cli_stage_chaining",
    # r5: compiles a 64px generator (~28 s on the 1-core host)
    "test_channel_max_caps_table_and_params",
    # r5: traces train_d_step 4x (~79 s)
    "test_remat_scope_traces_all_variants",
    # r5: T-trainer CLI e2e (two full compiles, ~20 min)
    "test_train_t_cli_both_stages",
    # r5: full-size flagship init + eval_shape trace (~56 s)
    "test_entry_traces_at_flagship_config",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _HEAVY_TESTS or "e2e" in item.keywords:
            continue
        item.add_marker(pytest.mark.quick)

