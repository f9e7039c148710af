"""Orbax checkpointing: full-state save/restore is exact (SURVEY §5.4 gap)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_train_state_roundtrip(tmp_path):
    from vtoonify_tpu.models.vtoonify import VToonifyConfig, init_vtoonify
    from vtoonify_tpu.train.steps import init_pretrain_state
    from vtoonify_tpu.utils.checkpoint import (
        load_train_state,
        save_train_state,
    )

    cfg = VToonifyConfig(in_size=32, out_size=128, channel_multiplier=1,
                         num_res_layers=1, backbone="toonify")
    vt = init_vtoonify(jax.random.PRNGKey(0), cfg)
    state = init_pretrain_state(vt)
    state = state._replace(step=jnp.asarray(7, jnp.int32))

    path = str(tmp_path / "state.ckpt")
    save_train_state(path, state)
    template = init_pretrain_state(vt)
    restored = load_train_state(path, template)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pytree_roundtrip(tmp_path):
    from vtoonify_tpu.utils.checkpoint import load_pytree, save_pytree

    tree = {"a": jnp.arange(5.0), "b": [jnp.ones((2, 3)), jnp.zeros(())]}
    path = str(tmp_path / "tree.ckpt")
    save_pytree(path, tree)
    out = load_pytree(path)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(5.0))
    np.testing.assert_array_equal(np.asarray(out["b"][0]), np.ones((2, 3)))
