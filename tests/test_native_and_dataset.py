"""Native frameio library + dataset plumbing + RAFT EPE metric."""

import numpy as np


def test_native_frameio_roundtrip():
    from vtoonify_tpu import native

    rng = np.random.RandomState(0)
    bgr = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    batch = np.zeros((3, 17, 23, 3), dtype=np.uint8)
    native.bgr_to_rgb_into_batch(bgr, batch, 1)
    np.testing.assert_array_equal(batch[1], bgr[..., ::-1])
    assert batch[0].sum() == 0

    rgb = batch[1]
    back = native.rgb_to_bgr(rgb)
    np.testing.assert_array_equal(back, bgr)

    f = native.u8_to_unit(rgb)
    np.testing.assert_allclose(f, rgb.astype(np.float32) / 127.5 - 1, atol=1e-6)
    u = native.unit_to_u8(f)
    np.testing.assert_array_equal(u, rgb)

    # confirm which path ran (native build should succeed in this image)
    assert native.lib() is not None, "native build failed; fallback used"


def test_dataset_roundtrip(tmp_path):
    import cv2

    from vtoonify_tpu.train.dataset import MultiResolutionDataset, prepare_data

    rng = np.random.RandomState(1)
    paths = []
    for i in range(5):
        img = rng.randint(0, 255, (40, 30, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    prepare_data(paths, str(tmp_path / "packed"), sizes=(16, 32), shard_size=2)

    ds = MultiResolutionDataset(str(tmp_path / "packed"), resolution=32)
    assert len(ds) == 5
    assert ds[4].shape == (32, 32, 3)
    batches = list(ds.batches(2, epochs=1, seed=0))
    assert len(batches) == 2
    assert batches[0].shape == (2, 32, 32, 3)
    assert batches[0].min() >= -1 and batches[0].max() <= 1
    # process sharding splits the index space
    b0 = list(ds.batches(1, epochs=1, process_index=0, process_count=2))
    b1 = list(ds.batches(1, epochs=1, process_index=1, process_count=2))
    assert len(b0) + len(b1) == 5


def test_prepare_data_cli(tmp_path):
    """vtoonify-prepare-data: the reference prepare_data.py CLI equivalent
    (directory walk -> packed shards loadable by MultiResolutionDataset)."""
    import cv2

    from vtoonify_tpu.train.dataset import MultiResolutionDataset, main

    rng = np.random.RandomState(2)
    sub = tmp_path / "imgs" / "nested"
    sub.mkdir(parents=True)
    for i in range(3):
        cv2.imwrite(str(sub / f"{i}.jpg"),
                    rng.randint(0, 255, (24, 24, 3), dtype=np.uint8))
    out = str(tmp_path / "packed")
    main([str(tmp_path / "imgs"), "--out", out, "--size", "16",
          "--shard_size", "2"])
    ds = MultiResolutionDataset(out, resolution=16)
    assert len(ds) == 3 and ds[2].shape == (16, 16, 3)


def test_epe_metric():
    import jax.numpy as jnp

    from vtoonify_tpu.models.raft_eval import end_point_error

    pred = jnp.zeros((1, 4, 4, 2))
    gt = jnp.ones((1, 4, 4, 2)) * jnp.array([3.0, 4.0])
    m = end_point_error(pred, gt)
    assert np.isclose(m["epe"], 5.0)
    assert m["1px"] == 0.0 and m["5px"] == 0.0
    m2 = end_point_error(gt, gt)
    assert m2["epe"] == 0.0 and m2["1px"] == 1.0
