"""Data layer: mtx parsing, UCI loaders, splits, directories."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu.utils import data, exp_util, uci


def test_mtx_read_symmetric_expansion():
    rows, cols, vals, shape = exp_util.mtx_read(
        "/root/reference/data/matrices/1138_bus/1138_bus.mtx"
    )
    assert shape == (1138, 1138)
    # Symmetric expansion: for every off-diagonal (i, j) there is (j, i).
    off = rows != cols
    pairs = set(zip(rows[off].tolist(), cols[off].tolist()))
    assert all((j, i) in pairs for i, j in list(pairs)[:100])


def test_suite_sparse_load():
    mat = exp_util.suite_sparse_load(
        "1138_bus", path="/root/reference/data/matrices/"
    )
    assert mat.shape == (1138, 1138)
    assert mat.is_symmetric()


def test_hilbert_and_tree_random_like():
    H = exp_util.hilbert(4)
    assert jnp.allclose(H[0, 0], 1.0)
    assert jnp.allclose(H[1, 2], 0.25)

    tree = {"a": jnp.zeros((3,)), "b": (jnp.zeros((2, 2)),)}
    sample = exp_util.tree_random_like(jax.random.PRNGKey(0), tree)
    assert sample["a"].shape == (3,)
    assert not jnp.allclose(sample["a"], 0.0)


def test_matching_directory():
    path = exp_util.matching_directory(
        "/root/repo/experiments/foo/bar.py", "results/"
    )
    assert path == "/root/repo/results/foo/bar/"
    with pytest.raises(ValueError):
        exp_util.matching_directory("/root/repo/experiments/foo/bar.py", "junk/")


def test_uci_bundled_npy_loader():
    inputs, targets = uci.uci_concrete(normalize=True)
    assert inputs.shape == (1030, 8)
    assert targets.shape == (1030,)
    assert abs(float(np.mean(targets))) < 1e-6


def test_uci_bundled_csv_loader():
    inputs, targets = uci.uci_elevators(normalize=True)
    assert inputs.shape[0] == targets.shape[0] == 16599
    assert inputs.shape[1] == 18


def test_uci_missing_raises():
    with pytest.raises(FileNotFoundError, match="song"):
        uci.uci_song()


def test_load_uci_data_with_mask():
    (x_tr, y_tr), (x_te, y_te), stats = data.load_uci_data("elevators", split=0)
    assert len(x_tr) + len(x_te) == 16599
    assert abs(float(y_tr.mean())) < 1e-6
    assert "mu_y" in stats


def test_splits():
    x = jnp.arange(100.0)[:, None]
    y = jnp.arange(100.0)
    (tr, te) = data.split_train_test(x, y, train_fraction=0.8)
    assert len(tr[0]) == 80 and len(te[0]) == 20

    (tr_s, te_s) = data.split_train_test_shuffle(
        jax.random.PRNGKey(0), x, y, train_fraction=0.8
    )
    assert len(tr_s[0]) == 80
    assert not jnp.allclose(tr_s[1], tr[1])


def test_uci_synthetic_gp500k_shapes_and_determinism():
    """The N=400k-train scale-demo loader: exact shapes, fixed seed."""
    inputs, targets = uci.uci_synthetic_gp500k(normalize=True)
    assert inputs.shape == (500_000, 8)
    assert targets.shape == (500_000,)
    # The driver's 0.8 train fraction must give exactly the reference's
    # N_train = 400,000 (ref scripts/gaussian_processes/_train_gp.sh).
    assert int(0.8 * len(inputs)) == 400_000
    inputs2, targets2 = uci.uci_synthetic_gp500k(normalize=True)
    assert np.array_equal(inputs[:100], inputs2[:100])
    assert np.array_equal(targets[:100], targets2[:100])
    assert abs(float(targets.mean())) < 1e-3


def test_numpy_collate_under_real_torch_dataloader():
    """Drive the actual torch DataLoader machinery the image pipelines use.

    torchvision (and hence the CIFAR/ImageNet datasets) is absent in this
    environment, but torch itself is present -- so the DataLoader +
    ``numpy_collate_fn`` + ``set_seed`` path shared by every image loader
    (get_cifar10 / imagenet1k_loaders / get_imagenet_test_loader) is
    executed here against a synthetic map-style dataset.
    """
    torch = pytest.importorskip("torch")
    from lanczos_adjoints_tpu.utils import data as data_util

    class _Synthetic(torch.utils.data.Dataset):
        def __len__(self):
            return 10

        def __getitem__(self, idx):
            img = torch.full((3, 8, 8), float(idx))
            label = np.eye(4, dtype=np.float32)[idx % 4]
            return img, label

    data_util.set_seed(0)
    loader = torch.utils.data.DataLoader(
        _Synthetic(), batch_size=4, shuffle=True,
        collate_fn=data_util.numpy_collate_fn,
    )
    batches = list(loader)
    assert len(batches) == 3
    batch = batches[0]
    assert isinstance(batch["image"], np.ndarray)
    assert batch["image"].shape == (4, 3, 8, 8)
    assert batch["label"].shape == (4, 4)
    # shuffle=True under set_seed is deterministic across constructions
    data_util.set_seed(0)
    loader2 = torch.utils.data.DataLoader(
        _Synthetic(), batch_size=4, shuffle=True,
        collate_fn=data_util.numpy_collate_fn,
    )
    again = next(iter(loader2))
    assert np.array_equal(batch["image"], again["image"])
