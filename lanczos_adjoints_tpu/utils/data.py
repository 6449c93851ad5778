"""Data pipelines: UCI preprocessing, train/test splits, torch image loaders.

Parity with reference ``src/matfree_extensions/util/data_util.py``:
Wu-et-al.-style UCI preprocessing (data_util.py:47-206), numpy collate
(data_util.py:209), JAX train/test splits (data_util.py:371-392), and
the torchvision CIFAR-10 / ImageNet / Places365 pipelines
(data_util.py:225-510) -- torch-gated, with the reference's hard-coded
cluster paths (data_util.py:231,350,398) replaced by arguments.
"""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np


def set_seed(seed: int):
    """Seed python/numpy (and torch if present) RNGs."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
        torch.cuda.manual_seed_all(seed)
    except ImportError:
        pass


# ---------------------------------------------------------------------------
# UCI preprocessing (Wu et al., AISTATS'24 style)
# ---------------------------------------------------------------------------


def uci_preprocessing(inputs, targets, test_mask_column, *, verbose=False):
    """Split by a 0/1 test-mask column and z-score using train statistics."""
    test_mask = test_mask_column.astype(bool)
    x_train, y_train = inputs[~test_mask], targets[~test_mask]
    x_test, y_test = inputs[test_mask], targets[test_mask]

    mu_x = x_train.mean(axis=0, keepdims=True)
    std_x = x_train.std(axis=0, keepdims=True)
    std_x = np.where(std_x < 1e-12, 1.0, std_x)
    mu_y, std_y = y_train.mean(), y_train.std()

    x_train = (x_train - mu_x) / std_x
    x_test = (x_test - mu_x) / std_x
    y_train = (y_train - mu_y) / std_y
    y_test = (y_test - mu_y) / std_y

    if verbose:
        print(f"train {x_train.shape}, test {x_test.shape}")
    stats = {"mu_x": mu_x, "std_x": std_x, "mu_y": mu_y, "std_y": std_y}
    return (x_train, y_train), (x_test, y_test), stats


def load_uci_data(name: str, *, split: int = 0, root="./data/uci", verbose=False):
    """Load a Wu-et-al.-packaged UCI dataset (data.csv.gz + test_mask.csv.gz).

    ``split`` selects one of the mask columns (0..9).  Searches the local
    root, the repo's data dir, and the bundled reference data.
    """
    import pandas as pd

    candidates = [root, "/root/repo/data/uci", "/root/reference/data/uci"]
    for cand in candidates:
        data_path = os.path.join(cand, name, "data.csv.gz")
        mask_path = os.path.join(cand, name, "test_mask.csv.gz")
        if os.path.exists(data_path) and os.path.getsize(data_path) > 0:
            frame = pd.read_csv(data_path, header=None).values.astype(np.float64)
            masks = pd.read_csv(mask_path, header=None).values.astype(np.int64)
            inputs, targets = frame[:, :-1], frame[:, -1]
            return uci_preprocessing(
                inputs, targets, masks[:, split], verbose=verbose
            )
    msg = f"UCI dataset {name!r} not found under {candidates}"
    raise FileNotFoundError(msg)


# ---------------------------------------------------------------------------
# JAX splits + collate
# ---------------------------------------------------------------------------


def split_train_test(inputs, targets, /, *, train_fraction: float = 0.9):
    """Deterministic head/tail split."""
    n_train = int(train_fraction * len(inputs))
    return (
        (inputs[:n_train], targets[:n_train]),
        (inputs[n_train:], targets[n_train:]),
    )


def split_train_test_shuffle(key, inputs, targets, /, *, train_fraction: float = 0.9):
    """Shuffled split with a JAX PRNG key."""
    perm = jax.random.permutation(key, len(inputs))
    inputs, targets = inputs[perm], targets[perm]
    return split_train_test(inputs, targets, train_fraction=train_fraction)


def numpy_collate_fn(batch):
    """torch DataLoader collate producing numpy arrays (for JAX consumers)."""
    images, labels = zip(*batch)
    return {
        "image": np.stack([np.asarray(img) for img in images]),
        "label": np.stack([np.asarray(lbl) for lbl in labels]),
    }


# ---------------------------------------------------------------------------
# Torch image pipelines (optional dependency)
# ---------------------------------------------------------------------------


def _require_torchvision():
    try:
        import torchvision  # noqa: F401
        from torch.utils import data  # noqa: F401
    except ImportError as err:
        msg = "This loader requires torch/torchvision."
        raise ImportError(msg) from err


def get_cifar10(
    batch_size: int,
    *,
    root: str = "./data/cifar10",
    download: bool = False,
    num_workers: int = 0,
    n_classes: int = 10,
):
    """CIFAR-10 train/test loaders with augmentation and one-hot labels."""
    _require_torchvision()
    import torch
    import torchvision
    import torchvision.transforms as T

    normalize = T.Normalize(
        mean=(0.4914, 0.4822, 0.4465), std=(0.247, 0.243, 0.261)
    )
    train_tf = T.Compose(
        [
            T.RandomCrop(32, padding=4),
            T.RandomHorizontalFlip(),
            T.ToTensor(),
            normalize,
        ]
    )
    test_tf = T.Compose([T.ToTensor(), normalize])

    def to_one_hot(target):
        return np.eye(n_classes, dtype=np.float32)[target]

    train_set = torchvision.datasets.CIFAR10(
        root, train=True, download=download, transform=train_tf,
        target_transform=to_one_hot,
    )
    test_set = torchvision.datasets.CIFAR10(
        root, train=False, download=download, transform=test_tf,
        target_transform=to_one_hot,
    )
    train_loader = torch.utils.data.DataLoader(
        train_set,
        batch_size=batch_size,
        shuffle=True,
        num_workers=num_workers,
        collate_fn=numpy_collate_fn,
    )
    test_loader = torch.utils.data.DataLoader(
        test_set,
        batch_size=batch_size,
        shuffle=False,
        num_workers=num_workers,
        collate_fn=numpy_collate_fn,
    )
    return train_loader, test_loader


def imagenet1k_loaders(
    batch_size: int,
    *,
    train_dir: str,
    val_dir: str,
    num_workers: int = 0,
    n_classes: int = 1000,
):
    """ImageNet-1k folder loaders (paths are arguments, not hard-coded)."""
    _require_torchvision()
    import torch
    import torchvision
    import torchvision.transforms as T

    normalize = T.Normalize(
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)
    )
    train_tf = T.Compose(
        [
            T.RandomResizedCrop(224),
            T.RandomHorizontalFlip(),
            T.ToTensor(),
            normalize,
        ]
    )
    val_tf = T.Compose(
        [T.Resize(256), T.CenterCrop(224), T.ToTensor(), normalize]
    )

    def to_one_hot(target):
        return np.eye(n_classes, dtype=np.float32)[target]

    train_set = torchvision.datasets.ImageFolder(
        train_dir, transform=train_tf, target_transform=to_one_hot
    )
    val_set = torchvision.datasets.ImageFolder(
        val_dir, transform=val_tf, target_transform=to_one_hot
    )
    train_loader = torch.utils.data.DataLoader(
        train_set,
        batch_size=batch_size,
        shuffle=True,
        num_workers=num_workers,
        collate_fn=numpy_collate_fn,
    )
    val_loader = torch.utils.data.DataLoader(
        val_set,
        batch_size=batch_size,
        shuffle=False,
        num_workers=num_workers,
        collate_fn=numpy_collate_fn,
    )
    return train_loader, val_loader


# Reference-compatible alias.
ImageNet1k_loaders = imagenet1k_loaders


def get_places365(
    batch_size: int,
    *,
    root: str = "./data/places365",
    download: bool = False,
    num_workers: int = 0,
):
    """Places365 loader used as the OOD set for Laplace metrics."""
    _require_torchvision()
    import torch
    import torchvision
    import torchvision.transforms as T

    tf = T.Compose(
        [
            T.Resize(256),
            T.CenterCrop(224),
            T.ToTensor(),
            T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        ]
    )
    dataset = torchvision.datasets.Places365(
        root, split="val", small=True, download=download, transform=tf
    )
    return torch.utils.data.DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=False,
        num_workers=num_workers,
        collate_fn=lambda batch: {
            "image": np.stack([np.asarray(img) for img, _ in batch]),
            "label": np.stack([np.asarray(lbl) for _, lbl in batch]),
        },
    )


def imagenet_testset(
    root_dir: str,
    label_file: str,
    *,
    transform=None,
    target_transform=None,
):
    """ImageNet validation set from a folder + "<file> <label>" list file.

    Parity with the reference's ``Imagenet_testset``
    (data_util.py:395-434); paths are arguments instead of hard-coded
    cluster locations.
    """
    _require_torchvision()
    import torch
    from PIL import Image

    class _ImagenetTestset(torch.utils.data.Dataset):
        def __init__(self):
            with open(label_file) as fp:
                self.entries = [ln.split() for ln in fp if ln.strip()]

        def __len__(self):
            return len(self.entries)

        def __getitem__(self, idx):
            fname, label = self.entries[idx][0], int(self.entries[idx][1])
            image = Image.open(os.path.join(root_dir, fname))
            if image.mode != "RGB":
                image = image.convert("RGB")
            if transform is not None:
                image = transform(image)
            if target_transform is not None:
                label = target_transform(label)
            return image, label

    return _ImagenetTestset()


# Reference-compatible alias.
Imagenet_testset = imagenet_testset


def get_imagenet_test_loader(
    batch_size: int,
    *,
    root_dir: str,
    label_file: str,
    num_workers: int = 0,
    n_classes: int = 1000,
    seed: int = 0,
):
    """DataLoader over :func:`imagenet_testset` with one-hot labels."""
    _require_torchvision()
    import torch
    import torchvision.transforms as T

    set_seed(seed)
    tf = T.Compose(
        [
            T.Resize(256),
            T.CenterCrop(224),
            T.ToTensor(),
            T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        ]
    )

    def to_one_hot(target):
        return np.eye(n_classes, dtype=np.float32)[target]

    dataset = imagenet_testset(
        root_dir, label_file, transform=tf, target_transform=to_one_hot
    )
    return torch.utils.data.DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=False,
        num_workers=num_workers,
        collate_fn=numpy_collate_fn,
    )
