"""Experiment utilities: SuiteSparse loading, directories, test matrices.

Parity with reference ``src/matfree_extensions/util/exp_util.py``:
``suite_sparse_load`` (exp_util.py:35-42), ``matching_directory``
(exp_util.py:102-110), ``hilbert`` (exp_util.py:113-115),
``tree_random_like`` (exp_util.py:118-121).

TPU-first divergence: the MatrixMarket loader returns this framework's CSR
operator (``lanczos_adjoints_tpu.ops.sparse``) instead of a
``jax.experimental.sparse.BCOO``; a dense/COO view is available for tests.
The .mtx parser is a self-contained numpy reader (no scipy.io dependency
required, though scipy is used when available for speed).
"""

import gzip
import os
import tarfile

import jax
import jax.numpy as jnp
import numpy as np


def hilbert(ndim: int, /):
    """The Hilbert matrix: ill-conditioned SPD test matrix."""
    a = jnp.arange(ndim)
    return 1.0 / (1.0 + a[:, None] + a[None, :])


def tree_random_like(key, tree, /):
    """Sample a pytree of standard-normal values shaped like ``tree``."""
    flat, unflatten = jax.flatten_util.ravel_pytree(tree)
    sample = jax.random.normal(key, shape=flat.shape, dtype=flat.dtype)
    return unflatten(sample)


def matching_directory(file: str, where: str, /, *, replace: str = "experiments/"):
    """Mirror an experiment script's path into results/ or figures/.

    ``matching_directory(__file__, "results/")`` maps
    ``.../experiments/foo/bar.py`` -> ``.../results/foo/bar/``.
    """
    if where not in ("results/", "figures/", "data/"):
        msg = f"where={where!r} not in ('results/', 'figures/', 'data/')"
        raise ValueError(msg)
    directory = os.path.dirname(os.path.abspath(file))
    basename = os.path.splitext(os.path.basename(file))[0]
    if replace not in directory:
        msg = f"{replace!r} not part of {directory!r}"
        raise ValueError(msg)
    return directory.replace(replace, where) + f"/{basename}/"


def mtx_read(path: str, /):
    """Parse a MatrixMarket coordinate file -> (rows, cols, vals, shape).

    Handles general/symmetric coordinate real/integer/pattern files and
    transparent .gz / .tar.gz containers. Symmetric files are expanded to
    full storage. Indices are returned zero-based.

    Fast path: ``scipy.io.mmread`` (fast_matrix_market, ~300 MB/s
    measured -- experiments/benchmarks/mtx_parser); falls back to the
    bundled C++ body parser (``native/mtxparse.cc``) and finally pure
    numpy when scipy is absent.
    """
    coo = _mmread_scipy(path)
    if coo is not None:
        rows = coo.row.astype(np.int64)
        cols = coo.col.astype(np.int64)
        vals = np.asarray(coo.data, dtype=np.float64)
        return rows, cols, vals, coo.shape
    return _mtx_read_builtin(path)


def _mmread_scipy(path: str):
    """scipy.io.mmread as a COO matrix, or None if unavailable."""
    try:
        from scipy.io import mmread
        from scipy.sparse import coo_matrix
    except ImportError:
        return None
    if path.endswith(".tar.gz"):
        with tarfile.open(path, "r:gz") as tar:
            members = [m for m in tar.getmembers() if m.name.endswith(".mtx")]
            if not members:
                msg = f"No .mtx member inside {path}"
                raise FileNotFoundError(msg)
            mat = mmread(tar.extractfile(members[0]))
    else:
        mat = mmread(path)
    if not hasattr(mat, "tocoo"):  # dense array format
        mat = coo_matrix(mat)
    return mat.tocoo()


def _mtx_read_builtin(path: str, /):
    if path.endswith(".tar.gz"):
        with tarfile.open(path, "r:gz") as tar:
            members = [m for m in tar.getmembers() if m.name.endswith(".mtx")]
            if not members:
                msg = f"No .mtx member inside {path}"
                raise FileNotFoundError(msg)
            fileobj = tar.extractfile(members[0])
            data = fileobj.read().decode()
    elif path.endswith(".gz"):
        with gzip.open(path, "rt") as fp:
            data = fp.read()
    else:
        with open(path) as fp:
            data = fp.read()

    lines = data.splitlines()
    header = lines[0].lower().split()
    if len(header) < 5 or header[0] != "%%matrixmarket":
        msg = f"Not a MatrixMarket file: {path}"
        raise ValueError(msg)
    _, obj, fmt, field, symmetry = header[:5]
    if obj != "matrix" or fmt != "coordinate":
        msg = f"Only coordinate matrices supported, got {obj}/{fmt}"
        raise ValueError(msg)

    # Locate the size line (first non-comment line after the header).
    pos = 1
    while lines[pos].strip() == "" or lines[pos].startswith("%"):
        pos += 1
    nrows, ncols, nnz = (int(t) for t in lines[pos].split()[:3])

    has_values = field != "pattern"
    from lanczos_adjoints_tpu import native

    mtxparse = native.get_mtxparse()
    if mtxparse is not None:
        # Native C parser: single strtol/strtod sweep over the body.
        body_text = "\n".join(lines[pos + 1 :])
        rows, cols, vals = mtxparse.parse_body(body_text, nnz, has_values)
    else:
        body = [
            ln for ln in lines[pos + 1 :] if ln.strip() and not ln.startswith("%")
        ]
        entries = body[:nnz]
        if not has_values:
            arr = np.loadtxt(entries, dtype=np.int64, ndmin=2)
            rows, cols = arr[:, 0] - 1, arr[:, 1] - 1
            vals = np.ones(len(rows), dtype=np.float64)
        else:
            arr = np.loadtxt(entries, dtype=np.float64, ndmin=2)
            rows = arr[:, 0].astype(np.int64) - 1
            cols = arr[:, 1].astype(np.int64) - 1
            vals = arr[:, 2] if arr.shape[1] > 2 else np.ones(len(rows))

    if symmetry in ("symmetric", "skew-symmetric", "hermitian"):
        off = rows != cols
        sign = -1.0 if symmetry == "skew-symmetric" else 1.0
        rows, cols = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
        )
        vals = np.concatenate([vals, sign * vals[off]])

    return rows, cols, vals, (nrows, ncols)


def suite_sparse_load(which: str, /, path: str = "./data/matrices/"):
    """Load a bundled SuiteSparse matrix as a CSR operator.

    Searches ``path/<which>/<which>.mtx`` and ``path/<which>.tar.gz``.
    Returns a ``lanczos_adjoints_tpu.ops.sparse.CSRMatrix``.
    """
    from lanczos_adjoints_tpu.ops import sparse

    candidates = [
        os.path.join(path, which, f"{which}.mtx"),
        os.path.join(path, f"{which}.mtx"),
        os.path.join(path, f"{which}.tar.gz"),
    ]
    for cand in candidates:
        if os.path.exists(cand):
            rows, cols, vals, shape = mtx_read(cand)
            return sparse.csr_from_coo(rows, cols, vals, shape=shape)
    msg = f"Matrix {which!r} not found under {path!r} (tried {candidates})"
    raise FileNotFoundError(msg)


def suite_sparse_download(which: str, /, path: str = "./data/matrices/"):
    """Offline stand-in for the reference's ssgetpy downloader.

    This environment has no network egress; the function verifies the
    matrix is already bundled and raises otherwise.
    """
    try:
        suite_sparse_load(which, path)
    except FileNotFoundError as err:
        msg = (
            f"Matrix {which!r} is not bundled under {path!r} and this "
            "environment has no network access for downloads."
        )
        raise RuntimeError(msg) from err


def plt_spy_coo(ax, rows, cols, /, *, shape, markersize=1.0, color="black"):
    """Sparsity ("spy") plot of a COO pattern onto a matplotlib axis.

    Parity with reference exp_util.py:75-99 (which takes a BCOO; here
    the pattern is passed as row/column index arrays).
    """
    ax.scatter(cols, rows, s=markersize, c=color, marker="s", linewidths=0)
    ax.set_xlim(-0.5, shape[1] - 0.5)
    ax.set_ylim(shape[0] - 0.5, -0.5)
    ax.set_aspect("equal")
    return ax


def uci_dataset_mlrepo(name: str, /):
    """Reference exp_util.py:45-72 fetched datasets from ucimlrepo.

    This environment has no network egress; use the bundled loaders in
    ``lanczos_adjoints_tpu.utils.uci`` instead.
    """
    msg = (
        f"uci_dataset_mlrepo({name!r}) requires network access "
        "(ucimlrepo); use lanczos_adjoints_tpu.utils.uci loaders with the "
        "bundled data instead."
    )
    raise RuntimeError(msg)
