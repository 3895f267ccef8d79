"""Small shared utilities.

Behavioural counterpart of the reference's point_vs/utils.py (path expansion,
checkpoint discovery, yaml IO, prediction-file statistics, timers); the
device-side helpers are new and JAX-specific.
"""
from __future__ import annotations

import math
import os
import time
from pathlib import Path, PosixPath
from typing import Any, Iterable

import numpy as np
import yaml


def expand_path(*paths) -> Path:
    """Expand ~ and environment variables and resolve to an absolute Path.

    Ref parity: point_vs/utils.py expand_path.
    """
    return Path(
        os.path.expandvars(Path(*[str(p) for p in paths]).expanduser())
    ).absolute()


def shorten_home(path) -> Path:
    """Replace the home directory prefix with ~ for display purposes."""
    home = str(Path.home())
    path = str(Path(path))
    if path.startswith(home):
        return Path('~' + path[len(home):])
    return Path(path)


def mkdir(*paths) -> Path:
    """Make a directory (including parents), returning its Path."""
    path = expand_path(Path(*[str(p) for p in paths]))
    path.mkdir(exist_ok=True, parents=True)
    return path


def save_yaml(obj: Any, fname) -> None:
    """Dump an object to yaml, coercing Paths to strings."""

    def _coerce(o):
        if isinstance(o, (Path, PosixPath)):
            return str(o)
        if isinstance(o, dict):
            return {k: _coerce(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [_coerce(v) for v in o]
        if isinstance(o, np.generic):
            return o.item()
        return o

    with open(expand_path(fname), 'w', encoding='utf-8') as f:
        yaml.dump(_coerce(obj), f)


def load_yaml(fname) -> Any:
    """Load a yaml file, tolerating unknown python object tags.

    Ref parity: point_vs/utils.py load_yaml registers a multi-constructor so
    that e.g. posix paths serialised by other versions do not crash loading.
    """

    class _TolerantLoader(yaml.SafeLoader):
        pass

    def _unknown(loader, suffix, node):
        if isinstance(node, yaml.ScalarNode):
            return loader.construct_scalar(node)
        if isinstance(node, yaml.SequenceNode):
            return loader.construct_sequence(node)
        if isinstance(node, yaml.MappingNode):
            return loader.construct_mapping(node)
        return None

    _TolerantLoader.add_multi_constructor('tag:yaml.org,2002:python/', _unknown)
    _TolerantLoader.add_multi_constructor('!', _unknown)
    with open(expand_path(fname), 'r', encoding='utf-8') as f:
        return yaml.load(f, Loader=_TolerantLoader)


def find_latest_checkpoint(root, model_task: str = '') -> Path:
    """Find the most recently written checkpoint under <root>[/checkpoints].

    Checkpoints are orbax directories (or files) named
    ``<task>_ckpt_epoch_<n>``; latest is by modification time then epoch.
    Ref parity: point_vs/utils.py find_latest_checkpoint (ctime based).
    """
    root = expand_path(root)
    for candidate_dir in (root / 'checkpoints', root):
        if not candidate_dir.is_dir():
            continue
        ckpts = [p for p in candidate_dir.glob(f'{model_task}*ckpt_epoch_*')]
        if ckpts:
            return max(ckpts, key=lambda p: (p.stat().st_mtime, str(p)))
    raise FileNotFoundError(f'No checkpoints found under {root}')


def get_n_cols(fname) -> int:
    """Number of whitespace-separated columns in the first line of a file."""
    with open(expand_path(fname), 'r', encoding='utf-8') as f:
        for line in f:
            line = line.strip()
            if line:
                return len(line.split())
    return 0


def to_numpy(x) -> np.ndarray:
    """Convert a jax/np array (or scalar) to a host numpy array."""
    return np.asarray(x)


def flatten_nested_iterables(it, unpack_arrays: bool = False):
    """Flatten arbitrarily nested lists/tuples (optionally numpy arrays)."""
    out = []

    def _walk(o):
        if isinstance(o, (list, tuple)):
            for v in o:
                _walk(v)
        elif unpack_arrays and isinstance(o, np.ndarray):
            for v in o.reshape(-1):
                out.append(v)
        else:
            out.append(o)

    _walk(it)
    return out


def get_regression_pearson(predictions_file):
    """Pearson correlation (r, p-value) from a predictions txt file.

    File rows are `<truth> | <pred> <rec> <lig>` (see
    training/engine.py:write predictions). Ref parity: point_vs/utils.py
    get_regression_pearson.
    """
    from scipy.stats import pearsonr
    truths, preds = [], []
    with open(expand_path(predictions_file), 'r', encoding='utf-8') as f:
        for line in f:
            chunks = line.strip().split()
            if len(chunks) < 3 or chunks[1] != '|':
                continue
            truths.append(float(chunks[0]))
            preds.append(float(chunks[2]))
    if len(truths) < 2:
        return 0.0, 1.0
    r, p = pearsonr(truths, preds)
    return float(r), float(p)


def format_time(t) -> str:
    """Seconds -> `HH:MM:SS` display string."""
    if t is None or (isinstance(t, float) and (math.isnan(t) or t < 0)):
        return '--:--:--'
    t = int(t)
    return f'{t // 3600:02d}:{(t % 3600) // 60:02d}:{t % 60:02d}'


class Timer:
    """Context-manager wall clock timer, prints on exit if given a name."""

    def __init__(self, name: str | None = None):
        self.name = name
        self.start = None
        self.interval = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.interval = time.perf_counter() - self.start
        if self.name:
            print(f'{self.name}: {format_time(self.interval)}')
        return False


class PositionDict(dict):
    """Dict keyed on 3D coordinates with epsilon-tolerant lookup.

    Coordinates are truncated to a grid of size ``eps`` so nearby lookups
    resolve to the same key. Ref parity: point_vs/utils.py PositionDict /
    PositionSet (used by attribution to map scores back onto PDB atoms).
    """

    def __init__(self, *args, eps: float = 1e-3, **kwargs):
        self.eps = eps
        super().__init__(*args, **kwargs)

    def _key(self, coords) -> str:
        if isinstance(coords, str):
            coords = [float(c) for c in coords.split()]
        return coords_to_string(coords, eps=self.eps)

    def __setitem__(self, key, value):
        super().__setitem__(self._key(key), value)

    def __getitem__(self, key):
        return super().__getitem__(self._key(key))

    def __contains__(self, key):
        return super().__contains__(self._key(key))

    def get(self, key, default=None):
        return super().get(self._key(key), default)


class PositionSet(set):
    """Set of 3D coordinates with epsilon-tolerant membership tests."""

    def __init__(self, iterable=(), eps: float = 1e-3):
        self.eps = eps
        super().__init__(coords_to_string(c, eps=eps) for c in iterable)

    def add(self, coords):
        super().add(coords_to_string(coords, eps=self.eps))

    def __contains__(self, coords):
        return super().__contains__(coords_to_string(coords, eps=self.eps))


def coords_to_string(coords, eps: float = 1e-3) -> str:
    """Truncate coordinates onto an eps grid and render as a string key."""
    if isinstance(coords, str):
        coords = [float(c) for c in coords.split()]
    decimals = max(0, int(round(-math.log10(eps))))
    return ' '.join(f'{truncate_float(float(c), decimals):.{decimals}f}'
                    for c in np.asarray(coords).reshape(-1))


def truncate_float(x: float, decimals: int = 3) -> float:
    """Truncate (not round) a float to a number of decimal places."""
    factor = 10 ** decimals
    return math.trunc(x * factor) / factor


def ensure_writable_ndarray(x) -> np.ndarray:
    arr = np.asarray(x)
    if not arr.flags.writeable:
        arr = arr.copy()
    return arr


def py_mollify(sdf_or_mol2, overwrite: bool = False):
    """Round-trip a broken structure file through PyMOL to fix valence/
    format issues (ref point_vs/utils.py py_mollify). PyMOL-gated: raises
    ImportError with guidance when PyMOL is unavailable.
    """
    try:
        import pymol  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            'py_mollify requires PyMOL, which is not installed in this '
            'environment; fix the input structure with an external tool '
            'or install pymol-open-source.') from exc
    from pathlib import Path as _Path
    infile = expand_path(sdf_or_mol2)
    outfile = infile if overwrite else _Path(
        infile.parent, 'pymol', infile.name)
    outfile.parent.mkdir(parents=True, exist_ok=True)
    pymol.finish_launching(['pymol', '-qc'])
    pymol.cmd.load(str(infile), 'mol')
    pymol.cmd.save(str(outfile), 'mol')
    pymol.cmd.delete('all')
    return outfile


def no_return_parallelise(func, *args, cpus: int | None = None):
    """Fan a function out over argument lists (multiprocessing when available).

    Each element of ``args`` is either an iterable of per-call values or a
    constant broadcast to all calls. Ref parity: point_vs/utils.py
    no_return_parallelise (mp.Pool based); here we fall back to serial
    execution when only one CPU is available.
    """
    import multiprocessing as mp

    lengths = [len(a) for a in args if isinstance(a, (list, tuple))]
    n = max(lengths) if lengths else 1
    call_args = []
    for i in range(n):
        call_args.append(tuple(
            a[i] if isinstance(a, (list, tuple)) else a for a in args))

    cpus = cpus if cpus is not None else max(1, (os.cpu_count() or 1) - 1)
    if cpus <= 1 or n <= 1:
        for ca in call_args:
            func(*ca)
        return
    with mp.Pool(processes=min(cpus, n)) as pool:
        pool.starmap(func, call_args)
