"""Python-2 artifact compatibility: the single pickle / torch.load entry point.

The published datasets and checkpoints were written by Python-2 programs
(cPickle at /root/reference/code/multi-mnist/miscc/utils.py:4, loaded at
code/coco/stackgan/miscc/datasets.py:81-92, code/multi-mnist/miscc/
datasets.py:29-43, code/coco/attngan/datasets.py:261-291; the .pth files
by py2 torch-0.4).  Python-3 ``pickle.load`` defaults to ``encoding=
"ASCII"`` for py2 ``str`` opcodes (BINSTRING/SHORT_BINSTRING), so the
first non-ASCII byte — guaranteed in a pickled py2 numpy array, whose raw
data buffer is a py2 ``str`` — raises ``UnicodeDecodeError``.

Strategy (the numpy-documented one):
  1. plain ``pickle.load`` — py3-written pickles (protocol >= 3 strings
     are native unicode; ``encoding`` is never consulted).
  2. ``encoding="utf-8"`` — py2 pickles whose strings are real text
     (filenames, caption vocab): decodes them correctly.
  3. ``encoding="latin1"`` — never fails; required for py2 numpy arrays
     (binary buffers round-trip byte-exact through latin1, and numpy's
     reconstructor expects exactly this).

All repo code must load pickles through :func:`load_pickle` and torch
checkpoints through :func:`torch_load` — never bare ``pickle.load`` /
``torch.load`` (tests/test_pycompat.py greps for violations).
"""

from __future__ import annotations

import pickle
from typing import Any


def load_pickle_diag(path: str) -> tuple:
    """Like :func:`load_pickle` but returns ``(obj, stage)`` where stage
    is ``"py3"`` / ``"utf-8"`` / ``"latin1"`` — which decode attempt
    succeeded (tools/check_dataset.py reports it so first contact with a
    published py2 file is a diagnosis, not a traceback).

    Catches ``ValueError`` (superclass of ``UnicodeDecodeError``) on the
    first two attempts: a py2 binary buffer that *happens* to decode as
    multi-byte utf-8 fails later, inside ``ndarray.__setstate__``'s
    latin-1 re-encode, with a buffer-size ``ValueError`` — it must still
    fall through to the latin1 attempt, which is byte-exact.
    """
    with open(path, "rb") as f:
        try:
            return pickle.load(f), "py3"
        except ValueError:
            pass
        f.seek(0)
        try:
            return pickle.load(f, encoding="utf-8"), "utf-8"
        except ValueError:
            pass
        f.seek(0)
        return pickle.load(f, encoding="latin1"), "latin1"


def load_pickle(path: str) -> Any:
    """Load a pickle file written by either Python 2 or Python 3."""
    return load_pickle_diag(path)[0]


def torch_load(path: str, map_location: str = "cpu") -> Any:
    """``torch.load`` with a py2-str fallback.

    Tensors in py2 torch-0.4 files deserialize fine by default, but any
    py2 ``str`` in the container (numpy scalars, path strings) raises
    ``UnicodeDecodeError`` without ``encoding="latin1"``.
    """
    import torch

    try:
        return torch.load(path, map_location=map_location,
                          weights_only=False)
    except UnicodeDecodeError:
        return torch.load(path, map_location=map_location,
                          weights_only=False, encoding="latin1")
