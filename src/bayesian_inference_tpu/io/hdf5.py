"""Nested dict-of-ndarray <-> HDF5 round trip.

Layout-compatible with the silx ``dicttoh5``/``h5todict`` files the reference
writes (nested groups, leaf datasets; see reference data_IO.py:217-257), but
implemented directly on h5py so we carry no silx dependency.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Mapping

import h5py
import numpy as np

logger = logging.getLogger(__name__)


def _store_group(group: h5py.Group, data: Mapping[str, Any]) -> None:
    for key, value in data.items():
        key = str(key)
        if value is None:
            # The reference stores e.g. autocorrelation_time=None when emcee
            # fails to estimate it; silx drops None leaves, and so do we.
            continue
        if isinstance(value, Mapping):
            sub = group.require_group(key)
            _store_group(sub, value)
        else:
            if key in group:
                del group[key]
            arr = np.asarray(value)
            if arr.dtype.kind in ("U", "O"):
                arr = arr.astype(h5py.string_dtype())
            group.create_dataset(key, data=arr)


def _load_group(group: h5py.Group) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for key, value in group.items():
        if isinstance(value, h5py.Group):
            out[key] = _load_group(value)
        else:
            data = value[()]
            if isinstance(data, bytes):
                data = data.decode()
            out[key] = data
    return out


def write_dict_to_h5(results: Mapping[str, Any], output_dir: str, filename: str, verbose: bool = True) -> None:
    """Write a nested dictionary of ndarrays to an HDF5 file.

    Existing leaves with the same path are replaced ("modify" semantics, as in
    the reference's silx update_mode="modify").
    """
    if verbose:
        logger.info(f"Writing results to {output_dir}/{filename}...")
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, filename)
    mode = "a" if os.path.exists(path) else "w"
    with h5py.File(path, mode) as f:
        _store_group(f, results)


def read_dict_from_h5(input_dir: str, filename: str, verbose: bool = True) -> dict[str, Any]:
    """Read a nested dictionary of ndarrays from an HDF5 file."""
    if verbose:
        logger.info(f"Loading results from {input_dir}/{filename}...")
    with h5py.File(os.path.join(input_dir, filename), "r") as f:
        return _load_group(f)
